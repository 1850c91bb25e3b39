"""Measure the space-to-depth packed backbone vs standard on the real TPU.

VERDICT r1 next-step #5: the HRNet backbone runs at ~20% of bf16 peak
because its highest-resolution branch has 32 channels (a quarter of the
MXU's 128 result lanes). `pack_low_channel` evaluates those branches on
the s2d-packed grid — mathematically identical (tests/test_packed_conv.py)
— and this script reports the model-loop speedup at each precision mode.

Usage: python scripts/pack_bench.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore, vp_regress

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}  batch={BATCH}")

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (BATCH, 224, 224, 3), jnp.float32)
    smpl = body_smpl.synthetic_smpl_params()

    base = GRNetCore()
    variables = base.init(rng, images[:1])
    variables, smpl, images = jax.device_put((variables, smpl, images), dev)

    rows = []
    for pack in (0, 32, 64):
        module = GRNetCore(pack_low_channel=pack)
        for prec in ("default", "high"):
            def fwd(variables, smpl, images, bias,
                    module=module, prec=prec):
                with jax.default_matmul_precision(prec):
                    patt = module.apply(variables, images + bias)
                    out = vp_regress(smpl, patt, batch_size=1,
                                     joint_mode="spin2")[0]
                return out["kp_3d"], out["theta"]

            jf = jax.jit(fwd)

            def chain(n):
                bias = jnp.zeros(())
                t0 = time.perf_counter()
                for _ in range(n):
                    kp3d, theta = jf(variables, smpl, images, bias)
                    bias = theta[0, 0, 0] * 1e-9
                float(bias)
                return time.perf_counter() - t0

            t0 = time.perf_counter()
            chain(1)
            log(f"pack={pack} prec={prec}: compile "
                f"{time.perf_counter() - t0:.1f}s")
            chain(2)
            dt = chain(ITERS) / ITERS
            fps = BATCH / dt
            log(f"pack={pack} prec={prec}: {dt * 1e3:.1f} ms/iter "
                f"{fps:.0f} fps")
            rows.append((pack, prec, dt * 1e3, fps))

    print("| pack_low_channel | precision | ms/iter | fps/chip |")
    print("|---|---|---|---|")
    for pack, prec, ms, fps in rows:
        print(f"| {pack} | {prec} | {ms:.1f} | {fps:.0f} |")


if __name__ == "__main__":
    main()
