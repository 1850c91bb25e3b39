"""Per-stage backbone timing on the real TPU (VERDICT r1 next-step #5
groundwork): where does the "high"-precision model loop actually spend
its 101 ms/128 frames? Times truncated backbones (stop_after knob) plus
the head and SMPL, with the device-dependency-chain discipline.

Usage: python scripts/stage_timing.py  (prints a stage table)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

BATCH = 128
ITERS = 6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(fn, *args):
    def chain(n):
        bias = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, bias)
            bias = out.reshape(-1)[0] * 1e-9
        float(bias)
        return time.perf_counter() - t0

    chain(1)
    chain(2)
    return chain(ITERS) / ITERS


def main():
    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore, vp_regress
    from gaitlab.nn.hrnet import HRNetCfg, PoseHighResolutionNet

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (BATCH, 224, 224, 3), jnp.float32)
    cfg = HRNetCfg.w(32, downsample=False, use_conv=True)

    rows = []
    prev = 0.0
    for stop in ("stem", "layer1", "stage2", "stage3", "stage4", ""):
        module = PoseHighResolutionNet(cfg, stop_after=stop)
        variables = module.init(rng, images[:1])

        @jax.jit
        def fwd(v, im, bias):
            with jax.default_matmul_precision("high"):
                return module.apply(v, im + bias)

        dt = chain_time(fwd, variables, images)
        name = stop or "backbone(full)"
        rows.append((name, dt * 1e3, (dt - prev) * 1e3))
        log(f"{name:16s} cumulative {dt * 1e3:7.1f} ms   "
            f"delta {(dt - prev) * 1e3:7.1f} ms")
        prev = dt

    # head + SMPL on a fixed feature map
    module = GRNetCore()
    variables = module.init(rng, images[:1])
    feats = jax.random.normal(rng, (BATCH, 56, 56, 480), jnp.float32)

    @jax.jit
    def head_fwd(v, f, bias):
        with jax.default_matmul_precision("high"):
            patt = module.apply(v, f + bias,
                                method=lambda m, x: m.head(x))
            return patt["pred_pose"]

    dt_head = chain_time(head_fwd, variables, feats)
    log(f"{'pare_head':16s} {dt_head * 1e3:7.1f} ms")

    smpl = body_smpl.synthetic_smpl_params()
    rot = jnp.tile(jnp.eye(3), (BATCH, 24, 1, 1))
    shape = jnp.zeros((BATCH, 10))
    cam = jnp.ones((BATCH, 3))

    @jax.jit
    def smpl_fwd(s, r, sh, c, bias):
        with jax.default_matmul_precision("high"):
            out = vp_regress(
                s, {"pred_pose": r + bias, "pred_shape": sh, "pred_cam": c},
                batch_size=1)[0]
            return out["kp_3d"]

    dt_smpl = chain_time(smpl_fwd, smpl, rot, shape, cam)
    log(f"{'smpl+regress':16s} {dt_smpl * 1e3:7.1f} ms")

    print("| stage | cumulative ms | delta ms |")
    print("|---|---|---|")
    for name, cum, delta in rows:
        print(f"| {name} | {cum:.1f} | {delta:.1f} |")
    print(f"| pare_head | - | {dt_head * 1e3:.1f} |")
    print(f"| smpl+regress | - | {dt_smpl * 1e3:.1f} |")


if __name__ == "__main__":
    main()
