"""Benchmark: GRNet model-loop throughput (frames/sec/chip) on real hardware.

Mirrors the reference's headline number — the "VIBE FPS" model-loop
throughput printed by /root/reference/demo.py:235-252 (cropped 224x224
frames through backbone + head + SMPL + projection per second). The
reference records no value in-repo; the driver BASELINE target is
>= 300 fps/chip (BASELINE.md), used as the denominator here.

The benched configuration is the ACCURACY-QUALIFIED production mode
(GRNetRunner default): f32 params, backbone at matmul precision "high"
(bf16_3x on TPU) with the PARE head at single-pass bf16
(GRNetCore.head_precision="default") and the HR upsample-head convs at
the 2-pass w2x kernel decomposition (round 4, docs/PRECISION.json
W:heads: 0.3656 mm MPJPE / 1.64 mm PVE vs the f32 PyTorch reference in
the worst-case random-weight regime, inside the 0.5 mm budget, ~9%
faster than round-3's all-high backbone). Faster unqualified modes exist
(bf16 trunk: ~3300 fps at ~18 mm worst-case) and are documented in
BASELINE.md, not benched as the headline.

Measurement note: through the axon TPU tunnel, `block_until_ready` returns
before device execution completes, so naive timing reports dispatch rate,
not compute rate. This bench forces serialization with a device-side data
dependency chain (iteration i+1 consumes a scalar from iteration i's
output) and one final host fetch — wall-clock then covers real device
execution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/300}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

BASELINE_FPS = 300.0
# throughput sweet spot on one v5e chip (BASELINE.md sweep); the env
# override serves scripts/sweeps, the committed headline is the default
BATCH = int(os.environ.get("GAITLAB_BENCH_BATCH", "128"))
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore, vp_regress

    # Persistent compile cache: the cold XLA:TPU compile of the full
    # qualified mode runs 150-470s on this container (tunnel-dependent);
    # cached repeat runs skip it, which keeps the driver's bench well
    # inside its clock. Same cache dir + opt-out env var as everywhere
    # else (gaitlab.utils.enable_compile_cache).
    from gaitlab.utils import enable_compile_cache

    if not enable_compile_cache():
        log("compile cache disabled/unavailable: cold compiles only")

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # the qualified mixed mode (= GRNetRunner's resolved production default)
    module = GRNetCore(head_precision="default",
                       backbone_region_precision=(("heads", "w2x"),),
                       backbone_resize_precision="high")
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (BATCH, 224, 224, 3), jnp.float32)
    variables = module.init(rng, images[:1])
    smpl = body_smpl.synthetic_smpl_params()

    @jax.jit
    def fwd(variables, smpl, images, bias):
        with jax.default_matmul_precision("high"):
            patt = module.apply(variables, images + bias)
            out = vp_regress(smpl, patt, batch_size=1,
                             joint_mode="spin2")[0]
        return out["kp_3d"], out["theta"], out["kp_2d"]

    variables, smpl, images = jax.device_put((variables, smpl, images), dev)

    def chain(n):
        bias = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(n):
            kp3d, theta, kp2d = fwd(variables, smpl, images, bias)
            bias = theta[0, 0, 0] * 1e-9  # device-side dependency
        float(bias)  # single host sync at the end
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    chain(1)
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s")
    chain(2)  # warm

    dt = chain(ITERS)
    fps = BATCH * ITERS / dt
    log(f"{ITERS} chained iters: {dt:.3f}s ({dt / ITERS * 1e3:.1f} ms/iter)")
    print(json.dumps({
        "metric": "grnet_model_loop_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "precision_mode": "backbone high + HR-head w2x + resize high + "
                          "PARE head bf16 (accuracy-qualified: 0.37mm "
                          "MPJPE worst-case, docs/PRECISION.json "
                          "heads_w2x+resize_high)",
    }))


if __name__ == "__main__":
    main()
