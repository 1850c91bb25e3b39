"""Benchmark: GRNet model-loop throughput (frames/sec/chip) on real hardware.

Mirrors the reference's headline number — the "VIBE FPS" model-loop
throughput printed by /root/reference/demo.py:235-252 (cropped 224x224
frames through backbone + head + SMPL + projection per second). The
reference records no value in-repo; the driver BASELINE target is
>= 300 fps/chip (BASELINE.md), used as the denominator here.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/300}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 300.0
BATCH = 128
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore, vp_regress

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    module = GRNetCore()
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (BATCH, 224, 224, 3), jnp.float32)
    variables = module.init(rng, images[:1])
    smpl = body_smpl.synthetic_smpl_params()

    @jax.jit
    def fwd(variables, smpl, images):
        patt = module.apply(variables, images)
        out = vp_regress(smpl, patt, batch_size=1, joint_mode="spin2")[0]
        return out["kp_3d"], out["theta"], out["kp_2d"]

    variables, smpl, images = jax.device_put((variables, smpl, images), dev)

    t0 = time.perf_counter()
    jax.block_until_ready(fwd(variables, smpl, images))
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s")
    jax.block_until_ready(fwd(variables, smpl, images))  # warm

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(variables, smpl, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "grnet_model_loop_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
