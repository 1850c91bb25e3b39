"""Capture a jax.profiler device trace of the qualified bench step.

VERDICT r3 weak #2: the ~20%-of-peak trunk MFU had no profile-level
accounting. This script runs the exact bench.py computation (GRNet
qualified mixed mode, batch 128) on the real chip under
jax.profiler.trace, then the companion scripts/mfu_report.py parses the
xplane into a top-fusion time table (docs/MFU_TRACE.json).

Usage: python scripts/mfu_trace.py [outdir]  (default /tmp/gaitlab_trace)
"""

from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gaitlab_trace"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore, vp_regress

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    # the qualified production default (= GRNetRunner's resolved module)
    module = GRNetCore(head_precision="default",
                       backbone_region_precision=(("heads", "w2x"),))
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, 224, 224, 3), jnp.float32)
    variables = module.init(rng, images[:1])
    smpl = body_smpl.synthetic_smpl_params()

    @jax.jit
    def fwd(variables, smpl, images, bias):
        with jax.default_matmul_precision("high"):
            patt = module.apply(variables, images + bias)
            out = vp_regress(smpl, patt, batch_size=1, joint_mode="spin2")[0]
        return out["kp_3d"], out["theta"], out["kp_2d"]

    variables, smpl, images = jax.device_put((variables, smpl, images), dev)

    def chain(n):
        bias = jnp.zeros(())
        for _ in range(n):
            _, theta, _ = fwd(variables, smpl, images, bias)
            bias = theta[0, 0, 0] * 1e-9
        float(bias)

    t0 = time.time()
    chain(1)  # compile
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    chain(2)  # warm

    t0 = time.time()
    with jax.profiler.trace(outdir):
        chain(8)
    print(f"traced 8 iters in {time.time() - t0:.1f}s -> {outdir}", flush=True)


if __name__ == "__main__":
    main()
