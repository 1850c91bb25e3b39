"""Generate bench.py's accuracy-tripwire golden on the CPU backend.

bench.py (VERDICT r4 #7) compares the qualified-mode TPU forward against
a committed float32-parity golden every run, so a numeric regression in
the production precision mode turns the driver's BENCH artifact red
instead of silently shipping behind an unchanged mode string.

The golden is f32 MATH of a fully deterministic computation — weights
from PRNGKey(0) flax init, images from PRNGKey(0) normals, BatchNorm
stats calibrated under matmul precision "highest" (f32) with the
extrapolation done in host numpy — so it can be generated on ANY
backend; this script forces CPU so the fixture never depends on the
flaky TPU tunnel. Cross-backend f32 divergence is at ulp level and is
absorbed by bench.py's 1.5 mm tolerance (the qualified TPU mode itself
measures ~0.37 mm vs f32; single-pass-bf16 regressions measure >10 mm).

Writes tests/golden/bench_golden.npz. Regenerate whenever the bench's
deterministic setup (seeds, batch layout, calibration recipe) changes;
tests/test_precision_modes.py::test_bench_golden_fresh guards staleness.
"""

from __future__ import annotations

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

N_ACC = 8  # frames compared by the tripwire (bench.py N_ACC)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def golden_kp3d(backend: str = "cpu") -> dict:
    """The deterministic f32-parity {kp_3d, theta} for bench.py's first
    N_ACC frames (shared recipe: bench.py builds the same module/
    weights)."""
    import jax

    if backend:
        jax.config.update("jax_platforms", backend)
    import jax.numpy as jnp

    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNetCore, vp_regress
    from gaitlab.training import calibrate_all_bn

    # identical setup to bench.py: qualified-module param tree (clone
    # only changes precision wiring, never param structure/values)
    module = GRNetCore(head_precision="default",
                       backbone_region_precision=(("heads", "w2x"),),
                       backbone_resize_precision="high")
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (128, 224, 224, 3), jnp.float32)
    variables = module.init(rng, images[:1])

    t0 = time.perf_counter()
    with jax.default_matmul_precision("highest"):
        variables = calibrate_all_bn(module, variables, images[:32])
    log(f"BN calibration: {time.perf_counter() - t0:.1f}s")

    parity = module.clone(head_precision=None,
                          backbone_region_precision=(),
                          backbone_resize_precision="highest")
    smpl = body_smpl.synthetic_smpl_params()

    @jax.jit
    def fwd_parity(variables, smpl, images):
        with jax.default_matmul_precision("float32"):
            patt = parity.apply(variables, images)
            out = vp_regress(smpl, patt, batch_size=1,
                             joint_mode="spin2")[0]
        return out["kp_3d"], out["theta"]

    t0 = time.perf_counter()
    kp, th = fwd_parity(variables, smpl, images[:N_ACC])
    gold = {"kp_3d": np.asarray(kp[0], np.float32),
            "theta": np.asarray(th[0], np.float32)}
    log(f"f32 parity forward: {time.perf_counter() - t0:.1f}s")
    return gold


def main():
    gold = golden_kp3d()
    # Degeneracy guards: the probe function must vary with the input
    # well above the regression tolerances (CLAUDE.md BN-calibration
    # note). kp_3d rides the synthetic SMPL (a random blob whose joints
    # cluster near the centroid, so its mm spread is structurally small
    # — measured ~7 mm vs the torch oracle's 29.6 on a body-shaped
    # skeleton); theta is the model's DIRECT output and carries the
    # sensitive signal.
    kp, th = gold["kp_3d"], gold["theta"]
    spread_mm = float(np.linalg.norm(kp - kp.mean(0), axis=-1).mean()
                      * 1000.0)
    spread_th = float(np.abs(th - th.mean(0)).mean())
    log(f"golden spreads across {N_ACC} frames: kp_3d {spread_mm:.2f} mm, "
        f"theta {spread_th:.4f}")
    assert spread_mm > 3.0 and spread_th > 0.03, (
        spread_mm, spread_th, "degenerate golden — calibration broke")
    out = osp.join(osp.dirname(osp.abspath(__file__)), "..", "tests",
                   "golden", "bench_golden.npz")
    np.savez(out, kp_3d=kp, theta=th,
             device="cpu f32 (backend-neutral math)")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
