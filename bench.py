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

Accuracy tripwire (VERDICT r4 #7): throughput honesty alone would let a
numeric regression in the qualified mode ship silently (the mode string
is just a string). Every bench run therefore also compares the qualified
forward's kp_3d on a fixed batch against a committed float32-parity
golden (tests/golden/bench_golden.npz — f32 math of a deterministic
computation, generated backend-neutrally by
scripts/make_bench_golden.py; GAITLAB_BENCH_WRITE_GOLDEN=1 regenerates
it on-device instead) and reports accuracy_ok in the JSON line.
BatchNorm running stats are calibrated on-device first — fresh-init
(0,1) stats collapse a random-weight conv stack into an input-
independent function, which would make the comparison vacuous
(training.calibrate_all_bn — backbone AND PARE head; same treatment as
the precision study's torch oracle). A joint-spread guard asserts input
sensitivity.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/300,
   "accuracy_mpjpe_mm": N, "accuracy_ok": true}
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

    # BN calibration (deterministic: fixed weights + fixed images) so the
    # accuracy tripwire below compares an input-SENSITIVE function
    from gaitlab.training import calibrate_all_bn

    # "highest" pins the calibration forward to f32 math, so the batch
    # stats (and therefore the probe comparison) are identical whether
    # the golden was generated here or by the CPU generator
    # (scripts/make_bench_golden.py) — default bf16 matmuls would bake
    # backend-dependent rounding into the stats themselves
    t0 = time.perf_counter()
    with jax.default_matmul_precision("highest"):
        variables = calibrate_all_bn(module, variables, images[:32])
    log(f"BN calibration: {time.perf_counter() - t0:.1f}s")

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

    # ---- accuracy tripwire -------------------------------------------------
    # Two metrics: kp_3d in mm (interpretable, but structurally small in
    # this regime — the synthetic SMPL is a random blob whose joints
    # cluster near the centroid) and theta (cam+pose+shape — the model's
    # DIRECT output, where the precision-sensitive signal lives).
    GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "golden", "bench_golden.npz")
    N_ACC = 8
    out0 = fwd(variables, smpl, images, jnp.zeros(()))
    kp3d = np.asarray(out0[0][0][:N_ACC], np.float32)
    theta = np.asarray(out0[1][0][:N_ACC], np.float32)
    spread_mm = float(np.linalg.norm(
        kp3d - kp3d.mean(0), axis=-1).mean() * 1000.0)
    spread_th = float(np.abs(theta - theta.mean(0)).mean())
    log(f"accuracy probe spreads across {N_ACC} frames: "
        f"kp_3d {spread_mm:.2f} mm, theta {spread_th:.4f}")
    assert spread_mm > 3.0 and spread_th > 0.03, (
        f"degenerate probe (spreads {spread_mm:.2f} mm / {spread_th:.4f})"
        f" — BN calibration broke; the accuracy comparison is vacuous")
    if os.environ.get("GAITLAB_BENCH_WRITE_GOLDEN"):
        # float32-parity forward of the SAME calibrated weights/batch
        parity = module.clone(head_precision=None,
                              backbone_region_precision=(),
                              backbone_resize_precision="highest")

        @jax.jit
        def fwd_parity(variables, smpl, images):
            with jax.default_matmul_precision("float32"):
                patt = parity.apply(variables, images)
                out = vp_regress(smpl, patt, batch_size=1,
                                 joint_mode="spin2")[0]
            return out["kp_3d"], out["theta"]

        gkp, gth = fwd_parity(variables, smpl, images[:N_ACC])
        np.savez(GOLDEN, kp_3d=np.asarray(gkp[0], np.float32),
                 theta=np.asarray(gth[0], np.float32),
                 device=str(dev.device_kind))
        log(f"wrote golden {GOLDEN}")
    gold = np.load(GOLDEN)
    acc_mm = float(np.linalg.norm(
        kp3d - gold["kp_3d"], axis=-1).mean() * 1000.0)
    acc_th = float(np.abs(theta - gold["theta"]).mean())
    # budgets: the qualified mode measures ~0.37 mm MPJPE vs f32 on the
    # study oracle (~2e-4 relative); regression regimes (single-pass
    # bf16 trunk) measure >10 mm (~1e-2 relative). The theta tolerance
    # (0.02 mean abs) sits between those with >10x margin each way; the
    # kp_3d tolerance is scaled to this regime's smaller skeleton.
    ACC_TOL_MM, ACC_TOL_TH = 1.5, 0.02
    accuracy_ok = bool(acc_mm <= ACC_TOL_MM and acc_th <= ACC_TOL_TH)
    log(f"accuracy vs f32 golden ({gold['device']}): kp_3d {acc_mm:.4f} "
        f"mm (tol {ACC_TOL_MM}), theta {acc_th:.5f} (tol {ACC_TOL_TH}) "
        f"-> {'OK' if accuracy_ok else 'REGRESSION'}")

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
        "accuracy_mpjpe_mm": round(acc_mm, 4),
        "accuracy_theta_mad": round(acc_th, 5),
        "accuracy_ok": accuracy_ok,
    }))


if __name__ == "__main__":
    main()
