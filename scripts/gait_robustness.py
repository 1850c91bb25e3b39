"""Gait-corrector qualification under clinical-pipeline corruption.

VERDICT r3 weak #5: the corrector was validated only on clean synthetic
walking sequences. The clinical pipeline feeds it worse: occlusions make
SORT hold stale crops (frozen features), bbox jitter perturbs the whole
crop framing (correlated per-frame feature noise), and fragmented tracks
arrive truncated. This study trains the FeatCorrector exactly like
tests/test_gait_training.py, then sweeps those three corruption models on
held-out sequences and reports phase/speed error for the trained
corrector vs the untrained baseline at each level.

Corruption models (applied to held-out batches):
  * dropout(p): each frame is, with probability p, replaced by the last
    clean frame's features (a tracker coasting through an occlusion
    repeats its last crop; runs of repeats happen naturally by chaining).
  * jitter(s): per-frame global gain/offset noise, features *
    (1 + s*n_t) + s*m_t with n_t, m_t ~ N(0,1) shared across joints and
    channels of frame t — the signature of bbox jitter (the whole crop
    shifts/rescales, so all features of that frame move together).
  * truncate(T): sequence cut to its first T frames (SORT fragmentation),
    evaluated via the module's native seq_lengths masking.

CPU-runnable (no TPU needed). Writes docs/GAIT_ROBUSTNESS.json; the
operating envelope is cited from gaitlab/nn/gait.py's docstring and
pinned by tests/test_gait_training.py::test_robustness_artifact.
"""

from __future__ import annotations

import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

T, J, C = 32, 6, 8
TRAIN_STEPS = 600


def corrupt_dropout(feats: np.ndarray, p: float, rng) -> np.ndarray:
    """Occlusion model: frame t keeps frame t-1's features with prob p."""
    out = feats.copy()
    b, t = feats.shape[:2]
    drop = rng.random((b, t)) < p
    drop[:, 0] = False
    for i in range(1, t):
        out[drop[:, i], i] = out[drop[:, i], i - 1]
    return out


def corrupt_jitter(feats: np.ndarray, s: float, rng) -> np.ndarray:
    """Bbox-jitter model: per-frame global gain/offset (crop reframing
    moves every feature of the frame together)."""
    b, t = feats.shape[:2]
    gain = 1.0 + s * rng.standard_normal((b, t, 1, 1))
    off = s * rng.standard_normal((b, t, 1, 1))
    return feats * gain + off


def main():
    import jax
    import optax

    jax.config.update("jax_platforms", "cpu")

    from gaitlab import training
    from gaitlab.nn.gait import FeatCorrector

    module = FeatCorrector(num_joints=J, feat_dim=C, h_size=32, num_heads=2,
                           stop_gaitfeat_grad=False)
    batch0 = training.synthetic_gait_batch(4, t=T, j=J, c=C, seed=0)
    params0 = module.init(jax.random.PRNGKey(0), batch0["features"],
                          batch0["cparams"])
    optimizer = optax.adam(3e-3)
    state = training.create_train_state(params0, optimizer)
    step = jax.jit(training.make_gait_train_step(module, optimizer,
                                                 w_feat=3.0))
    print("training corrector (clean synthetic regime, "
          f"{TRAIN_STEPS} steps)...", file=sys.stderr, flush=True)
    for i in range(TRAIN_STEPS):
        state, _ = step(state, training.synthetic_gait_batch(
            8, t=T, j=J, c=C, seed=i))

    def metrics(params, feats, cparams, batch, seq_lengths=None):
        kw = {}
        if seq_lengths is not None:
            kw["seq_lengths"] = seq_lengths
        _, pred_avg, pred_phase = module.apply(
            params, feats, cparams, **kw)
        pp = np.asarray(pred_phase)
        gp = np.asarray(batch["gait_phase"])
        if seq_lengths is not None:
            tt = int(seq_lengths.max())
            pp, gp = pp[:, :tt], gp[:, :tt]
        nrm = lambda v: v / (np.linalg.norm(v, axis=-1, keepdims=True)
                             + 1e-9)
        cos = 0.5 * ((nrm(pp[..., :2]) * nrm(gp[..., :2])).sum(-1)
                     + (nrm(pp[..., 2:]) * nrm(gp[..., 2:])).sum(-1))
        phase_err = float(1.0 - cos.mean())   # 0 = perfect
        speed_mae = float(np.abs(
            np.asarray(pred_avg)[:, 0]
            - np.asarray(batch["gait_avg"])[:, 0]).mean())
        return phase_err, speed_mae

    rows = []

    def evaluate(kind, level, feats, batch, seq_lengths=None):
        cp = np.asarray(batch["cparams"])
        if seq_lengths is not None:
            import jax.numpy as jnp

            seq_lengths = jnp.asarray(seq_lengths)
        pe_t, sp_t = metrics(state.params, feats, cp, batch, seq_lengths)
        pe_0, sp_0 = metrics(params0, feats, cp, batch, seq_lengths)
        rows.append({
            "corruption": kind, "level": level,
            "phase_err_trained": round(pe_t, 4),
            "phase_err_untrained": round(pe_0, 4),
            "speed_mae_trained": round(sp_t, 4),
            "speed_mae_untrained": round(sp_0, 4),
            "trained_beats_untrained": bool(pe_t < pe_0 and sp_t < sp_0),
        })
        print(f"[{kind}={level}] phase {pe_t:.4f} (untrained {pe_0:.4f}) "
              f"speed {sp_t:.4f} (untrained {sp_0:.4f})",
              file=sys.stderr, flush=True)

    # held-out batches, fresh corruption RNG per cell
    for p in (0.0, 0.1, 0.2, 0.4):
        batch = training.synthetic_gait_batch(16, t=T, j=J, c=C, seed=1000)
        rng = np.random.default_rng(7)
        feats = corrupt_dropout(np.asarray(batch["features"]), p, rng)
        evaluate("dropout", p, feats, batch)
    for s in (0.1, 0.2, 0.4):
        batch = training.synthetic_gait_batch(16, t=T, j=J, c=C, seed=1001)
        rng = np.random.default_rng(8)
        feats = corrupt_jitter(np.asarray(batch["features"]), s, rng)
        evaluate("bbox_jitter", s, feats, batch)
    for tt in (24, 16, 12):
        batch = training.synthetic_gait_batch(16, t=T, j=J, c=C, seed=1002)
        feats = np.asarray(batch["features"]).copy()
        feats[:, tt:] = 0.0  # masked region content must not matter
        evaluate("truncate", tt, feats, batch,
                 seq_lengths=np.full((16,), tt, np.int32))

    # ---- distribution-shift (transfer) study: VERDICT r4 weak #6 ----
    # The corruption sweep above trains and evaluates inside ONE synthetic
    # regime. Here a FRESH corrector is trained on a narrow regime A and
    # evaluated on a disjoint regime B (non-overlapping gait-frequency
    # band, larger camera sway, higher feature noise, disjoint seed
    # family) — generalization, not memorization of the training band.
    regime_a = dict(freq_range=(0.05, 0.14), cam_sway=0.08, noise=0.5)
    regime_b = dict(freq_range=(0.16, 0.28), cam_sway=0.2, noise=0.8)
    regime_b_freq_only = dict(freq_range=(0.16, 0.28), cam_sway=0.08,
                              noise=0.5)

    print("training transfer corrector (regime A only)...",
          file=sys.stderr, flush=True)
    state_a = training.create_train_state(params0, optimizer)
    for i in range(TRAIN_STEPS):
        state_a, _ = step(state_a, training.synthetic_gait_batch(
            8, t=T, j=J, c=C, seed=i, **regime_a))

    transfer_rows = []

    def evaluate_transfer(cell, regime, seed):
        batch = training.synthetic_gait_batch(16, t=T, j=J, c=C, seed=seed,
                                              **regime)
        feats = np.asarray(batch["features"])
        cp = np.asarray(batch["cparams"])
        pe_t, sp_t = metrics(state_a.params, feats, cp, batch)
        pe_0, sp_0 = metrics(params0, feats, cp, batch)
        transfer_rows.append({
            "cell": cell, "regime": {k: v for k, v in regime.items()},
            "phase_err_trained": round(pe_t, 4),
            "phase_err_untrained": round(pe_0, 4),
            "speed_mae_trained": round(sp_t, 4),
            "speed_mae_untrained": round(sp_0, 4),
            "trained_beats_untrained": bool(pe_t < pe_0 and sp_t < sp_0),
        })
        print(f"[transfer:{cell}] phase {pe_t:.4f} (untrained {pe_0:.4f}) "
              f"speed {sp_t:.4f} (untrained {sp_0:.4f})",
              file=sys.stderr, flush=True)

    evaluate_transfer("in_regime_holdout", regime_a, seed=4000)
    evaluate_transfer("shifted_freq_band", regime_b_freq_only, seed=5000)
    evaluate_transfer("shifted_freq_cam_noise", regime_b, seed=6000)

    out = {
        "what": ("FeatCorrector phase/speed error under clinical-pipeline "
                 "corruption models, trained (600 steps, clean synthetic "
                 "regime) vs untrained init — scripts/gait_robustness.py"),
        "setup": {"t": T, "j": J, "c": C, "train_steps": TRAIN_STEPS,
                  "base_feature_noise": 0.5},
        "phase_err_metric": "1 - mean cosine to the true phase circle "
                            "(0 = perfect, 1 = uncorrelated)",
        "results": rows,
        "transfer": {
            "what": ("distribution-shift study (VERDICT r4 weak #6): a "
                     "FRESH corrector trained ONLY on regime A, evaluated "
                     "on disjoint regimes (non-overlapping gait-frequency "
                     "band, 2.5x camera sway, 1.6x feature noise, "
                     "disjoint seed families)"),
            "train_regime": regime_a,
            "results": transfer_rows,
        },
    }
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "docs", "GAIT_ROBUSTNESS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
