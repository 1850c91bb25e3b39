"""Gait branch is trainable end-to-end, not just forward-shaped
(VERDICT r1 next-step #10): train the FeatCorrector on synthetic
gait-labeled sequences and assert the gait estimates and the feature
correction actually improve."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def trained():
    import optax

    from gaitlab import training
    from gaitlab.nn.gait import FeatCorrector

    t, j, c = 32, 6, 8
    module = FeatCorrector(num_joints=j, feat_dim=c, h_size=32, num_heads=2,
                           stop_gaitfeat_grad=False)
    batch0 = training.synthetic_gait_batch(4, t=t, j=j, c=c, seed=0)
    params = module.init(jax.random.PRNGKey(0), batch0["features"],
                         batch0["cparams"])
    optimizer = optax.adam(3e-3)
    state = training.create_train_state(params, optimizer)
    step = jax.jit(training.make_gait_train_step(module, optimizer,
                                                 w_feat=3.0))

    first = None
    for i in range(600):
        batch = training.synthetic_gait_batch(8, t=t, j=j, c=c, seed=i)
        state, metrics = step(state, batch)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}
    return module, params, state, first, last, (t, j, c)


def test_gait_training_loss_decreases(trained):
    _, _, _, first, last, _ = trained
    assert np.isfinite(last["loss"])
    assert last["loss"] < 0.5 * first["loss"], (first, last)


def test_trained_phase_beats_untrained(trained):
    from gaitlab import training

    module, params0, state, _, _, (t, j, c) = trained
    batch = training.synthetic_gait_batch(8, t=t, j=j, c=c, seed=999)

    def phase_err(p):
        _, _, pred_phase = module.apply(p, batch["features"],
                                        batch["cparams"])
        nrm = lambda v: v / (np.linalg.norm(v, axis=-1, keepdims=True)
                             + 1e-9)
        pp, gp = np.asarray(pred_phase), np.asarray(batch["gait_phase"])
        cos1 = (nrm(pp[..., :2]) * nrm(gp[..., :2])).sum(-1)
        cos2 = (nrm(pp[..., 2:]) * nrm(gp[..., 2:])).sum(-1)
        return 1.0 - float(np.mean((cos1 + cos2) / 2))

    err_untrained = phase_err(params0)
    err_trained = phase_err(state.params)
    # untrained phase is uncorrelated (err ~1); trained must be far better
    assert err_trained < 0.5 * err_untrained, (err_untrained, err_trained)
    assert err_trained < 0.3, err_trained


def test_trained_speed_beats_untrained(trained):
    from gaitlab import training

    module, params0, state, _, _, (t, j, c) = trained
    batch = training.synthetic_gait_batch(8, t=t, j=j, c=c, seed=777)

    def avg_err(p):
        _, pred_avg, _ = module.apply(p, batch["features"],
                                      batch["cparams"])
        return float(np.mean((np.asarray(pred_avg)
                              - np.asarray(batch["gait_avg"])) ** 2))

    assert avg_err(state.params) < 0.5 * avg_err(params0)


def test_corrector_denoises_features(trained):
    """The trained TS-attention correction moves noisy pose features
    toward the clean signal — i.e. the correction itself carries value
    beyond the encoder heads."""
    from gaitlab import training

    module, _, state, _, _, (t, j, c) = trained
    batch = training.synthetic_gait_batch(8, t=t, j=j, c=c, seed=555)
    corrected, _, _ = module.apply(state.params, batch["features"],
                                   batch["cparams"])
    clean = np.asarray(batch["clean_features"])
    err_in = float(np.mean((np.asarray(batch["features"]) - clean) ** 2))
    err_out = float(np.mean((np.asarray(corrected) - clean) ** 2))
    # white noise cannot be fully removed from a short window; require a
    # clear, reproducible improvement (measured 0.26 -> 0.21 at 600 steps)
    assert err_out < 0.9 * err_in, (err_in, err_out)


@pytest.mark.slow
def test_gait_training_on_real_trunk_features():
    """The gait branch learns from the REAL trunk's pose features, not
    just sinusoid toys (VERDICT r2 next-step #7): synthetic walking clips
    with known speed/phase are rendered, the actual backbone + PARE
    feature extractor produces the pose-feature sequences (the exact path
    GRNetCore's gait branch consumes), and phase recovery on HELD-OUT
    clips must beat the untrained corrector."""
    import optax

    from gaitlab import training
    from gaitlab.nn.gait import FeatCorrector
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import crop as crop_mod

    t, img = 32, 64
    model = GRNet.create(init_img=img)

    # BN calibration: fresh-init running stats collapse the random-weight
    # conv stack into an input-independent map (CLAUDE.md)
    frames, bboxes, _ = training.synthetic_walker_clip(16, seed=99)
    crops = np.stack([crop_mod.generate_patch_image(
        frames[i], *bboxes[i], img, img, scale=1.0)[0] for i in range(16)])
    model.variables = training.calibrate_backbone_bn(
        model.module, model.variables, crop_mod.normalize_image(
            jnp.asarray(crops)))

    train_batches = [training.trunk_gait_batch(model, b=6, t=t, img=img,
                                               seed=s)
                     for s in (0, 100, 200, 300)]
    held_out = training.trunk_gait_batch(model, b=4, t=t, img=img,
                                         seed=1000)
    train_batch = train_batches[0]
    feats = np.asarray(train_batch["clean_features"])
    spread = np.linalg.norm(
        feats - feats.mean(axis=1, keepdims=True), axis=-1).mean()
    assert spread > 0.05, (
        f"trunk features are input-independent (spread {spread}): BN "
        f"calibration failed, the task would be unlearnable")

    j, c = feats.shape[2], feats.shape[3]
    module = FeatCorrector(num_joints=j, feat_dim=c, h_size=64,
                           num_heads=2, stop_gaitfeat_grad=False)
    params0 = module.init(jax.random.PRNGKey(0), train_batch["features"],
                          train_batch["cparams"])
    # 1e-3 with cosine decay: constant 1e-3 destabilizes the phase head
    # after ~1100 steps (measured loss 0.06 -> 1.27), and 2e-3+ never
    # learns phase at all
    n_steps = 1000
    optimizer = optax.adam(optax.cosine_decay_schedule(1e-3, n_steps))
    state = training.create_train_state(params0, optimizer)
    step = jax.jit(training.make_gait_train_step(module, optimizer))

    first = None
    for i in range(n_steps):
        state, metrics = step(state, train_batches[i % len(train_batches)])
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < 0.5 * first, (first, metrics)

    def phase_err(p):
        _, _, pred_phase = module.apply(p, held_out["features"],
                                        held_out["cparams"])
        nrm = lambda v: v / (np.linalg.norm(v, axis=-1, keepdims=True)
                             + 1e-9)
        pp = np.asarray(pred_phase)
        gp = np.asarray(held_out["gait_phase"])
        cos1 = (nrm(pp[..., :2]) * nrm(gp[..., :2])).sum(-1)
        cos2 = (nrm(pp[..., 2:]) * nrm(gp[..., 2:])).sum(-1)
        return 1.0 - float(np.mean((cos1 + cos2) / 2))

    def avg_err(p):
        _, pred_avg, _ = module.apply(p, held_out["features"],
                                      held_out["cparams"])
        return float(np.mean((np.asarray(pred_avg)
                              - np.asarray(held_out["gait_avg"])) ** 2))

    def train_phase_err(p):
        errs = []
        for b in train_batches:
            _, _, pp = module.apply(p, b["features"], b["cparams"])
            nrm = lambda v: v / (np.linalg.norm(v, axis=-1, keepdims=True)
                                 + 1e-9)
            ppn, gp = np.asarray(pp), np.asarray(b["gait_phase"])
            c1 = (nrm(ppn[..., :2]) * nrm(gp[..., :2])).sum(-1)
            c2 = (nrm(ppn[..., 2:]) * nrm(gp[..., 2:])).sum(-1)
            errs.append(1.0 - float(np.mean((c1 + c2) / 2)))
        return float(np.mean(errs))

    # (a) the phase signal IS recoverable from the real trunk features
    # end-to-end (measured probe: 0.09 at 500 steps; untrained ~1.0)
    assert train_phase_err(state.params) < 0.35
    # (b) held-out SPEED/step recovery improves strongly (measured ~8x)
    a_un, a_tr = avg_err(params0), avg_err(state.params)
    assert a_tr < 0.35 * a_un, (
        f"held-out speed recovery did not improve: {a_un} -> {a_tr}")
    # (c) held-out PHASE improves too (measured ratio ~0.69 at 1000
    # steps): cross-clip phase generalization is data-limited at 24
    # training clips — grows with clip count, not a framework property
    e_un, e_tr = phase_err(params0), phase_err(state.params)
    assert e_tr < 0.85 * e_un, (
        f"held-out phase recovery did not improve: {e_un} -> {e_tr}")


def test_trunk_batch_pins_weights_once():
    """trunk_gait_batch must device_put the model's host weight tree at
    most once per model (CLAUDE.md: re-uploading ~250 MB per dispatch
    through the tunnel is the enemy) — round-3 review finding."""
    import jax

    from gaitlab import training

    class _Model:
        variables = {"params": {"w": np.ones((4,), np.float32)}}

    m = _Model()
    calls = []
    real = jax.device_put
    try:
        jax.device_put = lambda tree, *a, **k: (calls.append(1),
                                                real(tree, *a, **k))[1]
        a = training._pinned_variables(m)
        b = training._pinned_variables(m)
    finally:
        jax.device_put = real
    assert len(calls) == 1
    assert a is b
    # a NEW host tree (fresh model / reloaded weights) re-pins
    m.variables = {"params": {"w": np.zeros((4,), np.float32)}}
    try:
        jax.device_put = lambda tree, *a, **k: (calls.append(1),
                                                real(tree, *a, **k))[1]
        training._pinned_variables(m)
    finally:
        jax.device_put = real
    assert len(calls) == 2


def test_robustness_artifact():
    """docs/GAIT_ROBUSTNESS.json (scripts/gait_robustness.py) pins the
    corrector's operating envelope under clinical-pipeline corruption
    (VERDICT r3 #5): every measured cell must show the trained corrector
    beating the untrained baseline, and dropout degradation must be
    graceful (monotone-ish, bounded)."""
    import json
    import os.path as osp

    path = osp.join(osp.dirname(__file__), "..", "docs",
                    "GAIT_ROBUSTNESS.json")
    with open(path) as f:
        study = json.load(f)
    rows = study["results"]
    kinds = {r["corruption"] for r in rows}
    assert kinds == {"dropout", "bbox_jitter", "truncate"}
    for r in rows:
        assert r["trained_beats_untrained"], r
        assert r["phase_err_trained"] < 0.5 * r["phase_err_untrained"], r
    drop = {r["level"]: r["phase_err_trained"] for r in rows
            if r["corruption"] == "dropout"}
    assert drop[0.4] < 0.5, "40% dropout should still be usable"
    assert drop[0.0] < drop[0.4], "corruption-free must be the best case"

    # distribution-shift cells (VERDICT r4 weak #6): a corrector trained
    # ONLY on regime A must generalize to disjoint regimes (non-
    # overlapping gait-frequency band, 2.5x camera sway, 1.6x noise,
    # disjoint seed families), not just its training band
    tr = {r["cell"]: r for r in study["transfer"]["results"]}
    assert set(tr) == {"in_regime_holdout", "shifted_freq_band",
                       "shifted_freq_cam_noise"}
    for cell, r in tr.items():
        assert r["trained_beats_untrained"], r
        assert r["phase_err_trained"] < 0.5 * r["phase_err_untrained"], r
    # transfer costs something (honesty check: the shifted cells are
    # genuinely out of regime) but stays usable
    assert tr["shifted_freq_band"]["phase_err_trained"] > \
        tr["in_regime_holdout"]["phase_err_trained"]
    assert tr["shifted_freq_band"]["phase_err_trained"] < 0.3
