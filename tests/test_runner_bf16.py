"""Runner fast modes: bf16 trunk dtype + optimizer factory."""

import numpy as np
import pytest


def test_runner_bf16_trunk(monkeypatch, rng):
    monkeypatch.setenv("GAITLAB_BUCKETS", "4")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create()
    frames = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    bb = np.tile(np.array([32.0, 32.0, 50.0, 50.0], np.float32), (4, 1))
    out = GRNetRunner(model, precision="default",
                      trunk_dtype="bfloat16").run_track(frames, bb)
    assert out["joints3d"].dtype == np.float32  # f32 SMPL path preserved
    assert np.isfinite(out["joints3d"]).all()
    assert np.isfinite(out["verts"]).all()


def test_make_optimizer_variants():
    import jax.numpy as jnp

    from gaitlab.training import make_optimizer

    p = {"w": jnp.ones((3,))}
    g = {"w": jnp.ones((3,))}
    for kind in ("adam", "adamw", "sgd"):
        for sched in (None, "cosine", "step"):
            opt = make_optimizer(1e-3, kind=kind, schedule=sched,
                                 total_steps=100, warmup_steps=10)
            st = opt.init(p)
            up, _ = opt.update(g, st, p)
            assert np.isfinite(np.asarray(up["w"])).all()
    with pytest.raises(ValueError):
        make_optimizer(kind="rmsprop")
