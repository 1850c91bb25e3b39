"""GRNetRunner with the gait branch enabled (camera reparam + corrector)."""

import numpy as np
import pytest


def test_runner_gait_mode(monkeypatch, rng):
    monkeypatch.setenv("GAITLAB_BUCKETS", "8")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create(use_gait_feat=True, featcorr_h_size=64)
    runner = GRNetRunner(model)
    frames = rng.integers(0, 255, (6, 96, 128, 3)).astype(np.uint8)
    bboxes = np.tile(np.array([64.0, 48.0, 70.0, 70.0], np.float32), (6, 1))
    out = runner.run_track(frames, bboxes)
    assert out["joints3d"].shape == (6, 29, 3)
    assert out["pred_avg"].shape == (3,)
    assert out["pred_phase"].shape == (6, 4)
    assert np.all(np.isfinite(out["pred_phase"]))


def test_runner_gait_bucketed(monkeypatch, rng):
    # track longer than one bucket: two windows, track-level avg merged
    monkeypatch.setenv("GAITLAB_BUCKETS", "4")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create(use_gait_feat=True, featcorr_h_size=64)
    runner = GRNetRunner(model)
    frames = rng.integers(0, 255, (7, 64, 64, 3)).astype(np.uint8)
    bboxes = np.tile(np.array([32.0, 32.0, 50.0, 50.0], np.float32), (7, 1))
    out = runner.run_track(frames, bboxes)
    assert out["joints3d"].shape == (7, 29, 3)
    assert out["pred_phase"].shape == (7, 4)


def test_runner_gait_pad_masking(monkeypatch, rng):
    """Padded tail frames must not change the gait estimates (VERDICT r1 #7):
    a 5-frame track padded to an 8-bucket must match the exact-5 bucket."""
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create(use_gait_feat=True, featcorr_h_size=64)
    frames = rng.integers(0, 255, (5, 64, 64, 3)).astype(np.uint8)
    bboxes = np.tile(np.array([32.0, 32.0, 50.0, 50.0], np.float32), (5, 1))

    out_exact = GRNetRunner(model, buckets=(5,)).run_track(frames, bboxes)
    out_padded = GRNetRunner(model, buckets=(8,)).run_track(frames, bboxes)
    np.testing.assert_allclose(out_padded["pred_avg"], out_exact["pred_avg"],
                               atol=1e-4)
    np.testing.assert_allclose(out_padded["pred_phase"],
                               out_exact["pred_phase"], atol=1e-4)
    np.testing.assert_allclose(out_padded["joints3d"], out_exact["joints3d"],
                               atol=1e-4)


def test_pred_avg_merge_is_length_weighted(monkeypatch):
    """Chunk merge weights per-chunk gait estimates by real frame count
    (VERDICT r1 weak #7: tail chunk with few frames must not count as much
    as a full chunk)."""
    import jax.numpy as jnp

    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create(use_gait_feat=True, featcorr_h_size=64)
    runner = GRNetRunner(model, buckets=(4,))

    def fake_forward(b, raw_uint8=False):
        def fwd(variables, smpl, images, bbox=None, cimg=None, n_valid=None):
            n = images.shape[0]
            val = float(n_valid)
            return {
                "theta": np.zeros((n, 85), np.float32),
                "pred_avg": np.full((1, 3), val, np.float32),
                "pred_phase": np.zeros((n, 4), np.float32),
            }
        return fwd

    monkeypatch.setattr(runner, "_forward", fake_forward)
    crops = jnp.zeros((5, 8, 8, 3), jnp.float32)  # chunks: 4 + 1
    out = runner.forward_crops(crops, bbox=np.ones((5, 4), np.float32),
                               cimg=np.ones((5, 2), np.float32))
    # weighted: (4*4 + 1*1) / 5 = 3.4 ; unweighted mean would be 2.5
    np.testing.assert_allclose(out["pred_avg"], 3.4, atol=1e-6)
