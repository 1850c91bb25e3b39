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
