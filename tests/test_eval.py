"""Evaluation metrics: MPJPE/PA-MPJPE/PVE/accel correctness."""

import numpy as np
import pytest

from gaitlab import eval as gleval


def test_mpjpe_zero_and_translation(rng):
    gt = rng.normal(size=(3, 14, 3)).astype(np.float32)
    assert np.allclose(np.asarray(gleval.mpjpe(gt, gt)), 0.0, atol=1e-6)
    # constant offset = exactly that distance
    off = gt + np.array([0.03, 0.0, 0.04], np.float32)
    np.testing.assert_allclose(np.asarray(gleval.mpjpe(off, gt)), 0.05,
                               atol=1e-6)
    # root alignment removes the offset
    np.testing.assert_allclose(
        np.asarray(gleval.mpjpe(off, gt, pelvis_idx=[0])), 0.0, atol=1e-5)


def test_pa_mpjpe_invariant_to_similarity(rng):
    gt = rng.normal(size=(2, 14, 3)).astype(np.float32)
    # random rotation + scale + translation of the prediction
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]], np.float32)
    pred = 1.3 * gt @ R.T + np.array([0.5, -0.2, 0.1], np.float32)
    err = np.asarray(gleval.pa_mpjpe(pred, gt))
    assert np.all(err < 1e-5), err
    # and it matches scipy's orthogonal procrustes on one sample
    noisy = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.01
    err2 = np.asarray(gleval.pa_mpjpe(noisy, gt))
    assert np.all(err2 > 0) and np.all(err2 < 0.02)


def test_pve_and_accel(rng):
    v = rng.normal(size=(4, 100, 3)).astype(np.float32)
    assert np.allclose(np.asarray(gleval.pve(v, v)), 0.0)
    seq = rng.normal(size=(10, 14, 3)).astype(np.float32)
    assert np.allclose(np.asarray(gleval.accel_error(seq, seq)), 0.0)
    report = gleval.evaluate_batch(v[:, :14], v[:, :14] + 0.001,
                                   pred_verts=v, gt_verts=v)
    # +1mm in each axis -> sqrt(3) mm joint distance
    assert report["mpjpe"] == pytest.approx(np.sqrt(3), rel=1e-3)
    assert report["pve"] == 0.0
