"""Parity tests: JAX temporal filters vs. the reference/scipy oracles."""

import numpy as np
import pytest

import refutil
from gaitlab.core import filters
from gaitlab.pipeline import boxes


def _ref_one_euro(x, min_cutoff, beta):
    """Drive the reference OneEuroFilter exactly as smooth_pose.py:53-95 does."""
    mod = refutil.load_module_from_path(
        "ref_one_euro", refutil.REF + "/lib/utils/one_euro_filter.py"
    )
    f = mod.OneEuroFilter(
        np.zeros_like(x[0]), x[0], min_cutoff=min_cutoff, beta=beta
    )
    out = np.zeros_like(x)
    out[0] = x[0]
    for idx in range(1, len(x)):
        t = np.ones_like(x[idx]) * idx
        out[idx] = f(t, x[idx])
    return out


@pytest.mark.parametrize("min_cutoff,beta", [(0.004, 0.7), (1.0, 0.0), (0.05, 1.5)])
def test_one_euro_matches_reference(rng, min_cutoff, beta):
    x = rng.normal(size=(40, 24, 3)).astype(np.float32).cumsum(axis=0)
    ref = _ref_one_euro(x.copy(), min_cutoff, beta)
    got = np.asarray(filters.one_euro(x, min_cutoff=min_cutoff, beta=beta))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_median_filter_matches_scipy(rng):
    import scipy.signal as signal

    x = rng.normal(size=(50,)).astype(np.float32)
    ref = signal.medfilt(x, 11)
    got = np.asarray(filters.median_filter1d(x, 11))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_gaussian_filter_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter1d as ref_g

    for n, sigma in [(50, 3.0), (50, 8.0), (12, 8.0)]:
        x = rng.normal(size=(n, 3)).astype(np.float32)
        ref = np.stack([ref_g(x[:, i], sigma) for i in range(3)], axis=1)
        got = np.asarray(filters.gaussian_filter1d(x, sigma))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_smooth_bbox_params_matches_reference(rng):
    ref_mod = refutil.load_module_from_path(
        "ref_smooth_bbox", refutil.REF + "/lib/utils/smooth_bbox.py"
    )
    x = (rng.normal(size=(60, 3)).astype(np.float32) * 5 + 100).cumsum(axis=0)
    ref = ref_mod.smooth_bbox_params(x, kernel_size=11, sigma=8)
    got = filters.smooth_bbox_params(x, kernel_size=11, sigma=8)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_get_all_bbox_params_matches_reference(rng):
    ref_mod = refutil.load_module_from_path(
        "ref_smooth_bbox2", refutil.REF + "/lib/utils/smooth_bbox.py"
    )
    kps = []
    for i in range(30):
        if i < 3 or i in (10, 11, 12) or i >= 27:
            kps.append(None)  # leading gap, mid gap, trailing gap
        else:
            kp = np.zeros((17, 3), np.float32)
            kp[:, 0] = rng.uniform(100, 200, 17)
            kp[:, 1] = rng.uniform(100, 400, 17)
            kp[:, 2] = 3.0
            kps.append(kp)
    ref_p, ref_s, ref_e = ref_mod.get_all_bbox_params(kps, vis_thresh=2)
    got_p, got_s, got_e = boxes.get_all_bbox_params(kps, vis_thresh=2)
    assert (got_s, got_e) == (ref_s, ref_e)
    np.testing.assert_allclose(got_p, ref_p, rtol=1e-5)

    ref_sm, s1, e1 = ref_mod.get_smooth_bbox_params(kps, vis_thresh=2)
    got_sm, s2, e2 = boxes.get_smooth_bbox_params(kps, vis_thresh=2)
    assert (s1, e1) == (s2, e2)
    np.testing.assert_allclose(got_sm, ref_sm, rtol=1e-4, atol=1e-3)


def test_smooth_pose_runs(rng):
    from gaitlab.pipeline import smoothing

    T = 12
    pose = rng.normal(size=(T, 72)).astype(np.float32) * 0.2
    betas = rng.normal(size=(T, 10)).astype(np.float32) * 0.03
    verts, pose_hat, joints = smoothing.smooth_pose(pose, betas)
    assert verts.shape == (T, 6890, 3)
    assert pose_hat.shape == (T, 72)
    assert joints.shape == (T, 29, 3)
    np.testing.assert_allclose(pose_hat[0], pose[0], atol=1e-6)

    _, _, joints_k = smoothing.smooth_pose(pose, betas, kinectv2=True)
    assert joints_k.shape == (T, 25, 3)
