"""Pallas kernel correctness (interpret mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaitlab.body import smpl as body_smpl
from gaitlab.ops import lbs_pallas


def test_blendshapes_kernel_matches_reference(rng):
    v, s, p, b = 431, 10, 207, 5  # odd sizes exercise padding
    vt = rng.normal(size=(v, 3)).astype(np.float32)
    sh = rng.normal(size=(v, 3, s)).astype(np.float32) * 0.1
    po = rng.normal(size=(p, v * 3)).astype(np.float32) * 0.01
    betas = rng.normal(size=(b, s)).astype(np.float32)
    pose = rng.normal(size=(b, p)).astype(np.float32) * 0.1

    ref = lbs_pallas.blendshapes_reference(vt, sh, po, betas, pose)
    got = lbs_pallas.blendshapes(vt, sh, po, betas, pose, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attention_kernel_matches_reference(rng):
    from gaitlab.nn.layers import keypoint_attention
    from gaitlab.ops.attention_pallas import keypoint_attention_fused

    b, h, w = 3, 14, 14  # hw=196, exercises lane padding
    feats = jnp.asarray(rng.normal(size=(b, h, w, 128)).astype(np.float32))
    cam = jnp.asarray(rng.normal(size=(b, h, w, 64)).astype(np.float32))
    hm = jnp.asarray(rng.normal(size=(b, h, w, 24)).astype(np.float32) * 3)

    ref_f = keypoint_attention(feats, hm)
    ref_c = keypoint_attention(cam, hm)
    got_f, got_c = keypoint_attention_fused(feats, cam, hm, interpret=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)


def test_lbs_pallas_path_matches_default(rng, monkeypatch):
    # interpret mode so the kernel runs on the CPU test backend
    import gaitlab.ops.lbs_pallas as lp

    orig = lp.blendshapes
    monkeypatch.setattr(
        lp, "blendshapes",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    params = body_smpl.synthetic_smpl_params()
    b = 3
    betas = jnp.asarray(rng.normal(size=(b, 10)).astype(np.float32) * 0.1)
    aa = rng.normal(size=(b, 24, 3)).astype(np.float32) * 0.3
    from gaitlab.core import geometry

    rots = geometry.axis_angle_to_rotmat(
        jnp.asarray(aa.reshape(-1, 3))).reshape(b, 24, 3, 3)

    v0, j0 = body_smpl.lbs(params, betas, rots, use_pallas=False)
    v1, j1 = body_smpl.lbs(params, betas, rots, use_pallas=True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j0),
                               rtol=2e-4, atol=2e-5)
