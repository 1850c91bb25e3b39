"""Numerics parity: gaitlab.core.geometry vs /root/reference/lib/utils/geometry.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gaitlab.core import geometry as G
from refutil import ref_geometry

R = ref_geometry()

ATOL = 2e-5


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


@pytest.fixture(scope="module")
def aa(scope="module"):
    rng = np.random.default_rng(1)
    return (rng.normal(size=(64, 3)) * 1.5).astype(np.float32)


@pytest.fixture(scope="module")
def rotmats(aa):
    return R.batch_rodrigues(t(aa)).reshape(-1, 3, 3).numpy()


def test_axis_angle_to_rotmat(aa):
    ours = np.asarray(G.axis_angle_to_rotmat(jnp.asarray(aa))).reshape(-1, 9)
    ref = R.batch_rodrigues(t(aa)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_quat_to_rotmat(aa):
    q = R.axisang2quater(t(aa)).numpy()
    ours = np.asarray(G.quat_to_rotmat(jnp.asarray(q)))
    ref = R.quat2mat(t(q)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_rotmat_to_quat(rotmats):
    ours = np.asarray(G.rotmat_to_quat(jnp.asarray(rotmats)))
    ref = R.rotation_matrix_to_quaternion(t(rotmats)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_rotmat_to_quat_branches():
    # Exercise all four selection branches: identity, and 180-deg rotations
    # about x, y, z (trace = -1 cases hit branches 0-2).
    mats = []
    for axis in np.eye(3):
        mats.append(R.batch_rodrigues(t(axis[None] * np.pi)).reshape(3, 3).numpy())
    mats.append(np.eye(3, dtype=np.float32))
    mats = np.stack(mats)
    ours = np.asarray(G.rotmat_to_quat(jnp.asarray(mats)))
    ref = R.rotation_matrix_to_quaternion(t(mats)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_rotmat_to_axis_angle_roundtrip(aa, rotmats):
    ours = np.asarray(G.rotmat_to_axis_angle(jnp.asarray(rotmats)))
    ref = R.rotation_matrix_to_angle_axis(t(rotmats)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # roundtrip recovers the input rotation
    back = np.asarray(G.axis_angle_to_rotmat(jnp.asarray(ours))).reshape(-1, 3, 3)
    np.testing.assert_allclose(back, rotmats, atol=1e-4)


def test_quat_to_axis_angle(aa):
    q = R.axisang2quater(t(aa)).numpy()
    ours = np.asarray(G.quat_to_axis_angle(jnp.asarray(q)))
    ref = R.quaternion_to_angle_axis(t(q)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_qrot_qmul(aa):
    rng = np.random.default_rng(2)
    q = R.axisang2quater(t(aa)).numpy()
    v = rng.normal(size=(64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(G.qrot(jnp.asarray(q), jnp.asarray(v))),
        R.qrot(t(q), t(v)).numpy(),
        atol=ATOL,
    )
    q2 = np.roll(q, 7, axis=0)
    np.testing.assert_allclose(
        np.asarray(G.qmul(jnp.asarray(q), jnp.asarray(q2))),
        R.qmul(t(q), t(q2)).numpy(),
        atol=ATOL,
    )


def test_qfix():
    rng = np.random.default_rng(3)
    aa = rng.normal(size=(20 * 4, 3)).astype(np.float32)
    q = R.axisang2quater(t(aa)).numpy().reshape(20, 4, 4)
    signs = rng.choice([-1.0, 1.0], size=(20, 4, 1)).astype(np.float32)
    q = q * signs
    np.testing.assert_allclose(
        np.asarray(G.qfix(jnp.asarray(q))), R.qfix(t(q)).numpy(), atol=ATOL
    )


def test_rot6d(aa):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(64, 6)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(G.rot6d_to_rotmat(jnp.asarray(x))),
        R.rot6d_to_rotmat(t(x)).numpy(),
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(G.rot6d_to_rotmat_spin(jnp.asarray(x))),
        R.rot6d_to_rotmat_spin(t(x)).numpy(),
        atol=ATOL,
    )
    rm = R.batch_rodrigues(t(np.asarray(aa))).reshape(-1, 3, 3).numpy()
    np.testing.assert_allclose(
        np.asarray(G.rotmat_to_rot6d(jnp.asarray(rm))),
        R.rotmat_to_rot6d(t(rm)).numpy(),
        atol=ATOL,
    )


def test_cameras():
    rng = np.random.default_rng(5)
    B, N = 8, 29
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    cam = np.stack(
        [
            rng.uniform(0.5, 2.0, B),
            rng.normal(size=B) * 0.2,
            rng.normal(size=B) * 0.2,
        ],
        axis=-1,
    ).astype(np.float32)

    np.testing.assert_allclose(
        np.asarray(G.convert_weak_perspective_to_perspective(jnp.asarray(cam))),
        R.convert_weak_perspective_to_perspective(t(cam)).numpy(),
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(G.projection(jnp.asarray(pts), jnp.asarray(cam))),
        R.projection(t(pts), t(cam)).numpy(),
        rtol=1e-4, atol=1e-4,
    )

    rot = R.batch_rodrigues(t(rng.normal(size=(B, 3)))).reshape(B, 3, 3).numpy()
    trans = rng.normal(size=(B, 3)).astype(np.float32) + np.array([0, 0, 5], np.float32)
    center = rng.normal(size=(B, 2)).astype(np.float32) * 10
    np.testing.assert_allclose(
        np.asarray(
            G.perspective_projection(
                jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(trans),
                5000.0, jnp.asarray(center),
            )
        ),
        R.perspective_projection(t(pts), t(rot), t(trans), 5000.0, t(center)).numpy(),
        rtol=1e-4, atol=1e-3,
    )


def test_estimate_translation():
    rng = np.random.default_rng(6)
    B = 4
    S = rng.normal(size=(B, 49, 3)).astype(np.float32)
    j2d = np.concatenate(
        [
            rng.uniform(0, 224, size=(B, 49, 2)),
            rng.uniform(0.3, 1.0, size=(B, 49, 1)),
        ],
        axis=-1,
    ).astype(np.float32)
    ours = np.asarray(G.estimate_translation(jnp.asarray(S), jnp.asarray(j2d)))
    ref = R.estimate_translation(t(S), t(j2d)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
