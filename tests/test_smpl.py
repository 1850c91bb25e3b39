"""SMPL forward parity: gaitlab.body.smpl vs the reference torch stack.

The torch oracle is tests/refutil's smplx shim (standard public LBS math)
driven through the *reference's* lib.models.smpl.SMPL wrapper, so the whole
joint-assembly path (extra regressor, spin2/spin gathers) is covered.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import refutil
from gaitlab.body import smpl as gsmpl
from gaitlab.core import geometry as G

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("refdata"))
    refutil.setup_ref_data_dir(tmpdir, seed=0)
    cwd = os.getcwd()
    os.chdir(tmpdir)
    refutil.import_ref_lib()
    yield tmpdir
    os.chdir(cwd)


@pytest.fixture(scope="module")
def params(ref_env):
    p = gsmpl.load_smpl_params(os.path.join(ref_env, "data/smpl_data/SMPL_NEUTRAL.pkl"))
    return gsmpl.with_extra_regressor(
        p, os.path.join(ref_env, "data/smpl_data/J_regressor_extra.npy")
    )


@pytest.fixture(scope="module")
def pose_inputs():
    rng = np.random.default_rng(7)
    B = 6
    betas = rng.normal(size=(B, 10)).astype(np.float32)
    aa = (rng.normal(size=(B, 24, 3)) * 0.4).astype(np.float32)
    return betas, aa


def _ref_smpl(kinectv2: bool):
    from lib.models.smpl import SMPL

    SMPL.kinectv2 = kinectv2
    m = SMPL("data/smpl_data", create_transl=False)
    SMPL.kinectv2 = True  # restore class default
    return m


def test_zero_pose_is_template(params):
    """Closed-form: identity pose + zero betas -> template vertices."""
    B = 2
    rot = jnp.broadcast_to(jnp.eye(3), (B, 24, 3, 3))
    out = gsmpl.smpl_forward(params, jnp.zeros((B, 10)), rot, joint_mode="smpl24")
    np.testing.assert_allclose(
        np.asarray(out["vertices"][0]), np.asarray(params.v_template), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["joints"][0]),
        np.asarray(params.J_regressor @ params.v_template),
        atol=1e-5,
    )


def test_spin2_parity(params, pose_inputs, ref_env):
    betas, aa = pose_inputs
    m = _ref_smpl(kinectv2=True)
    m.kinectv2 = True
    with torch.no_grad():
        ref = m(
            betas=torch.tensor(betas),
            body_pose=torch.tensor(aa[:, 1:].reshape(len(betas), -1, 3)),
            global_orient=torch.tensor(aa[:, :1]),
        )
    rot = G.axis_angle_to_rotmat(jnp.asarray(aa.reshape(-1, 3))).reshape(-1, 24, 3, 3)
    ours = gsmpl.smpl_forward(params, jnp.asarray(betas), rot, joint_mode="spin2")
    assert ours["joints"].shape == (len(betas), 29, 3)
    np.testing.assert_allclose(
        np.asarray(ours["vertices"]), ref.vertices.numpy(), atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(ours["joints"]), ref.joints.numpy(), atol=ATOL
    )


def test_spin49_parity(params, pose_inputs, ref_env):
    betas, aa = pose_inputs
    m = _ref_smpl(kinectv2=False)
    m.kinectv2 = False
    with torch.no_grad():
        ref = m(
            betas=torch.tensor(betas),
            body_pose=torch.tensor(aa[:, 1:].reshape(len(betas), -1, 3)),
            global_orient=torch.tensor(aa[:, :1]),
        )
    rot = G.axis_angle_to_rotmat(jnp.asarray(aa.reshape(-1, 3))).reshape(-1, 24, 3, 3)
    ours = gsmpl.smpl_forward(params, jnp.asarray(betas), rot, joint_mode="spin")
    assert ours["joints"].shape == (len(betas), 49, 3)
    np.testing.assert_allclose(
        np.asarray(ours["joints"]), ref.joints.numpy(), atol=ATOL
    )


def test_smpl_head_projection_parity(params, pose_inputs, ref_env):
    """SMPLHead (LBS + weak-perspective projection), smpl.py:149-190."""
    betas, aa = pose_inputs
    B = len(betas)
    rng = np.random.default_rng(8)
    cam = np.stack(
        [rng.uniform(0.7, 1.3, B), rng.normal(size=B) * 0.1, rng.normal(size=B) * 0.1],
        axis=-1,
    ).astype(np.float32)

    from lib.models.smpl import SMPLHead

    head = SMPLHead(smpl_model_dir="data/smpl_data")
    rot_t = (
        torch.tensor(
            np.asarray(
                G.axis_angle_to_rotmat(jnp.asarray(aa.reshape(-1, 3)))
            ).reshape(B, 24, 3, 3)
        )
    )
    with torch.no_grad():
        ref = head(
            rotmat=rot_t,
            shape=torch.tensor(betas),
            cam=torch.tensor(cam),
            normalize_joints2d=True,
        )

    rot = G.axis_angle_to_rotmat(jnp.asarray(aa.reshape(-1, 3))).reshape(B, 24, 3, 3)
    ours = gsmpl.smpl_head(
        params,
        rot,
        jnp.asarray(betas),
        cam=jnp.asarray(cam),
        normalize_joints2d=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["smpl_joints3d"]), ref["smpl_joints3d"].numpy(), atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(ours["smpl_joints2d"]), ref["smpl_joints2d"].numpy(),
        rtol=1e-3, atol=1e-3,
    )


def test_jit_and_vmap(params):
    fwd = jax.jit(lambda b, r: gsmpl.smpl_forward(params, b, r, "spin2")["joints"])
    B = 4
    rot = jnp.broadcast_to(jnp.eye(3), (B, 24, 3, 3))
    out = fwd(jnp.zeros((B, 10)), rot)
    assert out.shape == (B, 29, 3)
    assert np.isfinite(np.asarray(out)).all()
