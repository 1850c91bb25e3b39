"""Parity: gaitlab legacy SPIN/HMR + ResNet vs the reference spin.py."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import refutil
from gaitlab.body import smpl as gsmpl
from gaitlab.nn import spin as gspin
from gaitlab.weights import torch_import as ti


@pytest.fixture(scope="module")
def ref_spin(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("refspin"))
    refutil.setup_ref_data_dir(tmpdir, seed=0)
    cwd = os.getcwd()
    os.chdir(tmpdir)
    refutil.import_ref_lib()
    import lib.core.config as ref_cfg

    # reference spin.py imports VIBE_DATA_DIR which config.py never defines
    # (latent defect — the module is import-broken as shipped); patch it.
    if not hasattr(ref_cfg, "VIBE_DATA_DIR"):
        ref_cfg.VIBE_DATA_DIR = "data/grnet_data"
    import lib.models.spin as ref_spin_mod

    yield ref_spin_mod
    os.chdir(cwd)


def test_hmr_matches_reference(ref_spin, rng):
    torch.manual_seed(0)
    ref = ref_spin.hmr(smpl_mean_params="data/smpl_data/smpl_mean_params.npz",
                       pretrained=False)
    ref.eval()

    smpl_params = gsmpl.load_smpl_params("data/smpl_data/SMPL_NEUTRAL.pkl")
    smpl_params = gsmpl.with_extra_regressor(
        smpl_params, "data/smpl_data/J_regressor_extra.npy")
    mean = dict(np.load("data/smpl_data/smpl_mean_params.npz"))
    ours = gspin.HMR.create(smpl_params=smpl_params, mean_params=mean,
                            joint_mode="spin2")

    # import reference weights: backbone.* <- resnet names, head.* <- fc*
    state = ref.state_dict()
    remapped = {}
    head_keys = ("fc1", "fc2", "decpose", "decshape", "deccam")
    for k, v in state.items():
        if k.startswith("smpl.") or k.startswith("init_"):
            continue
        top = k.split(".")[0]
        if top in head_keys:
            remapped["head." + k] = v
        else:
            remapped["backbone." + k] = v
    variables, missing, unused = ti.flax_tree_from_torch(
        remapped, ours.variables, strict=False)
    assert not missing, missing[:5]
    ours.variables = variables

    x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))[-1]

    got = ours.forward(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))[-1]
    # reference HMR's SMPL is the kinectv2-mode wrapper -> 29 spin2 joints
    np.testing.assert_allclose(np.asarray(got["theta"]),
                               ref_out["theta"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["verts"]),
                               ref_out["verts"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["kp_3d"]),
                               ref_out["kp_3d"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["kp_2d"]),
                               ref_out["kp_2d"].numpy(), atol=2e-2)


def test_regressor_matches_reference(ref_spin, rng):
    torch.manual_seed(1)
    ref = ref_spin.Regressor(
        smpl_mean_params="data/smpl_data/smpl_mean_params.npz")
    ref.eval()

    smpl_params = gsmpl.load_smpl_params("data/smpl_data/SMPL_NEUTRAL.pkl")
    smpl_params = gsmpl.with_extra_regressor(
        smpl_params, "data/smpl_data/J_regressor_extra.npy")
    mean = dict(np.load("data/smpl_data/smpl_mean_params.npz"))

    import flax.linen as nn

    head = gspin.RegressorHead()
    feats = rng.normal(size=(3, 2048)).astype(np.float32)
    p, s, c = gspin.default_init_params(3, mean)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(feats), p, s, c)
    remapped = {k: v for k, v in ref.state_dict().items()
                if not (k.startswith("smpl.") or k.startswith("init_"))}
    variables, missing, _ = ti.flax_tree_from_torch(remapped, variables,
                                                    strict=False)
    assert not missing

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feats))[-1]

    pose6d, shape, cam = head.apply(variables, jnp.asarray(feats), p, s, c)
    got = gspin.regress_output(smpl_params, pose6d, shape, cam,
                               joint_mode="spin2")[-1]
    np.testing.assert_allclose(np.asarray(got["theta"]),
                               ref_out["theta"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["rotmat"]),
                               ref_out["rotmat"].numpy(), atol=2e-4)
