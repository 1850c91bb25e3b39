"""Legacy SPIN/HMR: ResNet-50 backbone + 3-iteration SMPL regressor.

Re-design of /root/reference/lib/models/spin.py:60-315 (kept in the
reference for weight provenance; `Regressor` is also used by the vis
debug utilities, vis.py:474). The iterative refinement loop is a small
static unroll — XLA sees a fixed 3-step graph.

The SMPL evaluation is the pure-function gaitlab.body.smpl path, so — like
GRNet — an HMR forward is one jittable program end to end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaitlab.body import smpl as body_smpl
from gaitlab.core import geometry
from gaitlab.nn.resnet import ResNet
from gaitlab.nn.hrnet import Bottleneck

Array = jax.Array

NPOSE = 24 * 6


class RegressorHead(nn.Module):
    """Iterative residual regressor (spin.py:210-248 forward loop).

    Consumes (N, F) features + running (pose6d, shape, cam) estimates.
    Dropout is identity at inference (reference runs eval mode).
    """

    @nn.compact
    def __call__(self, xf: Array, init_pose: Array, init_shape: Array,
                 init_cam: Array, n_iter: int = 3):
        fc1 = nn.Dense(1024, name="fc1")
        fc2 = nn.Dense(1024, name="fc2")
        decpose = nn.Dense(NPOSE, name="decpose")
        decshape = nn.Dense(10, name="decshape")
        deccam = nn.Dense(3, name="deccam")

        pred_pose, pred_shape, pred_cam = init_pose, init_shape, init_cam
        for _ in range(n_iter):
            xc = jnp.concatenate([xf, pred_pose, pred_shape, pred_cam], 1)
            xc = fc2(fc1(xc))
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam
        return pred_pose, pred_shape, pred_cam


class HMRCore(nn.Module):
    """ResNet-50 trunk + regressor head (spin.py:60-210)."""

    layers: tuple = (3, 4, 6, 3)

    def setup(self):
        self.backbone = ResNet(block=Bottleneck, layers=self.layers,
                               name="backbone")
        self.head = RegressorHead(name="head")

    def feature_extractor(self, x: Array) -> Array:
        return self.backbone(x, train=False)

    def __call__(self, x: Array, init_pose: Array, init_shape: Array,
                 init_cam: Array, n_iter: int = 3):
        xf = self.backbone(x, train=False)
        return self.head(xf, init_pose, init_shape, init_cam, n_iter=n_iter)


def regress_output(
    smpl_params: body_smpl.SMPLParams,
    pred_pose6d: Array,
    pred_shape: Array,
    pred_cam: Array,
    J_regressor: Optional[Array] = None,
    joint_mode: str = "spin2",
) -> list[dict]:
    """rot6d/shape/cam -> reference output list (spin.py:269-296)."""
    n = pred_pose6d.shape[0]
    pred_rotmat = geometry.rot6d_to_rotmat(
        pred_pose6d.reshape(-1, 6)).reshape(n, 24, 3, 3)
    out = body_smpl.smpl_forward(smpl_params, pred_shape, pred_rotmat,
                                 joint_mode=joint_mode)
    pred_vertices, pred_joints = out["vertices"], out["joints"]
    if J_regressor is not None:
        pred_joints = jnp.einsum("jv,nvk->njk", J_regressor, pred_vertices,
                                 precision=jax.lax.Precision.HIGHEST)
        pred_joints = pred_joints[:, list(body_smpl.H36M_TO_J14)]
    kp2d = geometry.projection(pred_joints, pred_cam)
    pose = geometry.rotmat_to_axis_angle(
        pred_rotmat.reshape(-1, 3, 3)).reshape(-1, 72)
    return [{
        "theta": jnp.concatenate([pred_cam, pose, pred_shape], axis=1),
        "verts": pred_vertices,
        "kp_2d": kp2d,
        "kp_3d": pred_joints,
        "rotmat": pred_rotmat,
    }]


def default_init_params(n: int, mean_params: Optional[dict] = None):
    """Mean-parameter initial estimates (spin.py:225-235 buffers)."""
    if mean_params is None:
        pose = jnp.tile(geometry.rotmat_to_rot6d(
            jnp.eye(3)[None].repeat(24, 0)).reshape(1, -1), (n, 1))
        shape = jnp.zeros((n, 10))
        cam = jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (n, 1))
    else:
        pose = jnp.tile(jnp.asarray(mean_params["pose"]).reshape(1, -1), (n, 1))
        shape = jnp.tile(jnp.asarray(
            mean_params["shape"], jnp.float32).reshape(1, -1), (n, 1))
        cam = jnp.tile(jnp.asarray(mean_params["cam"]).reshape(1, -1), (n, 1))
    return pose, shape, cam


@dataclass
class HMR:
    """Bundled legacy model (reference hmr()/get_pretrained_hmr,
    spin.py:298-315)."""

    module: HMRCore
    variables: Any
    smpl: body_smpl.SMPLParams
    mean_params: Optional[dict] = None
    joint_mode: str = "spin2"

    @staticmethod
    def create(smpl_params=None, seed: int = 0, mean_params=None,
               joint_mode: str = "spin2") -> "HMR":
        module = HMRCore()
        rng = jax.random.PRNGKey(seed)
        p, s, c = default_init_params(1, mean_params)
        variables = module.init(rng, jnp.zeros((1, 224, 224, 3)), p, s, c)
        if smpl_params is None:
            smpl_params = body_smpl.synthetic_smpl_params()
        return HMR(module, variables, smpl_params, mean_params, joint_mode)

    def forward(self, images_nhwc: Array, n_iter: int = 3,
                J_regressor: Optional[Array] = None) -> list[dict]:
        n = images_nhwc.shape[0]
        p, s, c = default_init_params(n, self.mean_params)
        pose6d, shape, cam = self.module.apply(
            self.variables, images_nhwc, p, s, c, n_iter=n_iter)
        return regress_output(self.smpl, pose6d, shape, cam,
                              J_regressor=J_regressor,
                              joint_mode=self.joint_mode)
