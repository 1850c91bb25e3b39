"""Pose smoothing: 1-euro filter + one batched SMPL re-evaluation.

Re-design of /root/reference/lib/utils/smooth_pose.py:28-117, which runs
the 1-euro filter in a Python loop and re-evaluates the full SMPL model
**per frame at batch size 1 on CPU** — the anti-pattern SURVEY.md §3.5
flags. Here the recurrence is a `lax.scan` (gaitlab.core.filters.one_euro)
and the SMPL regeneration is ONE batched LBS pass over all frames, so the
whole smoother is a single XLA program.

Reference quirks kept for output parity:
  * betas of frame 0 are used for every re-evaluated frame
    (smooth_pose.py:74,92 always index pred_betas[0]);
  * out[0] == in[0] (filter initialised at the first frame);
  * optional spin2 -> kinectv2 joint conversion (smooth_pose.py:113-114).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gaitlab.body import joints as joints_mod
from gaitlab.body import smpl as body_smpl
from gaitlab.core import filters, geometry


def smooth_pose(
    pred_pose: np.ndarray,
    pred_betas: np.ndarray,
    smpl_params: Optional[body_smpl.SMPLParams] = None,
    min_cutoff: float = 0.004,
    beta: float = 0.7,
    kinectv2: bool = False,
):
    """Filter a (T,72) axis-angle (or (T,96) quaternion) pose sequence and
    regenerate vertices/joints.

    Returns (verts (T,V,3), pose_hat (T,72|96), joints3d (T,J,3)).
    """
    pred_pose = np.asarray(pred_pose, np.float32)
    pred_betas = np.asarray(pred_betas, np.float32)
    T = pred_betas.shape[0]
    pshape = pred_pose.shape
    if pred_pose.shape[-1] == 72:
        qtype = "axisang"
        pose_seq = pred_pose.reshape(T, 24, 3)
    elif pred_pose.shape[-1] == 96:
        qtype = "quater"
        pose_seq = pred_pose.reshape(T, 24, 4)
    else:
        raise ValueError(f"Invalid pred_pose format: {pred_pose.shape}")

    pose_hat = filters.one_euro(
        jnp.asarray(pose_seq), min_cutoff=min_cutoff, beta=beta
    )

    if qtype == "axisang":
        pose_aa = pose_hat.reshape(T, 72)
    else:
        pose_aa = geometry.quat_to_axis_angle(
            pose_hat.reshape(-1, 4)
        ).reshape(T, 72)

    if smpl_params is None:
        smpl_params = body_smpl.synthetic_smpl_params()
    betas = jnp.broadcast_to(jnp.asarray(pred_betas[0]), (T, 10))
    joint_mode = "spin2"  # SMPL(kinectv2 flag) still emits spin2 joints
    out = body_smpl.smpl_forward_axis_angle(
        smpl_params, betas, pose_aa, joint_mode=joint_mode
    )
    verts = np.asarray(out["vertices"])
    joints3d = np.asarray(out["joints"])
    if kinectv2:
        joints3d = joints_mod.convert_kps(joints3d, src="spin2", dst="kinectv2")
    return verts, np.asarray(pose_hat).reshape(pshape), joints3d
