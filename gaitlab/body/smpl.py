"""SMPL body model: shape/pose blendshapes + LBS, TPU-first in pure JAX.

Re-design of the reference's smplx-backed SMPL wrapper
(/root/reference/lib/models/smpl.py).  Differences from the torch stack:

  * The model is a parameter pytree (`SMPLParams`) + pure functions: the
    whole forward (blendshapes -> kinematic chain -> skinning -> joint
    regression -> joint assembly) traces into one XLA program and is
    batched over frames.  No per-frame python, no nn.Module state.
  * All matmuls that feed the 0.5 mm MPJPE budget run with
    `precision=HIGHEST` (TPU matmul otherwise defaults to bf16).
  * Joint assembly modes mirror the reference exactly:
      - 'smpl24'  : the 24 kinematic-tree joints
      - 'smplx45' : 24 + 21 vertex-picked (smplx layout)
      - 'spin2'   : 29-joint clinical set (smpl.py:114-118): SMPL 24 +
                    L thumb/middle + R thumb/middle + MPII thorax
      - 'spin'    : 49-joint SPIN set via JOINT_MAP gather (smpl.py:103,121)

The reference's class flags `extra=True, kinectv2=True` (smpl.py:99-100)
make 'spin2' the deployed mode; `smooth_pose` flips kinectv2 off to get
'spin'.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gaitlab.core import geometry

Array = jax.Array
HI = jax.lax.Precision.HIGHEST

NUM_VERTS = 6890
NUM_JOINTS = 24
NUM_BETAS = 10

# Standard SMPL kinematic tree.
PARENTS: tuple = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
    19, 20, 21,
)

# smplx VertexJointSelector layout: face+feet, then hand tips -> joints 24..44.
EXTRA_VERTEX_IDS: tuple = (
    332, 6260, 2800, 4071, 583,            # 24 nose, 25 reye, 26 leye, 27 rear, 28 lear
    3216, 3226, 3387, 6617, 6624, 6787,    # 29-34 LBigToe..RHeel
    2746, 2319, 2445, 2556, 2673,          # 35-39 left thumb/index/middle/ring/pinky
    6191, 5782, 5905, 6016, 6133,          # 40-44 right thumb/index/middle/ring/pinky
)

# Reference smpl.py:16-36 JOINT_MAP indices into the 54-joint
# (45 smplx + 9 extra-regressor) stack, in smpl.py:37-87 JOINT_NAMES order.
SPIN49_GATHER: tuple = (
    24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34,                    # 0-24: OpenPose 25
    8, 5, 45, 46, 4, 7,                        # 25-30 R ankle/knee/hip, L hip/knee/ankle
    21, 19, 17, 16, 18, 20,                    # 31-36 arms
    47, 48, 49, 50, 51, 52, 53,                # 37-43 LSP/MPII/H36M extras
    24, 35, 40, 10, 11,                        # 44-48 nose, thumbs, feet
)

# spin2 (29-joint) assembly, reference smpl.py:114-118:
#   smplx joints[:24] ++ joints[[35,37]] ++ joints[[40,42]] ++ extra[5 (thorax)]
SPIN2_HAND_GATHER: tuple = (35, 37, 40, 42)
THORAX_EXTRA_ROW = 5  # JOINT_MAP['Thorax (MPII)'] - 45

H36M_TO_J17 = (6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9)
H36M_TO_J14 = H36M_TO_J17[:14]


class SMPLParams(NamedTuple):
    """SMPL model arrays (a jax pytree; all leaves are device arrays)."""

    v_template: Array        # (V, 3)
    shapedirs: Array         # (V, 3, 10)
    posedirs: Array          # (207, V*3)
    J_regressor: Array       # (24, V)
    lbs_weights: Array       # (V, 24)
    J_regressor_extra: Optional[Array] = None  # (9, V)
    faces: Optional[np.ndarray] = None          # (F, 3) host-side, static


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

class _ChumpyStubUnpickler(pickle.Unpickler):
    """Unpickle official SMPL .pkl files without chumpy installed."""

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChArray
        if module == "scipy.sparse.csc" or module == "scipy.sparse._csc":
            import scipy.sparse

            return scipy.sparse.csc_matrix
        return super().find_class(module, name)


class _ChArray:
    """Minimal chumpy.Ch stand-in: keeps the wrapped ndarray."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    def __array__(self):
        return np.asarray(self.__dict__.get("x"))


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_smpl_params(path: str, dtype=jnp.float32) -> SMPLParams:
    """Load official SMPL .pkl / .npz model files (or a synthetic pickle).

    `path` may be the file itself or a directory holding SMPL_NEUTRAL.pkl /
    smpl_model.pkl / SMPL_NEUTRAL.npz (mirrors the reference's
    SMPL_MODEL_DIR convention, lib/models/smpl.py:92).
    """
    if os.path.isdir(path):
        for cand in ("SMPL_NEUTRAL.pkl", "smpl_model.pkl", "SMPL_NEUTRAL.npz",
                     "basicmodel_neutral_lbs_10_207_0_v1.0.0.pkl"):
            p = os.path.join(path, cand)
            if os.path.isfile(p):
                path = p
                break
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            data = _ChumpyStubUnpickler(f, encoding="latin1").load()

    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"])[:, :, :NUM_BETAS].astype(np.float32)
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    if posedirs.shape[0] == NUM_VERTS:
        posedirs = posedirs.reshape(NUM_VERTS * 3, -1).T  # (207, V*3)
    J_regressor = _to_np(data["J_regressor"]).astype(np.float32)
    lbs_weights = _to_np(data["weights"] if "weights" in data else data["lbs_weights"]).astype(np.float32)
    faces = _to_np(data.get("f", data.get("faces"))).astype(np.int64)
    return SMPLParams(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(J_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        faces=faces,
    )


def with_extra_regressor(params: SMPLParams, path_or_array) -> SMPLParams:
    """Attach J_regressor_extra (reference smpl.py:90,104-105)."""
    if isinstance(path_or_array, str):
        arr = np.load(path_or_array)
    else:
        arr = np.asarray(path_or_array)
    return params._replace(J_regressor_extra=jnp.asarray(arr, jnp.float32))


def synthetic_smpl_params(seed: int = 0, with_extra: bool = True) -> SMPLParams:
    """Random-but-plausible params for tests/benchmarks (same layout/scale
    as tests/refutil.make_synthetic_smpl_data)."""
    rng = np.random.default_rng(seed)
    V, J = NUM_VERTS, NUM_JOINTS
    jr = rng.random(size=(J, V)) ** 8
    w = rng.random(size=(V, J)) ** 4
    p = SMPLParams(
        v_template=jnp.asarray(rng.normal(size=(V, 3)) * 0.3, jnp.float32),
        shapedirs=jnp.asarray(rng.normal(size=(V, 3, 10)) * 0.01, jnp.float32),
        posedirs=jnp.asarray((rng.normal(size=(V * 3, 207)) * 0.001).T, jnp.float32),
        J_regressor=jnp.asarray(jr / jr.sum(1, keepdims=True), jnp.float32),
        lbs_weights=jnp.asarray(w / w.sum(1, keepdims=True), jnp.float32),
        faces=rng.integers(0, V, size=(100, 3)).astype(np.int64),
    )
    if with_extra:
        rng2 = np.random.default_rng(seed + 100)
        jre = rng2.random(size=(9, V)) ** 8
        p = p._replace(
            J_regressor_extra=jnp.asarray(jre / jre.sum(1, keepdims=True), jnp.float32)
        )
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def vertices2joints(J_regressor: Array, vertices: Array) -> Array:
    """(J,V) x (B,V,3) -> (B,J,3), f32-accurate."""
    return jnp.einsum("jv,bvk->bjk", J_regressor, vertices, precision=HI)


def _rigid_transforms(rot_mats: Array, joints: Array) -> tuple[Array, Array]:
    """Forward-kinematics over the (static) SMPL tree.

    rot_mats: (B,24,3,3); joints: (B,24,3) rest-pose joint locations.
    Returns (posed_joints (B,24,3), rel_transforms (B,24,4,4)) where
    rel_transforms removes the rest pose (standard LBS `A` matrices).
    """
    B = rot_mats.shape[0]
    rel = joints.at[:, 1:].add(-joints[:, list(PARENTS[1:])])

    # Unrolled 24-step chain of 3x3 matmuls + translations; XLA fuses this
    # into a tiny fixed graph. Represent each global transform as (R, t).
    Rs = [rot_mats[:, 0]]
    ts = [rel[:, 0]]
    for j in range(1, NUM_JOINTS):
        p = PARENTS[j]
        Rp, tp = Rs[p], ts[p]
        Rs.append(jnp.einsum("bij,bjk->bik", Rp, rot_mats[:, j], precision=HI))
        ts.append(jnp.einsum("bij,bj->bi", Rp, rel[:, j], precision=HI) + tp)
    Rg = jnp.stack(Rs, axis=1)  # (B,24,3,3)
    tg = jnp.stack(ts, axis=1)  # (B,24,3)

    posed_joints = tg
    # A = G with translation corrected by -G_rot @ J_rest
    corr = tg - jnp.einsum("bjik,bjk->bji", Rg, joints, precision=HI)
    A = jnp.zeros((B, NUM_JOINTS, 4, 4), rot_mats.dtype)
    A = A.at[:, :, :3, :3].set(Rg)
    A = A.at[:, :, :3, 3].set(corr)
    A = A.at[:, :, 3, 3].set(1.0)
    return posed_joints, A


def lbs(
    params: SMPLParams, betas: Array, rot_mats: Array,
    use_pallas: bool = False,
) -> tuple[Array, Array]:
    """Core SMPL forward: (B,10) betas + (B,24,3,3) rotmats ->
    (verts (B,V,3), joints24 (B,24,3)).

    Mirrors smplx.lbs orchestrated at reference smpl.py:108-130 /
    SURVEY.md section 3.4, as batched einsums on the MXU. With
    `use_pallas` the two blendshape contractions + template add run as one
    fused Pallas kernel (gaitlab.ops.lbs_pallas) and the rest-pose joints
    come from the regressor folded through the shape blendshapes —
    v_shaped is never materialised.
    """
    B = betas.shape[0]
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B,207)

    if use_pallas:
        from gaitlab.ops import lbs_pallas

        v_posed = lbs_pallas.blendshapes(
            params.v_template, params.shapedirs, params.posedirs,
            betas, pose_feature)
        # J(beta) = Jr @ v_template + (Jr @ shapedirs) @ beta, tiny matmuls
        j0 = jnp.einsum("jv,vk->jk", params.J_regressor, params.v_template,
                        precision=HI)
        j_dirs = jnp.einsum("jv,vkl->jkl", params.J_regressor,
                            params.shapedirs, precision=HI)
        joints = j0[None] + jnp.einsum("bl,jkl->bjk", betas, j_dirs,
                                       precision=HI)
    else:
        v_shaped = params.v_template[None] + jnp.einsum(
            "bl,vkl->bvk", betas, params.shapedirs, precision=HI
        )
        joints = vertices2joints(params.J_regressor, v_shaped)
        v_posed = v_shaped + jnp.einsum(
            "bp,pn->bn", pose_feature, params.posedirs, precision=HI
        ).reshape(B, -1, 3)

    posed_joints, A = _rigid_transforms(rot_mats, joints)

    # Skinning: T = W @ A -> (B,V,4,4), applied to homogeneous v_posed.
    T = jnp.einsum("vj,bjik->bvik", params.lbs_weights, A, precision=HI)
    verts = (
        jnp.einsum("bvik,bvk->bvi", T[:, :, :3, :3], v_posed, precision=HI)
        + T[:, :, :3, 3]
    )
    return verts, posed_joints


def smpl_forward(
    params: SMPLParams,
    betas: Array,
    rot_mats: Array,
    joint_mode: str = "spin2",
) -> dict:
    """Full SMPL forward with the reference's joint assembly.

    rot_mats: (B,24,3,3) full pose (global orient at index 0).
    Returns {'vertices': (B,V,3), 'joints': (B,J,3)} with J per joint_mode.
    """
    verts, joints24 = lbs(params, betas, rot_mats)
    if joint_mode == "smpl24":
        joints = joints24
    else:
        extra_verts = verts[:, list(EXTRA_VERTEX_IDS)]  # (B,21,3)
        joints45 = jnp.concatenate([joints24, extra_verts], axis=1)
        if joint_mode == "smplx45":
            joints = joints45
        elif joint_mode == "spin2":
            assert params.J_regressor_extra is not None
            thorax = vertices2joints(
                params.J_regressor_extra[THORAX_EXTRA_ROW : THORAX_EXTRA_ROW + 1],
                verts,
            )
            hands = joints45[:, list(SPIN2_HAND_GATHER)]
            joints = jnp.concatenate([joints45[:, :24], hands, thorax], axis=1)
        elif joint_mode == "spin":
            assert params.J_regressor_extra is not None
            extra9 = vertices2joints(params.J_regressor_extra, verts)
            joints54 = jnp.concatenate([joints45, extra9], axis=1)
            joints = joints54[:, list(SPIN49_GATHER)]
        else:
            raise ValueError(f"unknown joint_mode: {joint_mode}")
    return {"vertices": verts, "joints": joints}


def smpl_forward_axis_angle(
    params: SMPLParams, betas: Array, pose_aa: Array, joint_mode: str = "spin2"
) -> dict:
    """Axis-angle entry: pose_aa (B,72) or (B,24,3)."""
    B = betas.shape[0]
    rot = geometry.axis_angle_to_rotmat(pose_aa.reshape(-1, 3)).reshape(B, 24, 3, 3)
    return smpl_forward(params, betas, rot, joint_mode)


# ---------------------------------------------------------------------------
# SMPLHead: SMPL + weak-perspective camera projection
# ---------------------------------------------------------------------------

def smpl_head(
    params: SMPLParams,
    rotmat: Array,
    shape: Array,
    cam: Optional[Array] = None,
    focal_length: float = 5000.0,
    img_res: int = 224,
    normalize_joints2d: bool = False,
    joint_mode: str = "spin2",
) -> dict:
    """Reference SMPLHead.forward (smpl.py:149-190): LBS + 2D projection.

    rotmat: (N,24,3,3); shape: (N,10); cam: (N,3) weak-perspective [s,tx,ty].
    """
    out = smpl_forward(params, shape, rotmat, joint_mode=joint_mode)
    result = {"smpl_vertices": out["vertices"], "smpl_joints3d": out["joints"]}
    if cam is not None:
        joints3d = out["joints"]
        B = joints3d.shape[0]
        cam_t = geometry.convert_weak_perspective_to_perspective(
            cam, focal_length=focal_length, img_res=img_res
        )
        eye = jnp.broadcast_to(jnp.eye(3, dtype=joints3d.dtype), (B, 3, 3))
        joints2d = geometry.perspective_projection(
            joints3d, eye, cam_t, focal_length, jnp.zeros((B, 2), joints3d.dtype)
        )
        if normalize_joints2d:
            joints2d = joints2d / (img_res / 2.0)
        result["smpl_joints2d"] = joints2d
    return result
