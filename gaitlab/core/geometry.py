"""Rotation representations and camera models in pure JAX.

Functional equivalents of the reference's torch geometry stack
(/root/reference/lib/utils/geometry.py): axis-angle <-> quaternion <->
rotation-matrix <-> 6D conversions, weak/full perspective cameras, and
translation estimation.  All functions are batched, jit-safe, and operate
on the *leading* batch dimension (no data-dependent shapes), so they fuse
cleanly into the surrounding XLA programs.

Conventions match the reference exactly where numerics matter for parity:
  * quaternions are (w, x, y, z)
  * `rot6d_to_rotmat` uses eps=1e-6 max-clamped normalisation
    (geometry.py:395-410), `rot6d_to_rotmat_spin` the F.normalize default
    eps=1e-12 (geometry.py:368-387)
  * `rotmat_to_axis_angle` zeroes NaNs (geometry.py:96)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# quaternions
# ---------------------------------------------------------------------------

def quat_to_rotmat(quat: Array) -> Array:
    """(N,4) wxyz quaternion -> (N,3,3). Ref geometry.py:38-65 (quat2mat)."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def axis_angle_to_quat(axisang: Array) -> Array:
    """(N,3) axis-angle -> (N,4) wxyz unit quaternion.

    Matches the reference's eps placement: the norm is taken of
    (axisang + 1e-8), and the *un-shifted* vector is divided by it
    (geometry.py:23-32, 142-157).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_to_axis_angle(quaternion: Array) -> Array:
    """(...,4) wxyz quaternion -> (...,3) axis-angle. Ref geometry.py:159-210."""
    q1, q2, q3 = quaternion[..., 1], quaternion[..., 2], quaternion[..., 3]
    sin_sq = q1 * q1 + q2 * q2 + q3 * q3
    sin_theta = jnp.sqrt(sin_sq)
    cos_theta = quaternion[..., 0]
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    # where() both-branch evaluation: guard the division against 0/0.
    k_pos = two_theta / jnp.where(sin_theta > 0.0, sin_theta, 1.0)
    k = jnp.where(sin_sq > 0.0, k_pos, 2.0 * jnp.ones_like(sin_theta))
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def qrot(q: Array, v: Array) -> Array:
    """Rotate vectors v (*,3) by quaternions q (*,4). Ref geometry.py:99-119."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qmul(q: Array, r: Array) -> Array:
    """Quaternion product q*r, both (*,4) wxyz. Ref geometry.py:121-140."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qfix(q: Array) -> Array:
    """Enforce quaternion sign-continuity along axis 0. Ref geometry.py:481-499.

    q: (L, J, 4). The reference uses a cumulative parity of sign flips; the
    `lax.scan`-free cumsum formulation is identical.
    """
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)  # (L-1, J)
    flip = (jnp.cumsum((dots < 0).astype(jnp.int32), axis=0) % 2).astype(bool)
    sign = jnp.where(flip, -1.0, 1.0)[..., None]
    return jnp.concatenate([q[:1], q[1:] * sign], axis=0)


# ---------------------------------------------------------------------------
# axis-angle / rotation matrices
# ---------------------------------------------------------------------------

def axis_angle_to_rotmat(axisang: Array) -> Array:
    """Batch Rodrigues (N,3) -> (N,3,3) via quaternion. Ref geometry.py:23-35."""
    return quat_to_rotmat(axis_angle_to_quat(axisang))


# Backwards-friendly alias mirroring the reference's name.
batch_rodrigues = axis_angle_to_rotmat


def rotmat_to_quat(rotmat: Array, eps: float = 1e-6) -> Array:
    """(N,3,3) (or (N,3,4)) -> (N,4) wxyz. Ref geometry.py:213-293.

    Branch-free reimplementation of the 4-case Shepperd-style selection.
    """
    r = rotmat[..., :3, :3]
    rt = jnp.swapaxes(r, -1, -2)
    m = lambda i, j: rt[..., i, j]

    mask_d2 = m(2, 2) < eps
    mask_d0_d1 = m(0, 0) > m(1, 1)
    mask_d0_nd1 = m(0, 0) < -m(1, 1)

    t0 = 1 + m(0, 0) - m(1, 1) - m(2, 2)
    q0 = jnp.stack([m(1, 2) - m(2, 1), t0, m(0, 1) + m(1, 0), m(2, 0) + m(0, 2)], -1)
    t1 = 1 - m(0, 0) + m(1, 1) - m(2, 2)
    q1 = jnp.stack([m(2, 0) - m(0, 2), m(0, 1) + m(1, 0), t1, m(1, 2) + m(2, 1)], -1)
    t2 = 1 - m(0, 0) - m(1, 1) + m(2, 2)
    q2 = jnp.stack([m(0, 1) - m(1, 0), m(2, 0) + m(0, 2), m(1, 2) + m(2, 1), t2], -1)
    t3 = 1 + m(0, 0) + m(1, 1) + m(2, 2)
    q3 = jnp.stack([t3, m(1, 2) - m(2, 1), m(2, 0) - m(0, 2), m(0, 1) - m(1, 0)], -1)

    c0 = (mask_d2 & mask_d0_d1)[..., None]
    c1 = (mask_d2 & ~mask_d0_d1)[..., None]
    c2 = (~mask_d2 & mask_d0_nd1)[..., None]
    c3 = (~mask_d2 & ~mask_d0_nd1)[..., None]

    q = jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))
    t = jnp.where(
        c0[..., 0], t0, jnp.where(c1[..., 0], t1, jnp.where(c2[..., 0], t2, t3))
    )
    return q * (0.5 / jnp.sqrt(t))[..., None]


def rotmat_to_axis_angle(rotmat: Array) -> Array:
    """(N,3,3) -> (N,3) axis-angle, NaNs zeroed. Ref geometry.py:68-97."""
    aa = quat_to_axis_angle(rotmat_to_quat(rotmat))
    return jnp.where(jnp.isnan(aa), 0.0, aa)


def rot6d_to_rotmat(x: Array) -> Array:
    """(N,6) continuous 6D rep -> (N,3,3). Ref geometry.py:395-410.

    Gram-Schmidt with eps=1e-6 clamped norms (exactly F.normalize(eps=1e-6)).
    """
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[..., 0], x[..., 1]
    b1 = _normalize(a1, eps=1e-6)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _normalize(a2 - dot * b1, eps=1e-6)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rot6d_to_rotmat_spin(x: Array) -> Array:
    """SPIN variant with default-eps normalisation. Ref geometry.py:368-387."""
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[..., 0], x[..., 1]
    b1 = _normalize(a1)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _normalize(a2 - dot * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(x: Array) -> Array:
    """(N,3,3) -> (N,3,2) first two columns. Ref geometry.py:389-393."""
    x = x.reshape(-1, 3, 3)
    return jnp.stack([x[..., 0], x[..., 1]], axis=-1)


# ---------------------------------------------------------------------------
# cameras
# ---------------------------------------------------------------------------

def convert_weak_perspective_to_perspective(
    weak_cam: Array, focal_length: float = 5000.0, img_res: int = 224
) -> Array:
    """[s, tx, ty] -> [tx, ty, tz] translation. Ref geometry.py:427-446."""
    return jnp.stack(
        [
            weak_cam[..., 1],
            weak_cam[..., 2],
            2.0 * focal_length / (img_res * weak_cam[..., 0] + 1e-9),
        ],
        axis=-1,
    )


def perspective_projection(
    points: Array,
    rotation: Array,
    translation: Array,
    focal_length,
    camera_center: Array,
) -> Array:
    """Project (B,N,3) points with K=[[f,0,cx],[0,f,cy],[0,0,1]].

    Ref geometry.py:448-479.  Returns (B,N,2) pixel coordinates.
    """
    points = jnp.einsum("bij,bkj->bki", rotation, points)
    points = points + translation[:, None, :]
    projected = points / points[..., 2:3]
    f = jnp.broadcast_to(jnp.asarray(focal_length, points.dtype), points.shape[:1])
    xy = projected[..., :2] * f[:, None, None] + camera_center[:, None, :]
    return xy


def projection(pred_joints: Array, pred_camera: Array) -> Array:
    """Weak-perspective joints -> [-1,1]-normalised 2D. Ref geometry.py:412-425."""
    batch = pred_joints.shape[0]
    cam_t = convert_weak_perspective_to_perspective(pred_camera)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pred_joints.dtype), (batch, 3, 3))
    kp2d = perspective_projection(
        pred_joints, eye, cam_t, 5000.0, jnp.zeros((batch, 2), pred_joints.dtype)
    )
    return kp2d / (224.0 / 2.0)


def estimate_translation_single(
    S: Array,
    joints_2d: Array,
    joints_conf: Array,
    focal_length: float = 5000.0,
    img_size: float = 224.0,
) -> Array:
    """Weighted least-squares camera translation for one frame.

    S: (K,3) 3D joints; joints_2d: (K,2); joints_conf: (K,).
    Ref geometry.py:296-337 (estimate_translation_np), vectorised: the
    normal equations are assembled directly instead of via a (2K,3) stack.
    """
    f = jnp.asarray([focal_length, focal_length], S.dtype)
    center = jnp.asarray([img_size / 2.0, img_size / 2.0], S.dtype)

    num_joints = S.shape[0]
    Z = jnp.repeat(S[:, 2], 2)
    XY = S[:, :2].reshape(-1)
    O = jnp.tile(center, num_joints)
    F = jnp.tile(f, num_joints)
    weight2 = jnp.repeat(jnp.sqrt(joints_conf), 2)

    j2d_flat = joints_2d.reshape(-1)
    Q = jnp.stack(
        [
            F * jnp.tile(jnp.asarray([1.0, 0.0], S.dtype), num_joints),
            F * jnp.tile(jnp.asarray([0.0, 1.0], S.dtype), num_joints),
            O - j2d_flat,
        ],
        axis=-1,
    )
    c = (j2d_flat - O) * Z - F * XY
    Qw = Q * weight2[:, None]
    cw = c * weight2
    A = Qw.T @ Qw
    b = Qw.T @ cw
    return jnp.linalg.solve(A, b)


def estimate_translation(
    S: Array, joints_2d: Array, focal_length: float = 5000.0, img_size: float = 224.0
) -> Array:
    """Batched translation fit over GT joints 25: of the 49-joint spin set.

    Ref geometry.py:340-365.  S: (B,49,3); joints_2d: (B,49,3) with
    confidence in the last channel.
    """
    S_gt = S[:, 25:, :]
    j2d = joints_2d[:, 25:, :2]
    conf = joints_2d[:, 25:, 2]
    return jax.vmap(
        lambda s, j, c: estimate_translation_single(s, j, c, focal_length, img_size)
    )(S_gt, j2d, conf)
