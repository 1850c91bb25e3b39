"""Pose-estimation evaluation metrics: MPJPE, PA-MPJPE, PVE, acceleration.

The reference only *prints* a checkpoint's stored 3DPW score
(/root/reference/lib/utils/utils.py:123); a complete framework needs the
metrics themselves. Conventions follow the 3DPW/SPIN evaluation protocol.
All metrics are batched jax.numpy (jit-able) and return per-sample values
in the input units (use meters -> multiply by 1000 for mm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array
HI = jax.lax.Precision.HIGHEST


def mpjpe(pred: Array, gt: Array, pelvis_idx=None) -> Array:
    """Mean per-joint position error, (B,J,3) -> (B,).

    pelvis_idx: joint index (or pair) to root-align both skeletons first.
    """
    if pelvis_idx is not None:
        idx = jnp.atleast_1d(jnp.asarray(pelvis_idx))
        pred = pred - pred[:, idx].mean(axis=1, keepdims=True)
        gt = gt - gt[:, idx].mean(axis=1, keepdims=True)
    return jnp.linalg.norm(pred - gt, axis=-1).mean(axis=-1)


def procrustes_align(pred: Array, gt: Array) -> Array:
    """Per-sample similarity (Procrustes) alignment of pred onto gt.

    pred/gt: (B, J, 3). Returns aligned pred. SVD-based, batched.
    """
    mu_p = pred.mean(axis=1, keepdims=True)
    mu_g = gt.mean(axis=1, keepdims=True)
    p = pred - mu_p
    g = gt - mu_g
    var_p = jnp.sum(p ** 2, axis=(1, 2), keepdims=False)
    K = jnp.einsum("bji,bjk->bik", g, p, precision=HI)  # (B,3,3)
    U, s, Vt = jnp.linalg.svd(K)
    # reflection fix
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", U, Vt))
    D = jnp.broadcast_to(jnp.eye(3), U.shape).at[:, 2, 2].set(det)
    R = jnp.einsum("bij,bjk,bkl->bil", U, D, Vt)
    scale = (s[:, :2].sum(-1) + s[:, 2] * det) / (var_p + 1e-12)
    aligned = scale[:, None, None] * jnp.einsum(
        "bij,bkj->bki", R, p, precision=HI) + mu_g
    return aligned


def pa_mpjpe(pred: Array, gt: Array) -> Array:
    """Procrustes-aligned MPJPE, (B,J,3) -> (B,)."""
    return jnp.linalg.norm(procrustes_align(pred, gt) - gt,
                           axis=-1).mean(axis=-1)


def pve(pred_verts: Array, gt_verts: Array) -> Array:
    """Per-vertex error (B,V,3) -> (B,)."""
    return jnp.linalg.norm(pred_verts - gt_verts, axis=-1).mean(axis=-1)


def accel_error(pred: Array, gt: Array, fps: float = 30.0) -> Array:
    """Acceleration error over a (T,J,3) sequence -> (T-2,) per frame
    (jitter metric used by VIBE-family papers)."""
    def accel(x):
        return (x[2:] - 2 * x[1:-1] + x[:-2]) * (fps ** 2)
    return jnp.linalg.norm(accel(pred) - accel(gt), axis=-1).mean(axis=-1)


def evaluate_batch(pred_joints: Array, gt_joints: Array,
                   pred_verts: Array = None, gt_verts: Array = None,
                   to_mm: float = 1000.0) -> dict:
    """Standard report dict (means over the batch, in mm)."""
    out = {
        "mpjpe": float(mpjpe(pred_joints, gt_joints).mean() * to_mm),
        "pa_mpjpe": float(pa_mpjpe(pred_joints, gt_joints).mean() * to_mm),
    }
    if pred_verts is not None and gt_verts is not None:
        out["pve"] = float(pve(pred_verts, gt_verts).mean() * to_mm)
    return out
