"""Bbox-from-OpenPose-joints via exact 1-medoid (Rust kmedoids replacement).

The reference calls the Rust `kmedoids.fasterpam` package with k=1 over all
2D joints of a clip (/root/reference/batch_generation.py:39-95). For k=1
the medoid is simply argmin_i sum_j ||p_i - p_j|| — an exact O(N^2)
reduction that runs as one jitted TPU program (chunked so the distance
matrix never materialises for long clips), no native dependency needed.

Reference quirks kept for parity (batch_generation.py:64-74):
  * clustering runs over (x, y, confidence) triples — the confidence
    column participates in the distance;
  * low-confidence joints are replaced by each frame's most-confident
    joint before clustering;
  * bbox size = 1.1 * median height, upscaled by BS=1.8 below MIN_PIXEL.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IMG_W = 1920          # batch_generation.py:25-26
IMG_H = 1080
MIN_PIXEL = 500       # :27
BS = 1.8              # :28
N_JOINTS = 25         # :29


@partial(jax.jit, static_argnames=("chunk",))
def medoid_1(points: jax.Array, chunk: int = 1024) -> jax.Array:
    """Index of the exact 1-medoid of (N, D) points (sum of euclidean
    distances, like kmedoids.fasterpam with k=1)."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((n,), points.dtype), (0, pad))

    def body(carry, block):
        blk_pts, blk_valid = block
        d = jnp.sqrt(jnp.maximum(
            jnp.sum((pts[:, None, :] - blk_pts[None, :, :]) ** 2, -1), 0.0))
        return carry + (d * blk_valid[None, :]).sum(axis=1), None

    blocks = (pts.reshape(-1, chunk, pts.shape[1]),
              valid.reshape(-1, chunk))
    sums, _ = jax.lax.scan(body, jnp.zeros((pts.shape[0],), points.dtype),
                           blocks)
    sums = jnp.where(valid > 0, sums, jnp.inf)
    return jnp.argmin(sums)


def get_bbox_from_joints2d(kp_2d: np.ndarray, smooth: bool = False,
                           threshold: float = 0.1) -> np.ndarray:
    """(seqlen, 25, 3) OpenPose joints -> (seqlen, 4) constant square bbox
    (batch_generation.py:39-95)."""
    assert kp_2d.ndim == 3 and kp_2d.shape[-2] == N_JOINTS
    seqlen = kp_2d.shape[0]
    kp_2d = np.array(kp_2d, np.float32)

    # replace low-confidence joints with each frame's most-confident joint
    invalid = kp_2d[:, :, 2] < threshold
    best = np.argmax(kp_2d[:, :, 2], axis=-1)
    ref = kp_2d[np.arange(seqlen)[:, None],
                np.broadcast_to(best[:, None], (seqlen, N_JOINTS))]
    kp_2d[invalid] = ref[invalid]

    ul = np.array([kp_2d[:, :, 0].min(axis=1), kp_2d[:, :, 1].min(axis=1)])
    lr = np.array([kp_2d[:, :, 0].max(axis=1), kp_2d[:, :, 1].max(axis=1)])
    ul[1] -= (lr[1] - ul[1]) * 0.10  # prevent cutting the head
    h = lr[1] - ul[1]

    kp = kp_2d.reshape(-1, 3).astype(np.float32)
    c_idx = int(medoid_1(jnp.asarray(kp)))
    c_xy = kp[c_idx, :2]

    nh = np.median(h, keepdims=True)
    nw = nh = nh * 1.1  # square, keep aspect
    if nw < MIN_PIXEL:
        nw = nh = nh * BS
    bbox = np.repeat(np.hstack([c_xy, nw, nh])[None, :], seqlen, axis=0)
    if smooth:
        from gaitlab.core.filters import smooth_bbox_params

        bbox = smooth_bbox_params(bbox)
    return bbox
