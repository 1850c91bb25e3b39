"""Pallas TPU kernel: fused keypoint-attention pooling.

The PARE head pools backbone features with part-attention maps twice per
frame (reference keypoint_attention.py:34-56, called at pare.py:258-259):
softmax over the 56x56 spatial axis of 24 part logits, then two
(24, HW) x (HW, C) matmuls for the 128-d pose features and 64-d
cam/shape features. XLA runs the softmax on the VPU with an HBM
round-trip of the (B, HW, 24) attention tensor before each matmul; this
kernel keeps the logits in VMEM, computes the softmax once, and feeds the
MXU with both pooling matmuls fused (features pre-concatenated on the
channel axis), one grid step per frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(hm_ref, feat_ref, out_ref):
    # hm: (1, J, HWp) logits (padding = -inf); feat: (1, HWp, Cp)
    logits = hm_ref[0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0] = jnp.dot(attn, feat_ref[0],
                         preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def keypoint_attention_fused(
    features: jax.Array,   # (B, H, W, C1) smpl features (128)
    cam_feats: jax.Array,  # (B, H, W, C2) cam/shape features (64)
    heatmaps: jax.Array,   # (B, H, W, J) raw part logits
    interpret: bool = False,
):
    """Returns (pooled_features (B, J, C1), pooled_cam (B, J, C2))."""
    b, h, w, c1 = features.shape
    c2 = cam_feats.shape[-1]
    j = heatmaps.shape[-1]
    hw = h * w
    hwp = -(-hw // 128) * 128
    jp = -(-j // 8) * 8
    cp = -(-(c1 + c2) // 128) * 128

    hm = heatmaps.reshape(b, hw, j).transpose(0, 2, 1)  # (B, J, HW)
    hm = jnp.pad(hm, ((0, 0), (0, jp - j), (0, hwp - hw)),
                 constant_values=NEG_INF)
    feat = jnp.concatenate([features.reshape(b, hw, c1),
                            cam_feats.reshape(b, hw, c2)], axis=-1)
    feat = jnp.pad(feat, ((0, 0), (0, hwp - hw), (0, cp - c1 - c2)))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, jp, cp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, jp, hwp), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hwp, cp), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, jp, cp), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * jp * hwp * cp + 4 * b * jp * hwp,
            bytes_accessed=4 * b * (jp * hwp + hwp * cp + jp * cp),
            transcendentals=b * jp * hwp,
        ),
        interpret=interpret,
    )(hm.astype(jnp.float32), feat.astype(jnp.float32))

    return out[:, :j, :c1], out[:, :j, c1 : c1 + c2]
