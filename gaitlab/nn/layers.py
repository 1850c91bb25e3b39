"""Shared NN building blocks (Flax linen, NHWC, inference-ready BatchNorm).

Naming convention: submodule names mirror the reference torch module paths
('conv1', 'bn1', sequential indices '0','1',...) so that checkpoint import
(gaitlab/weights/torch_import.py) is a mechanical path translation.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

BN_EPS = 1e-5  # torch BatchNorm2d default


def conv(features: int, kernel: int, stride: int = 1, padding: int | None = None,
         use_bias: bool = False, name: str | None = None) -> nn.Conv:
    if padding is None:
        padding = (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        name=name,
    )


def batch_norm(train: bool, name: str | None = None) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        epsilon=BN_EPS,
        momentum=0.9,  # torch momentum 0.1 == flax momentum 0.9
        name=name,
    )


def upsample_nearest(x: Array, scale: int) -> Array:
    """NHWC nearest-neighbour x scale (torch nn.Upsample mode='nearest')."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def _align_corners_matrix(n_in: int, n_out: int, dtype) -> Array:
    """(n_out, n_in) bilinear interpolation matrix with align_corners=True.

    Expressing the resize as two small matmuls keeps it on the MXU and gives
    bit-faithful torch `align_corners=True` semantics, which
    jax.image.resize (half-pixel centers) does not.
    """
    if n_out == 1:
        w = jnp.zeros((1, n_in), dtype).at[0, 0].set(1.0)
        return w
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    frac = pos - lo.astype(jnp.float32)
    w = jnp.zeros((n_out, n_in), jnp.float32)
    w = w.at[jnp.arange(n_out), lo].add(1.0 - frac)
    w = w.at[jnp.arange(n_out), hi].add(frac)
    return w.astype(dtype)


def upsample_bilinear_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """NHWC bilinear resize matching torch align_corners=True."""
    n, h, w, c = x.shape
    Wh = _align_corners_matrix(h, out_h, x.dtype)
    Ww = _align_corners_matrix(w, out_w, x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", Wh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,nhwc->nhoc", Ww, x, precision=jax.lax.Precision.HIGHEST)
    return x


class LocallyConnected(nn.Module):
    """Per-token unshared 1x1 'conv' (reference LocallyConnected2d,
    lib/models/layers/locallyconnected2d.py:22-49).

    Operates on (B, J, C_in) token-major features; weight (J, C_in, C_out).
    The torch layout is (1, out, in, J, 1, 1) — the importer transposes.
    """

    num_tokens: int
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        j, c = x.shape[-2], x.shape[-1]
        assert j == self.num_tokens, (j, self.num_tokens)
        w = self.param(
            "weight",
            nn.initializers.normal(1.0),
            (self.num_tokens, c, self.features),
        )
        out = jnp.einsum("...jc,jco->...jo", x, w,
                         precision=jax.lax.Precision.HIGHEST)
        if self.use_bias:
            b = self.param("bias", nn.initializers.normal(1.0),
                           (self.num_tokens, self.features))
            out = out + b
        return out


def keypoint_attention(features: Array, heatmaps: Array, act: str = "softmax",
                       use_scale: bool = False) -> Array:
    """Attention pooling (reference keypoint_attention.py:34-56).

    features: (B, H, W, C); heatmaps: (B, H, W, J) raw part logits.
    Returns (B, J, C) pooled per-part features.
    """
    b, h, w, c = features.shape
    j = heatmaps.shape[-1]
    hm = heatmaps.reshape(b, h * w, j)
    if use_scale:
        hm = hm / jnp.sqrt(jnp.asarray(h * w, hm.dtype))
    if act == "softmax":
        attn = jax.nn.softmax(hm, axis=1)
    elif act == "sigmoid":
        attn = jax.nn.sigmoid(hm)
    else:
        raise ValueError(act)
    feat = features.reshape(b, h * w, c)
    return jnp.einsum("bpj,bpc->bjc", attn, feat,
                      precision=jax.lax.Precision.HIGHEST)
