"""Temporal filters as JAX scan/conv kernels.

TPU-native re-design of the reference's sequential CPU filters:
  * 1-euro filter (/root/reference/lib/utils/one_euro_filter.py:5-46) — a
    strict per-frame recurrence; here a single `lax.scan` over the frame
    axis with all channels vectorized (the reference loops in Python).
  * 1-D median filter matching scipy.signal.medfilt (zero-padded) and
    gaussian filter matching scipy.ndimage.gaussian_filter1d (reflect
    boundary), used by bbox smoothing
    (/root/reference/lib/utils/smooth_bbox.py:118-133).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _smoothing_factor(t_e, cutoff):
    r = 2.0 * math.pi * cutoff * t_e
    return r / (r + 1.0)


@partial(jax.jit, static_argnames=("min_cutoff", "beta", "d_cutoff"))
def one_euro(
    x: Array,
    t: Array | None = None,
    min_cutoff: float = 1.0,
    beta: float = 0.0,
    d_cutoff: float = 1.0,
) -> Array:
    """1-euro filter over the leading (time) axis of `x`.

    Matches the reference recurrence (one_euro_filter.py:27-46) with
    x_prev = x[0], dx_prev = 0, t_prev = 0 — the exact initialisation of
    smooth_pose.py:53-58 (t0 = zeros, x0 = first frame). `t` defaults to
    frame index, i.e. dt = 1 between frames.

    x: (T, ...) signal. Returns the filtered (T, ...) signal with
    out[0] == x[0].
    """
    x = jnp.asarray(x)
    if t is None:
        t = jnp.arange(x.shape[0], dtype=x.dtype)
    t = jnp.broadcast_to(t.reshape((x.shape[0],) + (1,) * (x.ndim - 1)), x.shape)

    def step(carry, inp):
        x_prev, dx_prev, t_prev = carry
        xi, ti = inp
        t_e = ti - t_prev
        a_d = _smoothing_factor(t_e, d_cutoff)
        dx = (xi - x_prev) / t_e
        dx_hat = a_d * dx + (1.0 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = _smoothing_factor(t_e, cutoff)
        x_hat = a * xi + (1.0 - a) * x_prev
        return (x_hat, dx_hat, ti), x_hat

    init = (x[0], jnp.zeros_like(x[0]), jnp.zeros_like(x[0]))
    _, out = jax.lax.scan(step, init, (x[1:], t[1:]))
    return jnp.concatenate([x[:1], out], axis=0)


@partial(jax.jit, static_argnames=("kernel_size",))
def median_filter1d(x: Array, kernel_size: int = 11) -> Array:
    """scipy.signal.medfilt semantics along axis 0 (zero padding).

    x: (T,) or (T, C). Kernel size must be odd.
    """
    if kernel_size % 2 == 0:
        raise ValueError("kernel_size must be odd")
    half = kernel_size // 2
    pad = [(half, half)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad)  # zeros, like scipy.signal.medfilt
    windows = jnp.stack([xp[i : i + x.shape[0]] for i in range(kernel_size)], axis=0)
    return jnp.median(windows, axis=0)


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    radius = int(truncate * float(sigma) + 0.5)
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float64)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(jnp.float32)


def gaussian_filter1d(x: Array, sigma: float = 8.0, truncate: float = 4.0) -> Array:
    """scipy.ndimage.gaussian_filter1d semantics along axis 0 (reflect
    boundary).  x: (T,) or (T, C)."""
    k = _gaussian_kernel(sigma, truncate)
    radius = (k.shape[0] - 1) // 2
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    # scipy.ndimage "reflect" == numpy "symmetric" (edge sample repeated).
    xp = jnp.pad(x.astype(jnp.float32), [(radius, radius), (0, 0)], mode="symmetric")
    # Correlate: one conv per channel batch via dot with unfolded windows.
    out = jnp.stack(
        [xp[i : i + x.shape[0]] * k[i] for i in range(k.shape[0])], axis=0
    ).sum(axis=0)
    return out[:, 0] if squeeze else out


def smooth_bbox_params(bbox_params, kernel_size: int = 11, sigma: float = 8):
    """Median + gaussian filtering of (N, 3|4) bbox params
    (smooth_bbox.py:118-133)."""
    import numpy as np

    x = jnp.asarray(np.asarray(bbox_params, np.float32))
    # scipy.medfilt shrinks nothing; kernel may exceed N (zero pad) — match.
    sm = median_filter1d(x, kernel_size)
    return np.asarray(gaussian_filter1d(sm, sigma))
