"""Pallas TPU kernel: fused SMPL blendshapes.

The SMPL forward (SURVEY.md §3.4, reference smplx orchestration at
lib/models/smpl.py:108-130) spends its vertex-path FLOPs in

    v_posed = v_template + shapedirs @ beta + posedirs^T @ pose_feature

— two skinny matmuls (contractions of 10 and 207) plus an add over the
(6890*3)-long vertex axis. Left to XLA these become separate HLOs with an
intermediate (B, 6890, 3) round-trip through HBM; this kernel computes the
whole expression in one pass per vertex tile: both contractions hit the
MXU as (TILE, 10|207) x (10|207, B) matmuls and the template add rides
along in VMEM, with a single HBM write of the result.

Layout: vertices are processed flattened to (V*3,) rows; the batch lives
on the lane (last) dimension, padded to a multiple of 128.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # vertex-row tile (V*3 = 20670 rows for SMPL)


def _kernel(vt_ref, sh_ref, po_ref, beta_ref, pose_ref, out_ref):
    acc = jnp.dot(sh_ref[:], beta_ref[:], preferred_element_type=jnp.float32)
    acc += jnp.dot(po_ref[:], pose_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc + vt_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def blendshapes(
    v_template: jax.Array,   # (V, 3)
    shapedirs: jax.Array,    # (V, 3, S)
    posedirs: jax.Array,     # (P, V*3)  (smplx layout)
    betas: jax.Array,        # (B, S)
    pose_feature: jax.Array, # (B, P)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused v_template + shapedirs.beta + posedirs.pose -> (B, V, 3).

    interpret=None auto-selects interpret mode on the CPU backend (Pallas
    only compiles natively for TPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    v = v_template.shape[0]
    b = betas.shape[0]
    s = shapedirs.shape[-1]
    p = posedirs.shape[0]

    rows = v * 3
    rows_pad = -(-rows // TILE) * TILE
    b_pad = -(-b // 128) * 128

    sh2d = jnp.pad(shapedirs.reshape(rows, s), ((0, rows_pad - rows), (0, 0)))
    po2d = jnp.pad(posedirs.T.reshape(rows, p), ((0, rows_pad - rows), (0, 0)))
    vt = jnp.pad(v_template.reshape(rows, 1), ((0, rows_pad - rows), (0, 0)))
    betas_t = jnp.pad(betas.T, ((0, 0), (0, b_pad - b)))        # (S, Bp)
    pose_t = jnp.pad(pose_feature.T, ((0, 0), (0, b_pad - b)))  # (P, Bp)

    grid = (rows_pad // TILE,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, b_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, s), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, p), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s, b_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, b_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, b_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * b_pad * (s + p) + rows_pad * b_pad,
            bytes_accessed=4 * (rows_pad * (s + p + 1)
                                + b_pad * (s + p) + rows_pad * b_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(vt.astype(jnp.float32), sh2d.astype(jnp.float32),
      po2d.astype(jnp.float32), betas_t.astype(jnp.float32),
      pose_t.astype(jnp.float32))

    return out[:rows, :b].T.reshape(b, v, 3)


def blendshapes_reference(v_template, shapedirs, posedirs, betas,
                          pose_feature):
    """Plain-XLA expression, for parity tests and as the fallback path."""
    v = v_template.shape[0]
    b = betas.shape[0]
    shaped = jnp.einsum("vds,bs->bvd", shapedirs, betas,
                        precision=jax.lax.Precision.HIGHEST)
    posed = jnp.einsum("pr,bp->br", posedirs, pose_feature,
                       precision=jax.lax.Precision.HIGHEST).reshape(b, v, 3)
    return v_template[None] + shaped + posed
