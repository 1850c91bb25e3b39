"""2-stage pipeline parallelism for GRNet inference (SURVEY section 2C,
last row).

The reference has no distributed execution at all; this is the TPU-native
capability the reference never had. Stage 0 (the HRNet backbone,
images -> (N, S, S, 480) features) and stage 1 (the PARE head + SMPL
regression, features -> verts/joints/theta) run on DISJOINT device
groups, each internally data-parallel over its own 1-D ("data",) mesh.
Microbatches stream through GPipe-style: JAX's async dispatch enqueues
stage 0 of microbatch t+1 before stage 1 of microbatch t, and because the
two stages occupy different chips they execute concurrently — the host
loop below is the schedule. Boundary activations cross the group gap once
per microbatch via `jax.device_put` (a resharding copy: ICI on a real TPU
slice, memcpy on the virtual CPU mesh the tests use).

When to use which (measured, docs/PERFORMANCE.md "Scaling"): for this
model family inference DP dominates PP — DP moves ZERO inter-chip bytes
and multiplies throughput linearly, while a 2-stage split ships ~3.0
MB/frame of boundary activations (bf16) as pure overhead. PP pays only
when (a) stage weights exceed a single chip's HBM (GRNet: 250 MB of
16 GB), or (b) batch-1 latency must shrink below one chip's forward pass.
`GRNetPipeline` exists so the framework HAS the capability for the regime
where it wins; the production runner (`pipeline/runner.py`) uses DP.

The split point mirrors `nn/grnet.py::GRNetCore.__call__`
(reference: lib/models/grnet.py:139-153) — backbone features are the only
tensor that crosses the stage boundary, exactly the activation the
closure analysis costed.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaitlab.parallel.mesh import DATA_AXIS

__all__ = ["split_variables", "GRNetPipeline"]


def split_variables(variables: Any) -> tuple[Any, Any]:
    """Split a GRNetCore variable tree into (backbone-only, rest).

    Each output keeps the collection structure ({'params': ...,
    'batch_stats': ...}) but holds only its stage's subtrees, so each
    stage's device group stores only its own weights — the point of
    pipeline parallelism. Flax resolves submodule scopes lazily, so
    applying `module` with a backbone-only tree is fine as long as the
    method touches nothing else.
    """
    stage0, stage1 = {}, {}
    for coll, tree in variables.items():
        s0 = {k: v for k, v in tree.items() if k == "backbone"}
        s1 = {k: v for k, v in tree.items() if k != "backbone"}
        if s0:
            stage0[coll] = s0
        if s1:
            stage1[coll] = s1
    return stage0, stage1


def _run_backbone(module, images):
    # Mirrors GRNetCore.__call__'s first line (frozen-BN inference).
    return module.backbone(images, train=False)


def _run_head(module, features):
    with module._head_prec():
        return module.head(features)


class GRNetPipeline:
    """GPipe-style 2-stage inference pipeline over disjoint device groups.

    Parameters
    ----------
    model : GRNet
        Bundled trunk + variables + SMPL (gait branch unsupported: it is
        track-sequential and belongs to the track-level pass, not the
        per-frame trunk this pipeline parallelises).
    devices : devices to split (default: all). First `n_stage0` run the
        backbone, the rest run the head+SMPL stage.
    n_stage0 : size of the backbone group (default: half). The backbone
        is ~5x the head's FLOPs at the deployed sizes, so a balanced
        wall-clock split wants most chips on stage 0; the default is even
        for simplicity and the constructor accepts any split.
    """

    def __init__(
        self,
        model,
        devices: Optional[Sequence[jax.Device]] = None,
        n_stage0: Optional[int] = None,
    ):
        if model.module.use_gait_feat:
            raise ValueError(
                "GRNetPipeline parallelises the per-frame trunk; the gait "
                "branch is track-sequential — run it with the DP runner")
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < 2:
            raise ValueError(f"need >= 2 devices, have {len(devices)}")
        if n_stage0 is None:
            n_stage0 = len(devices) // 2
        if not 0 < n_stage0 < len(devices):
            raise ValueError(f"n_stage0={n_stage0} of {len(devices)}")
        self.model = model
        self.mesh0 = Mesh(np.asarray(devices[:n_stage0]), (DATA_AXIS,))
        self.mesh1 = Mesh(np.asarray(devices[n_stage0:]), (DATA_AXIS,))
        self._dp0 = n_stage0
        self._dp1 = len(devices) - n_stage0

        vars0, vars1 = split_variables(model.variables)
        rep0 = NamedSharding(self.mesh0, P())
        rep1 = NamedSharding(self.mesh1, P())
        # Each group holds ONLY its stage's weights, replicated within the
        # group (DP inside a stage). device_put with an explicit target —
        # a bare device_put is a no-op for existing jax.Arrays (CLAUDE.md).
        self._vars0 = jax.device_put(vars0, rep0)
        self._vars1 = jax.device_put(vars1, rep1)
        self._smpl = jax.device_put(model.smpl, rep1)

        batch0 = NamedSharding(self.mesh0, P(DATA_AXIS))
        batch1 = NamedSharding(self.mesh1, P(DATA_AXIS))
        self._boundary = batch1  # features re-shard onto group 1
        module = model.module
        joint_mode = model.joint_mode

        def stage0(variables, images):
            return module.apply(variables, images, method=_run_backbone)

        def stage1(variables, smpl, features):
            from gaitlab.nn.grnet import vp_regress

            patt = module.apply(variables, features, method=_run_head)
            out = vp_regress(smpl, patt, batch_size=1,
                             joint_mode=joint_mode)[0]
            # drop vp_regress's leading track dim (1, mb, ...) -> (mb, ...)
            # so microbatches splice along the frame axis
            return jax.tree_util.tree_map(lambda x: x[0], out)

        self._stage0 = jax.jit(
            stage0, in_shardings=(rep0, batch0), out_shardings=batch0)
        self._stage1 = jax.jit(
            stage1, in_shardings=(rep1, rep1, batch1))

    def default_microbatch(self, n: int, target: int = 32) -> int:
        """Smallest valid microbatch >= min(target, n).

        A microbatch must divide by BOTH stage group sizes (each stage is
        internally data-parallel), i.e. be a multiple of lcm(dp0, dp1).
        Picks the first multiple at or above `target` (capped so a short
        clip doesn't get one giant padded tick). Exposed so callers never
        have to reason about group sizes; __call__ uses it when
        `microbatch` is omitted.
        """
        base = int(np.lcm(self._dp0, self._dp1))
        want = max(1, min(target, n if n > 0 else target))
        return base * max(1, -(-want // base))

    def __call__(self, crops_nhwc, microbatch: Optional[int] = None) -> dict:
        """Run N crops through the 2-stage pipeline.

        `microbatch` is the per-tick batch (pad-to-static: the tail
        microbatch is zero-padded and the padding sliced off at the end,
        the same static-shape discipline as the bucketed runner); when
        omitted, a valid size is chosen automatically
        (`default_microbatch`). Returns the vp_regress batch-element dict
        in `GRNet.forward`'s layout: every value shaped (1, N, ...) — one
        track of N frames.
        """
        crops = jnp.asarray(crops_nhwc)
        n = crops.shape[0]
        if n == 0:
            raise ValueError("GRNetPipeline needs at least one frame")
        if microbatch is None:
            microbatch = self.default_microbatch(n)
        if microbatch % self._dp0 or microbatch % self._dp1:
            raise ValueError(
                f"microbatch={microbatch} must divide by both stage "
                f"groups ({self._dp0}, {self._dp1}); "
                f"default_microbatch() picks one")
        n_mb = -(-n // microbatch)
        pad = n_mb * microbatch - n
        if pad:
            crops = jnp.concatenate(
                [crops, jnp.zeros((pad,) + crops.shape[1:], crops.dtype)])

        # The schedule: enqueue stage0(t) then stage1(t-1); async dispatch
        # keeps both groups busy at once (1-deep pipeline, 2 stages).
        outs, prev = [], None
        for t in range(n_mb):
            mb = crops[t * microbatch:(t + 1) * microbatch]
            feats = self._stage0(self._vars0, mb)
            if prev is not None:
                outs.append(self._stage1(self._vars1, self._smpl, prev))
            prev = jax.device_put(feats, self._boundary)
        outs.append(self._stage1(self._vars1, self._smpl, prev))

        merged = {
            k: np.concatenate([np.asarray(o[k]) for o in outs])
            for k in outs[0]
        }
        return {k: v[:n][None] for k, v in merged.items()}
