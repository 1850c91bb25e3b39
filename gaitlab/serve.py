"""Version-pinned serving artifacts via `jax.export` (StableHLO).

The reference deploys by shipping Python + a torch checkpoint and
re-tracing on every host (demo.py model build, :401-408). A TPU serving
fleet wants a compiler-level contract instead: this module lowers the
runner's jitted forward (crop -> backbone -> head -> SMPL -> projection,
one XLA program per batch bucket) to StableHLO, serializes it to bytes,
and reloads it WITHOUT the gaitlab model code — only the artifact plus
the weight arrays — so a deployment runs the exact pinned program no
matter how the Python model evolves. Artifacts are multi-platform
(default tpu+cpu): the same file serves a v5e pod and a CPU canary.

Contract: each artifact is `fwd(variables, smpl, images[, bbox, cimg,
n_valid])` at ONE static batch bucket, matching
`GRNetRunner._forward(n, raw_uint8)` (pipeline/runner.py:95-176) with
the runner's precision mode baked into the lowered program. Weights
stay OUTSIDE the artifact (a ~250 MB constant pool per bucket would be
absurd); pass the same trees the runner passes.

Typical flow::

    runner = GRNetRunner(model, precision="high")
    serve.save_artifacts(runner, "artifacts/")        # one file/bucket
    ...                                # later, possibly another machine
    arts = serve.load_artifacts("artifacts/")
    out = arts.call(variables, smpl, crops_uint8)     # picks the bucket
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax import export as jexport

from gaitlab.body.smpl import SMPLParams

# The artifact's in/out trees contain SMPLParams (a NamedTuple): register
# its serialization once so Exported round-trips in a fresh interpreter.
try:
    jexport.register_namedtuple_serialization(
        SMPLParams, serialized_name="gaitlab.body.smpl.SMPLParams")
except ValueError:
    pass  # already registered in this process

_MANIFEST = "manifest.json"


def _spec(a, dtype=None):
    return jax.ShapeDtypeStruct(np.shape(a), dtype or a.dtype)


def _variable_specs(runner):
    """Abstract specs for the weight tree the runner's forward expects
    (same cast rule as GRNetRunner._trunk_variables, without touching
    the device)."""
    import jax.numpy as jnp

    cast = jnp.dtype(runner.trunk_dtype) if runner.trunk_dtype else None
    return jax.tree_util.tree_map(
        lambda a: _spec(a, cast if cast and jnp.issubdtype(
            a.dtype, jnp.floating) else None),
        runner.model.variables)


def export_forward(runner, batch: int, raw_uint8: bool = True,
                   platforms: Sequence[str] = ("tpu", "cpu")):
    """Lower + export one bucket's forward; returns jax.export.Exported."""
    import jax.numpy as jnp

    jfwd = runner._forward(batch, raw_uint8)
    cs = runner.crop_size
    img = jax.ShapeDtypeStruct(
        (batch, cs, cs, 3), jnp.uint8 if raw_uint8 else jnp.float32)
    args = [_variable_specs(runner),
            jax.tree_util.tree_map(_spec, runner.model.smpl), img]
    if runner.model.module.use_gait_feat:
        args += [jax.ShapeDtypeStruct((batch, 4), jnp.float32),
                 jax.ShapeDtypeStruct((batch, 2), jnp.float32),
                 jax.ShapeDtypeStruct((), jnp.int32)]
    return jexport.export(jfwd, platforms=list(platforms))(*args)


def save_artifacts(runner, out_dir: str,
                   buckets: Optional[Sequence[int]] = None,
                   raw_uint8: bool = True,
                   platforms: Sequence[str] = ("tpu", "cpu")) -> dict:
    """Export every bucket and write `forward_b{n}.bin` + manifest."""
    os.makedirs(out_dir, exist_ok=True)
    buckets = tuple(buckets) if buckets else tuple(runner.buckets)
    manifest = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "crop_size": runner.crop_size,
        "raw_uint8": bool(raw_uint8),
        "precision": runner.precision,
        "head_precision": runner.head_precision,
        "trunk_dtype": runner.trunk_dtype,
        "gait": bool(runner.model.module.use_gait_feat),
        "joint_mode": runner.model.joint_mode,
        "buckets": list(buckets),
        "files": {},
    }
    for b in buckets:
        exp = export_forward(runner, b, raw_uint8, platforms)
        fname = f"forward_b{b}.bin"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        manifest["files"][str(b)] = fname
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingModel:
    """Deserialized bucket set with runner-style padded dispatch."""

    def __init__(self, manifest: dict, exported: dict):
        self.manifest = manifest
        self._exported = exported  # bucket -> Exported
        self.buckets = sorted(exported)

    def call(self, variables, smpl, images, bbox=None, cimg=None,
             n_valid=None) -> dict:
        """Run one batch, padding to the smallest covering bucket.

        Outputs are sliced back to the true row count (pred_avg, a
        sequence-level aggregate, is returned as-is)."""
        n = images.shape[0]
        covering = [b for b in self.buckets if b >= n]
        if not covering:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket "
                f"{self.buckets[-1]}")
        b = covering[0]
        pad = b - n

        def edge_pad(x):
            if pad == 0 or x is None:
                return x
            x = np.asarray(x)
            return np.concatenate([x, np.repeat(x[-1:], pad, 0)])

        args = [variables, smpl, edge_pad(images)]
        if self.manifest.get("gait"):
            args += [edge_pad(bbox), edge_pad(cimg),
                     np.int32(n if n_valid is None else n_valid)]
        out = self._exported[b].call(*args)
        return {k: (np.asarray(v)[:n] if k != "pred_avg"
                    else np.asarray(v))
                for k, v in out.items()}


def load_artifacts(path: str) -> ServingModel:
    """Load a save_artifacts directory; no gaitlab model code needed
    beyond this module (the programs are self-contained StableHLO)."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    exported = {}
    for b, fname in manifest["files"].items():
        with open(os.path.join(path, fname), "rb") as f:
            exported[int(b)] = jexport.deserialize(f.read())
    return ServingModel(manifest, exported)
