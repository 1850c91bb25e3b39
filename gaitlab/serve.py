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


_WEIGHTS = "weights.npz"


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))
        key = str(key)
        if "/" in key:
            raise ValueError(f"weight tree key contains '/': {key!r}")
        parts.append(key)
    return "/".join(parts)


def save_weights(out_dir: str, model) -> str:
    """Serialize the model's weight trees (flax variables + SMPLParams)
    next to the artifacts, so a deployment starts from the directory
    alone — the exported programs take weights as ARGUMENTS (a constant
    pool would both bloat the artifact and run 2.3x slower at batch 128,
    docs/PERFORMANCE.md §Serving latency), so they must ship alongside."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            model.variables)[0]:
        flat["var:" + _path_str(path)] = np.asarray(leaf)
    for name, val in model.smpl._asdict().items():
        if val is not None:
            flat["smpl:" + name] = np.asarray(val)
    np.savez(os.path.join(out_dir, _WEIGHTS), **flat)
    return _WEIGHTS


def load_weights(path: str):
    """Inverse of save_weights: (variables, SMPLParams) host trees."""
    z = np.load(os.path.join(path, _WEIGHTS))
    variables: dict = {}
    smpl_kw = {}
    for k in z.files:
        kind, rest = k.split(":", 1)
        if kind == "smpl":
            smpl_kw[rest] = z[k]
        else:
            node = variables
            parts = rest.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[k]
    return variables, SMPLParams(**smpl_kw)


def save_artifacts(runner, out_dir: str,
                   buckets: Optional[Sequence[int]] = None,
                   raw_uint8: bool = True,
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   include_weights: bool = True) -> dict:
    """Export every bucket and write `forward_b{n}.bin` + manifest
    (+ the weight trees, so the directory is a complete deployment)."""
    os.makedirs(out_dir, exist_ok=True)
    buckets = tuple(buckets) if buckets else tuple(runner.buckets)
    manifest = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "crop_size": runner.crop_size,
        "raw_uint8": bool(raw_uint8),
        "precision": runner.precision,
        # record the RESOLVED head mode baked into the exported programs,
        # not the runner's "auto" sentinel — an artifact audit must see
        # what the head actually ran at (docs/PRECISION.json row names)
        "head_precision": runner.resolved_head_precision(),
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
    if include_weights:
        manifest["weights"] = save_weights(out_dir, runner.model)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingModel:
    """Deserialized bucket set with runner-style padded dispatch."""

    def __init__(self, manifest: dict, exported: dict,
                 variables=None, smpl=None):
        self.manifest = manifest
        self._exported = exported  # bucket -> Exported
        self.buckets = sorted(exported)
        # weight trees from the artifact directory, when shipped there
        self.variables = variables
        self.smpl = smpl

    def call(self, variables, smpl, images, bbox=None, cimg=None,
             n_valid=None) -> dict:
        """Run one batch, padding to the smallest covering bucket.

        variables/smpl may be None when the artifact directory shipped
        weights (save_artifacts include_weights). Outputs are sliced back
        to the true row count (pred_avg, a sequence-level aggregate, is
        returned as-is)."""
        if variables is None:
            variables = self.variables
        if smpl is None:
            smpl = self.smpl
        if variables is None or smpl is None:
            raise ValueError("no weights: pass variables/smpl or export "
                             "with include_weights=True")
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
    variables = smpl = None
    if manifest.get("weights") and os.path.isfile(
            os.path.join(path, manifest["weights"])):
        variables, smpl = load_weights(path)
    return ServingModel(manifest, exported, variables, smpl)


# --------------------------------------------------------- pipeline runner


def load_runner(path: str, **runner_kwargs):
    """A GRNetRunner whose per-bucket forwards are the PINNED exported
    programs — the full pipeline (host decode, detect/track, host crop,
    bucketed padded dispatch, streaming/one-pass) runs unchanged on top,
    but NOTHING is re-traced from Python model code and the weights come
    from the artifact directory. This is the deployment entry the
    reference lacks entirely (it re-builds the torch model from source on
    every host, /root/reference/demo.py:401-420)."""
    from dataclasses import dataclass as _dataclass

    from gaitlab.pipeline.runner import GRNetRunner

    serving = load_artifacts(path)
    man = serving.manifest
    if serving.variables is None:
        raise ValueError(f"{path} has no weights.npz — export with "
                         "include_weights=True, or run from the runner")

    class _ModuleInfo:
        """The only module attribute the runner's non-tracing paths
        consult (pipeline/runner.py run_track gait wiring)."""
        use_gait_feat = bool(man.get("gait"))

    class _Bundle:
        module = _ModuleInfo()
        joint_mode = man.get("joint_mode", "spin2")

        def __init__(self, variables, smpl):
            self.variables, self.smpl = variables, smpl

    @_dataclass
    class ServingRunner(GRNetRunner):
        def _forward(self, n: int, raw_uint8: bool = False):
            if bool(raw_uint8) != bool(man.get("raw_uint8", True)):
                raise ValueError(
                    f"artifacts were exported with raw_uint8="
                    f"{man.get('raw_uint8')}; this dispatch path needs "
                    f"{raw_uint8} (set crop_on accordingly)")
            exp = serving._exported.get(n)
            if exp is None:
                raise ValueError(f"no exported program for bucket {n} "
                                 f"(have {serving.buckets})")
            gait = _ModuleInfo.use_gait_feat

            def fwd(variables, smpl, images, bbox=None, cimg=None,
                    n_valid=None):
                args = [variables, smpl, images]
                if gait:
                    args += [bbox, cimg, n_valid]
                return exp.call(*args)

            return fwd

    kw = dict(buckets=tuple(man["buckets"]), crop_size=man["crop_size"],
              precision=man.get("precision", "high"),
              head_precision=man.get("head_precision"),
              trunk_dtype=man.get("trunk_dtype"))
    # exported programs take raw uint8 crops -> host-crop feed
    kw["crop_on"] = "host" if man.get("raw_uint8", True) else "device"
    kw.update(runner_kwargs)
    return ServingRunner(_Bundle(serving.variables, serving.smpl), **kw)
