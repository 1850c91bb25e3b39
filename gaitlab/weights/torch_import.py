"""PyTorch checkpoint -> gaitlab flax-variable conversion.

gaitlab's flax module names mirror the reference torch module paths (dots
replaced by underscores), so conversion is a mechanical key translation
plus per-leaf layout transposes:

  conv   weight (O,I,kh,kw) -> kernel (kh,kw,I,O)
  linear weight (O,I)       -> kernel (I,O)
  LC2d   weight (1,O,I,J,1,1) -> weight (J,I,O)
  BN     weight/bias/running_mean/running_var -> scale/bias + batch_stats

plus one semantic permutation: the reference flattens (N, C, J) features
channel-major before shape/cam Dense layers (pare.py:342), while gaitlab
flattens token-major (N, J, C); the Dense kernels are permuted accordingly.

Three checkpoint flavours are handled (SURVEY.md section 5 "checkpoint"):
  1. full GRNet 'gen_state_dict' (demo.py:118-122)
  2. PARE lightning ckpt, 'model.head.' prefix remap (grnet.py:93-109,
     utils.py:185-196), incl. init_pose/init_shape extraction
  3. HRNet ckpt with 'pretrained_layers' name filtering (hrnet.py:538-572)

Conversion is numpy-only: torch is used just to deserialize .pth files when
available.
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Optional

import numpy as np

# HRNet layer prefixes eligible for pretrained loading (hrnet.py:587-590).
HRNET_PRETRAINED_LAYERS = (
    "conv1", "bn1", "conv2", "bn2", "layer1", "transition1", "stage2",
    "transition2", "stage3", "transition3", "stage4",
)
HRNET_HEAD_LAYERS = (
    "final_layer", "upsample_stage_2", "upsample_stage_3", "upsample_stage_4",
)


def _norm_key(key: str) -> tuple:
    """Normalise a dotted/underscored module path to comparable tokens."""
    return tuple(t for t in re.split(r"[._/]", key) if t)


_LEAF_TORCH = {
    "kernel": "weight",
    "scale": "weight",
    "weight": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def _convert_leaf(flax_path: tuple, torch_val: np.ndarray) -> np.ndarray:
    """Apply the layout transpose appropriate for this leaf."""
    leaf = flax_path[-1]
    module = flax_path[-2] if len(flax_path) >= 2 else ""
    v = np.asarray(torch_val)
    if leaf == "kernel":
        if v.ndim == 4:  # conv OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:  # linear (O,I) -> (I,O)
            if module in ("shape_mlp", "cam_mlp"):
                # channel-major (c*J+j) -> token-major (j*C+c) input flatten
                o, i = v.shape
                j = 24
                c = i // j
                v = v.reshape(o, c, j).transpose(0, 2, 1).reshape(o, j * c)
            v = v.T
    elif leaf == "weight" and v.ndim == 6:  # LocallyConnected (1,O,I,J,1,k2)
        v = v[0, :, :, :, 0, 0].transpose(2, 1, 0)  # -> (J, I, O)
    elif leaf == "bias" and module == "pose_mlp" and v.ndim == 4:
        v = v[0].transpose(1, 2, 0)[..., 0]  # (1,O,J,1) -> (J,O)
    return v


def flax_tree_from_torch(
    torch_state: Mapping[str, Any], flax_variables: Mapping[str, Any],
    strict: bool = True, prefix_filter: Optional[tuple] = None,
) -> tuple[dict, list, list]:
    """Fill a flax variables template from a torch state dict.

    Returns (new_variables, missing_keys, unused_torch_keys). `strict`
    raises if any flax leaf has no torch counterpart.
    """
    import jax

    torch_np = {}
    for k, v in torch_state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        torch_np[_norm_key(k)] = np.asarray(v)

    used = set()
    missing = []

    flat = jax.tree_util.tree_flatten_with_path(flax_variables)[0]
    treedef = jax.tree_util.tree_structure(flax_variables)
    new_leaves = []
    for path, leaf in flat:
        tokens = []
        for p in path:
            name = getattr(p, "key", getattr(p, "name", None))
            tokens.append(str(name))
        # drop the collection name ('params' / 'batch_stats')
        coll, *mod_path = tokens
        leaf_name = mod_path[-1]
        torch_leaf = _LEAF_TORCH.get(leaf_name, leaf_name)
        norm = ()
        for t in mod_path[:-1]:
            norm += _norm_key(t)
        norm += _norm_key(torch_leaf)
        if prefix_filter is not None and norm[0] not in prefix_filter:
            new_leaves.append(leaf)
            continue
        if norm in torch_np:
            v = _convert_leaf((coll,) + tuple(mod_path), torch_np[norm])
            if v.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {mod_path}: torch {v.shape} vs flax {leaf.shape}"
                )
            new_leaves.append(v.astype(np.asarray(leaf).dtype))
            used.add(norm)
        else:
            missing.append("/".join(mod_path))
            if strict:
                raise KeyError(f"no torch weight for flax leaf {'/'.join(mod_path)}")
            new_leaves.append(leaf)

    unused = [k for k in torch_np if k not in used]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), missing, unused


# ---------------------------------------------------------------------------
# checkpoint flavours
# ---------------------------------------------------------------------------

def load_torch_file(path: str) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def strip_prefix(state: Mapping[str, Any], prefix: str) -> dict:
    """Reference load_ckpt_w_prefix (utils.py:185-196): keep keys under
    'model.<prefix>' with the prefix removed, plus non-'model.' keys."""
    out = {}
    full = "model." + prefix
    for k, v in state.items():
        if k.startswith(full):
            out[k[len(full):]] = v
        elif not k.startswith("model"):
            out[k] = v
    return out


def import_pare_head_ckpt(state_dict: Mapping[str, Any], flax_head_vars,
                          strict: bool = False):
    """Flavour 2: PARE lightning ckpt -> head variables + init params.

    state_dict: the ckpt['state_dict'] mapping with 'model.head.*' keys
    (grnet.py:99-109). Non-deployed head weights in the ckpt (e.g. unused
    branches) are reported, not fatal.
    """
    head_state = strip_prefix(state_dict, "head.")
    init = {}
    for k in ("init_pose", "init_shape", "init_cam", "temperature"):
        if k in head_state:
            v = head_state.pop(k)
            init[k] = np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
    vars_new, missing, unused = flax_tree_from_torch(
        head_state, flax_head_vars, strict=strict
    )
    return vars_new, init, missing, unused


def import_hrnet_ckpt(state: Mapping[str, Any], flax_backbone_vars,
                      include_heads: bool = True, strict: bool = False):
    """Flavour 3: HRNet checkpoint with pretrained-layer filtering
    (hrnet.py:556-569). If the file has a 'state_dict' wrapper the upsample
    heads are included too (hrnet.py:558-561)."""
    if "state_dict" in state:
        state = state["state_dict"]
        allowed = HRNET_PRETRAINED_LAYERS + HRNET_HEAD_LAYERS
    else:
        allowed = HRNET_PRETRAINED_LAYERS + (HRNET_HEAD_LAYERS if include_heads else ())
    filtered = {k: v for k, v in state.items() if k.split(".")[0] in allowed}
    return flax_tree_from_torch(filtered, flax_backbone_vars, strict=strict)


def import_grnet_ckpt(gen_state_dict: Mapping[str, Any], flax_vars,
                      strict: bool = False):
    """Flavour 1: full GRNet 'gen_state_dict' (demo.py:118-122). Keys are
    'backbone.*' / 'head.*' (regressor holds only SMPL buffers, which live
    in SMPLParams on our side)."""
    state = {
        k: v for k, v in gen_state_dict.items()
        if k.split(".")[0] in ("backbone", "head")
    }
    return flax_tree_from_torch(state, flax_vars, strict=strict)
