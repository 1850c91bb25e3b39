"""Utilities for loading the *reference* PyTorch implementation in tests.

The reference repo (/root/reference, read-only) is the parity oracle: we
instantiate its torch modules with random weights, convert the weights to
gaitlab's JAX pytrees, and assert both stacks produce the same numbers.

The reference depends on `yacs` and `smplx`, which are not installed, so we
register small shims in sys.modules before importing `lib.*`.  The smplx
shim is a faithful standard-LBS SMPL (public SMPL math) used purely as a
test oracle with synthetic model files.
"""

from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import types

import numpy as np

REF = "/root/reference"


def load_module_from_path(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_geometry():
    """Reference geometry module (torch-only deps, import directly)."""
    return load_module_from_path(
        "ref_geometry", os.path.join(REF, "lib/utils/geometry.py")
    )


# ---------------------------------------------------------------------------
# yacs shim
# ---------------------------------------------------------------------------

class _CfgNode(dict):
    """Minimal yacs.config.CfgNode: dict with attribute access + clone/merge."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def merge_from_file(self, path):
        import yaml

        with open(path) as f:
            other = yaml.safe_load(f)
        _merge(other or {}, self)

    def merge_from_list(self, lst):
        for k, v in zip(lst[0::2], lst[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v


def _merge(src: dict, dst: _CfgNode):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(v, dst[k])
        else:
            dst[k] = v


def install_yacs_shim():
    if "yacs" in sys.modules:
        return
    yacs = types.ModuleType("yacs")
    config = types.ModuleType("yacs.config")
    config.CfgNode = _CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


# ---------------------------------------------------------------------------
# smplx shim (torch oracle implementing public SMPL LBS math)
# ---------------------------------------------------------------------------

# Standard SMPL extra-joint vertex ids, in smplx's VertexJointSelector order:
# face (nose..lear), feet (LBigToe..RHeel), then hands via tip ids.
SMPLX_FACE_FEET_IDS = [332, 6260, 2800, 4071, 583,          # nose reye leye rear lear
                       3216, 3226, 3387, 6617, 6624, 6787]  # LBigToe LSmallToe LHeel RBigToe RSmallToe RHeel
SMPLX_TIP_IDS = [2746, 2319, 2445, 2556, 2673,              # lthumb lindex lmiddle lring lpinky
                 6191, 5782, 5905, 6016, 6133]              # rthumb rindex rmiddle rring rpinky
NUM_SMPL_VERTS = 6890
NUM_SMPL_JOINTS = 24


def make_synthetic_smpl_data(seed: int = 0) -> dict:
    """Random-but-valid SMPL parameter arrays (full 6890-vertex layout).

    Magnitudes are scaled so the model behaves like a body model: a compact
    template, small blendshape offsets, convex skinning weights dominated by
    the nearest joint, and a J_regressor that averages nearby vertices.
    """
    rng = np.random.default_rng(seed)
    V, J = NUM_SMPL_VERTS, NUM_SMPL_JOINTS
    v_template = rng.normal(size=(V, 3)).astype(np.float64) * 0.3
    shapedirs = rng.normal(size=(V, 3, 10)) * 0.01
    posedirs = rng.normal(size=(V * 3, 207)).T * 0.001  # (207, V*3)
    # convex row-stochastic J_regressor
    jr = rng.random(size=(J, V)) ** 8
    J_regressor = jr / jr.sum(axis=1, keepdims=True)
    parents = np.array(
        [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
        dtype=np.int64,
    )
    w = rng.random(size=(V, J)) ** 4
    lbs_weights = w / w.sum(axis=1, keepdims=True)
    f = rng.integers(0, V, size=(100, 3)).astype(np.int64)
    return dict(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=J_regressor,
        parents=parents,
        lbs_weights=lbs_weights,
        faces=f,
    )


def install_smplx_shim():
    """Register a minimal-but-correct torch `smplx` package in sys.modules."""
    if "smplx" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class SMPLOutput:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def __getattr__(self, k):  # missing fields -> None, like dataclass defaults
            return None

    def vertices2joints(J_regressor, vertices):
        return torch.einsum("bik,ji->bjk", [vertices, J_regressor])

    def batch_rodrigues_t(aa):
        angle = torch.norm(aa + 1e-8, dim=1, keepdim=True)
        axis = aa / angle
        half = angle * 0.5
        q = torch.cat([torch.cos(half), axis * torch.sin(half)], dim=1)
        q = q / q.norm(dim=1, keepdim=True)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        return torch.stack(
            [
                w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (w * y + x * z),
                2 * (w * z + x * y), w * w - x * x + y * y - z * z, 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (w * x + y * z), w * w - x * x - y * y + z * z,
            ],
            dim=1,
        ).view(-1, 3, 3)

    class SMPL(nn.Module):
        NUM_JOINTS = NUM_SMPL_JOINTS - 1
        NUM_BODY_JOINTS = NUM_SMPL_JOINTS - 1

        def __init__(self, model_path="", batch_size=1, create_transl=True, **kw):
            super().__init__()
            path = model_path
            if os.path.isdir(path):
                for cand in ("SMPL_NEUTRAL.pkl", "smpl_model.pkl"):
                    p = os.path.join(path, cand)
                    if os.path.isfile(p):
                        path = p
                        break
            if os.path.isfile(path):
                with open(path, "rb") as f:
                    data = pickle.load(f)
            else:
                data = make_synthetic_smpl_data()
            t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)
            self.register_buffer("v_template", t(data["v_template"]))
            self.register_buffer("shapedirs", t(data["shapedirs"]))
            self.register_buffer("posedirs", t(data["posedirs"]))
            self.register_buffer("J_regressor", t(data["J_regressor"]))
            self.register_buffer("lbs_weights", t(data["lbs_weights"]))
            self.parents = torch.tensor(data["parents"], dtype=torch.long)
            self.faces = np.asarray(data["faces"])
            vertex_ids = SMPLX_FACE_FEET_IDS + SMPLX_TIP_IDS
            self.extra_vertex_ids = torch.tensor(vertex_ids, dtype=torch.long)

        def forward(
            self,
            betas=None,
            body_pose=None,
            global_orient=None,
            pose2rot=True,
            get_skin=True,
            **kw,
        ):
            device = self.v_template.device
            B = max(
                x.shape[0] for x in (betas, body_pose, global_orient) if x is not None
            )
            if betas is None:
                betas = torch.zeros(B, 10, device=device)
            if pose2rot:
                full_aa = torch.cat([global_orient, body_pose], dim=1).reshape(-1, 3)
                rot_mats = batch_rodrigues_t(full_aa).view(B, -1, 3, 3)
            else:
                rot_mats = torch.cat(
                    [global_orient.view(B, -1, 3, 3), body_pose.view(B, -1, 3, 3)],
                    dim=1,
                )
            verts, joints = self._lbs(betas, rot_mats)
            ex = verts[:, self.extra_vertex_ids]
            joints_all = torch.cat([joints, ex], dim=1)
            return SMPLOutput(
                vertices=verts,
                joints=joints_all,
                betas=betas,
                global_orient=global_orient,
                body_pose=body_pose,
                full_pose=None,
            )

        def _lbs(self, betas, rot_mats):
            B = betas.shape[0]
            v_shaped = self.v_template[None] + torch.einsum(
                "bl,vkl->bvk", betas, self.shapedirs
            )
            J = torch.einsum("jv,bvk->bjk", self.J_regressor, v_shaped)
            ident = torch.eye(3, device=betas.device)
            pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
            v_posed = v_shaped + torch.einsum(
                "bp,pn->bn", pose_feature, self.posedirs
            ).reshape(B, -1, 3)
            # rigid transform chain
            J_rel = J.clone()
            J_rel[:, 1:] -= J[:, self.parents[1:]]
            transforms = [None] * NUM_SMPL_JOINTS
            for j in range(NUM_SMPL_JOINTS):
                T = torch.zeros(B, 4, 4, device=betas.device)
                T[:, :3, :3] = rot_mats[:, j]
                T[:, :3, 3] = J_rel[:, j]
                T[:, 3, 3] = 1.0
                if j == 0:
                    transforms[j] = T
                else:
                    transforms[j] = transforms[self.parents[j].item()] @ T
            G = torch.stack(transforms, dim=1)  # (B,J,4,4)
            posed_joints = G[:, :, :3, 3]
            # remove rest-pose transform
            Jh = torch.cat([J, torch.zeros(B, NUM_SMPL_JOINTS, 1, device=betas.device)], dim=-1)
            correction = torch.einsum("bjik,bjk->bji", G, Jh)
            A = G.clone()
            A[:, :, :3, 3] -= correction[:, :, :3]
            T = torch.einsum("vj,bjik->bvik", self.lbs_weights, A)
            vh = torch.cat([v_posed, torch.ones(B, v_posed.shape[1], 1, device=betas.device)], dim=-1)
            verts = torch.einsum("bvik,bvk->bvi", T, vh)[..., :3]
            return verts, posed_joints

    smplx = types.ModuleType("smplx")
    smplx.SMPL = SMPL
    utils = types.ModuleType("smplx.utils")
    utils.ModelOutput = SMPLOutput
    utils.SMPLOutput = SMPLOutput
    lbs_mod = types.ModuleType("smplx.lbs")
    lbs_mod.vertices2joints = vertices2joints
    smplx.utils = utils
    smplx.lbs = lbs_mod
    sys.modules["smplx"] = smplx
    sys.modules["smplx.utils"] = utils
    sys.modules["smplx.lbs"] = lbs_mod


def install_misc_shims():
    """torchvision / timm stand-ins (only the pieces the reference touches)."""
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        resnet = types.ModuleType("torchvision.models.resnet")
        transforms = types.ModuleType("torchvision.transforms")
        tfunc = types.ModuleType("torchvision.transforms.functional")

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class ToTensor:
            def __call__(self, x):
                a = np.asarray(x)
                t = torch.from_numpy(np.ascontiguousarray(a)).permute(2, 0, 1)
                return t.float().div(255.0) if a.dtype == np.uint8 else t.float()

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, x):
                return (x - self.mean) / self.std

        def to_tensor(x):
            return ToTensor()(x)

        transforms.Compose = Compose
        transforms.ToTensor = ToTensor
        transforms.Normalize = Normalize
        transforms.functional = tfunc
        tfunc.to_tensor = to_tensor
        tv.models = models
        tv.transforms = transforms
        models.resnet = resnet
        for m in (tv, models, resnet, transforms, tfunc):
            sys.modules[m.__name__] = m

    if "skimage" not in sys.modules:
        # lib/data_utils/img_utils.py:24 imports view_as_windows (used only
        # by split_into_chunks:378); a faithful stride-tricks implementation
        # keeps that path testable too.
        skimage = types.ModuleType("skimage")
        util = types.ModuleType("skimage.util")
        shape_mod = types.ModuleType("skimage.util.shape")

        def view_as_windows(arr, window_shape, step=1):
            arr = np.asarray(arr)
            if isinstance(window_shape, int):
                window_shape = (window_shape,)
            if isinstance(step, int):
                step = (step,) * arr.ndim
            win = tuple(window_shape) + (1,) * (arr.ndim - len(window_shape))
            out_shape = tuple(
                (s - w) // st + 1 for s, w, st in zip(arr.shape, win, step)
            ) + tuple(win)
            strides = tuple(s * st for s, st in zip(arr.strides, step)) + arr.strides
            return np.lib.stride_tricks.as_strided(arr, out_shape, strides)

        shape_mod.view_as_windows = view_as_windows
        util.shape = shape_mod
        skimage.util = util
        for m in (skimage, util, shape_mod):
            sys.modules[m.__name__] = m

    if "pytube" not in sys.modules:
        # lib/utils/demo_utils.py:25 — only download_youtube_clip touches it
        pytube = types.ModuleType("pytube")

        class YouTube:  # pragma: no cover - zero-egress container
            def __init__(self, *a, **k):
                raise RuntimeError("no network egress in this environment")

        pytube.YouTube = YouTube
        sys.modules["pytube"] = pytube

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tmodels = types.ModuleType("timm.models")
        tlayers = types.ModuleType("timm.models.layers")

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        tlayers.trunc_normal_ = trunc_normal_
        timm.models = tmodels
        tmodels.layers = tlayers
        for m in (timm, tmodels, tlayers):
            sys.modules[m.__name__] = m


def setup_ref_data_dir(tmpdir: str, seed: int = 0) -> str:
    """Create data/smpl_data + data/grnet_data files the reference expects.

    Returns the directory that should become the CWD when importing/running
    reference models (paths in lib/core/config.py:23-24 are relative).
    """
    smpl_dir = os.path.join(tmpdir, "data", "smpl_data")
    grnet_dir = os.path.join(tmpdir, "data", "grnet_data")
    os.makedirs(smpl_dir, exist_ok=True)
    os.makedirs(grnet_dir, exist_ok=True)
    rng = np.random.default_rng(seed + 100)
    jre = rng.random(size=(9, NUM_SMPL_VERTS)) ** 8
    jre = (jre / jre.sum(axis=1, keepdims=True)).astype(np.float64)
    np.save(os.path.join(smpl_dir, "J_regressor_extra.npy"), jre)
    np.savez(
        os.path.join(smpl_dir, "smpl_mean_params.npz"),
        pose=rng.normal(size=(144,)).astype(np.float32) * 0.1,
        shape=rng.normal(size=(10,)).astype(np.float64) * 0.1,
        cam=np.array([0.9, 0.0, 0.0], dtype=np.float32),
    )
    data = make_synthetic_smpl_data(seed)
    with open(os.path.join(smpl_dir, "SMPL_NEUTRAL.pkl"), "wb") as f:
        pickle.dump(data, f)
    return tmpdir


def import_ref_lib():
    """Import the reference `lib` package with shims installed.

    Caller must chdir into a directory prepared by setup_ref_data_dir first
    (checkpoint paths + data dirs are relative).
    """
    install_yacs_shim()
    install_smplx_shim()
    install_misc_shims()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import lib  # noqa: F401

    return sys.modules["lib"]
