"""GLB/OBJ export: structural validation by parsing the binary back."""

import json
import struct

import numpy as np
import pytest

from gaitlab.body import smpl as body_smpl
from gaitlab.render import export


def _parse_glb(path):
    with open(path, "rb") as f:
        magic, version, total = struct.unpack("<III", f.read(12))
        assert magic == export.GLB_MAGIC and version == 2
        jlen, jtype = struct.unpack("<II", f.read(8))
        assert jtype == 0x4E4F534A
        gltf = json.loads(f.read(jlen))
        blen, btype = struct.unpack("<II", f.read(8))
        assert btype == 0x004E4942
        blob = f.read(blen)
        assert f.read() == b""
    return gltf, blob


def test_export_glb_structure(tmp_path, rng):
    params = body_smpl.synthetic_smpl_params()
    T = 12
    pose = rng.normal(size=(T, 72)).astype(np.float32) * 0.3
    betas = rng.normal(size=(10,)).astype(np.float32) * 0.05
    out = export.export_glb(str(tmp_path / "walk.glb"), pose, betas,
                            smpl_params=params, fps=20.0)
    gltf, blob = _parse_glb(out)

    assert gltf["asset"]["version"] == "2.0"
    assert len(gltf["nodes"]) == 25  # mesh + 24 joints
    assert gltf["skins"][0]["joints"] == list(range(1, 25))
    anim = gltf["animations"][0]
    assert len(anim["channels"]) == 25  # 24 rotations + root translation
    assert gltf["buffers"][0]["byteLength"] == len(blob)

    # positions accessor is readable and matches vertex count
    acc = gltf["accessors"][gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
    view = gltf["bufferViews"][acc["bufferView"]]
    pos = np.frombuffer(
        blob[view["byteOffset"]:view["byteOffset"] + view["byteLength"]],
        np.float32).reshape(-1, 3)
    assert pos.shape[0] == acc["count"] == params.v_template.shape[0]
    assert np.all(np.isfinite(pos))

    # rotation sampler quaternions are unit-norm
    rot_acc_idx = anim["samplers"][anim["channels"][0]["sampler"]]["output"]
    racc = gltf["accessors"][rot_acc_idx]
    rview = gltf["bufferViews"][racc["bufferView"]]
    q = np.frombuffer(
        blob[rview["byteOffset"]:rview["byteOffset"] + rview["byteLength"]],
        np.float32).reshape(-1, 4)
    assert q.shape[0] == T
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)


def test_export_obj(tmp_path, rng):
    verts = rng.normal(size=(10, 3))
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    p = export.export_obj(str(tmp_path / "m.obj"), verts, faces)
    lines = open(p).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 10
    assert sum(1 for l in lines if l.startswith("f ")) == 2
    assert lines[-1] == "f 4 5 6"  # 1-based indices


def test_export_from_pkl(tmp_path, rng):
    import joblib

    T = 8
    results = {3: {
        "frame_ids": np.arange(T),
        "pose": rng.normal(size=(T, 72)).astype(np.float32) * 0.2,
        "betas": rng.normal(size=(T, 10)).astype(np.float32) * 0.03,
    }}
    pkl = str(tmp_path / "out.pkl")
    joblib.dump(results, pkl)
    out = export.export_from_pkl(pkl, str(tmp_path / "a.glb"))
    gltf, _ = _parse_glb(out)
    assert gltf["animations"][0]["name"] == "gait"
