"""jax.export serving artifacts: bucket export, padded dispatch, and a
fresh-interpreter reload that never imports the model code."""

import os
import subprocess
import sys

import joblib
import numpy as np
import pytest


_RELOAD_SCRIPT = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import joblib
import numpy as np

from gaitlab import serve  # artifact loader only — no nn/ model imports

art_dir, blob_path = sys.argv[1], sys.argv[2]
blob = joblib.load(blob_path)
model = serve.load_artifacts(art_dir)
out = model.call(blob["variables"], blob["smpl"], blob["crops"])
for k, want in blob["expect"].items():
    np.testing.assert_allclose(out[k], want, rtol=1e-5, atol=1e-5,
                               err_msg=k)
# model code truly not loaded
assert not any(m.startswith("gaitlab.nn") for m in sys.modules), \\
    sorted(m for m in sys.modules if m.startswith("gaitlab.nn"))
print("RELOAD_OK", sorted(out))
"""


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    prior = os.environ.get("GAITLAB_BUCKETS")
    os.environ["GAITLAB_BUCKETS"] = "4"
    try:
        from gaitlab import serve
        from gaitlab.nn.grnet import GRNet
        from gaitlab.pipeline.runner import GRNetRunner

        model = GRNet.create(init_img=64)
        runner = GRNetRunner(model, crop_size=64)
        art_dir = str(tmp_path_factory.mktemp("serve") / "artifacts")
        manifest = serve.save_artifacts(runner, art_dir,
                                        platforms=("cpu",))
        yield {"runner": runner, "serve": serve, "art_dir": art_dir,
               "manifest": manifest, "model": model}
    finally:
        # restore, don't just pop: a suite launched with GAITLAB_BUCKETS
        # set (the documented small-compile knob) must keep it afterwards
        if prior is None:
            os.environ.pop("GAITLAB_BUCKETS", None)
        else:
            os.environ["GAITLAB_BUCKETS"] = prior


def test_manifest_and_files(served):
    m = served["manifest"]
    assert m["buckets"] == [4] and m["raw_uint8"] and m["crop_size"] == 64
    assert m["precision"] == "high" and not m["gait"]
    # the manifest records the RESOLVED head mode baked into the
    # artifacts ("auto" -> "default" under "high"), not the sentinel
    assert m["head_precision"] == "default"
    for fname in m["files"].values():
        path = os.path.join(served["art_dir"], fname)
        assert os.path.getsize(path) > 1000


def test_padded_dispatch_matches_direct(served, rng):
    """Artifact output == the runner's own jitted program, including the
    pad-to-bucket + slice-back path for a partial batch."""
    runner, serve = served["runner"], served["serve"]
    crops = rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)

    loaded = serve.load_artifacts(served["art_dir"])
    got = loaded.call(runner.model.variables, runner.model.smpl, crops)

    jfwd = runner._forward(4, True)
    full = np.concatenate([crops, crops[-1:]])  # same edge padding
    want = jfwd(runner._trunk_variables(), runner._smpl_params(), full)
    for k, v in want.items():
        arr = np.asarray(v)[:3] if k != "pred_avg" else np.asarray(v)
        np.testing.assert_allclose(got[k], arr, rtol=1e-5, atol=1e-5,
                                   err_msg=k)

    with pytest.raises(ValueError, match="exceeds the largest"):
        loaded.call(runner.model.variables, runner.model.smpl,
                    rng.integers(0, 255, (9, 64, 64, 3)).astype(np.uint8))


def test_gait_branch_export(served, rng, tmp_path):
    """The 6-arg gait signature (bbox/cimg/n_valid) exports and the
    loader's padded dispatch slices its outputs correctly."""
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    serve = served["serve"]
    model = GRNet.create(init_img=64, use_gait_feat=True)
    runner = GRNetRunner(model, crop_size=64)
    art_dir = str(tmp_path / "gait_art")
    manifest = serve.save_artifacts(runner, art_dir, platforms=("cpu",))
    assert manifest["gait"]

    n = 3
    crops = rng.integers(0, 255, (n, 64, 64, 3)).astype(np.uint8)
    bbox = np.tile(np.array([32.0, 32.0, 40.0, 40.0], np.float32), (n, 1))
    cimg = np.tile(np.array([32.0, 32.0], np.float32), (n, 1))
    loaded = serve.load_artifacts(art_dir)
    out = loaded.call(model.variables, model.smpl, crops,
                      bbox=bbox, cimg=cimg)
    assert out["kp_3d"].shape[0] == n
    assert "pred_avg" in out and np.all(np.isfinite(out["pred_avg"]))


def test_multiplatform_lowering(served):
    """Default platforms=(tpu, cpu): one artifact must lower for both
    (the deploy-to-pod + CPU-canary story). Runs on the CPU backend —
    cross-platform lowering needs no TPU device, only lowering rules."""
    from jax import export as jexport

    exp = served["serve"].export_forward(served["runner"], 4)
    assert sorted(exp.platforms) == ["cpu", "tpu"]
    blob = exp.serialize()
    assert len(blob) > 1000
    exp2 = jexport.deserialize(blob)
    assert sorted(exp2.platforms) == ["cpu", "tpu"]


def test_fresh_interpreter_reload(served, rng, tmp_path):
    """Deserialize + run in a subprocess that never imports gaitlab.nn:
    the artifact alone (plus weights) is the serving contract."""
    runner = served["runner"]
    crops = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    jfwd = runner._forward(4, True)
    want = jfwd(runner._trunk_variables(), runner._smpl_params(), crops)

    host = lambda t: __import__("jax").tree_util.tree_map(np.asarray, t)
    blob_path = str(tmp_path / "blob.joblib")
    joblib.dump({
        "variables": host(runner.model.variables),
        "smpl": host(runner.model.smpl),
        "crops": crops,
        "expect": {k: np.asarray(v) for k, v in want.items()},
    }, blob_path)

    r = subprocess.run(
        [sys.executable, "-c", _RELOAD_SCRIPT, served["art_dir"],
         blob_path],
        capture_output=True, text=True, cwd=os.getcwd())
    assert r.returncode == 0, r.stderr[-3000:]
    assert "RELOAD_OK" in r.stdout


def test_weights_roundtrip(served):
    """save_weights/load_weights must reproduce both trees exactly —
    the artifact directory is a complete deployment (round-3 addition)."""
    import jax

    serve, runner = served["serve"], served["runner"]
    assert served["manifest"]["weights"] == "weights.npz"
    variables, smpl = serve.load_weights(served["art_dir"])

    want_flat = jax.tree_util.tree_flatten_with_path(
        runner.model.variables)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    assert [p for p, _ in want_flat] == [p for p, _ in got_flat]
    for (p, w), (_, g) in zip(want_flat, got_flat):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                      err_msg=str(p))
    for name, w in runner.model.smpl._asdict().items():
        g = getattr(smpl, name)
        if w is None:
            assert g is None, name
        else:
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                          err_msg=name)


def test_load_runner_matches_direct(served, rng):
    """serve.load_runner: the FULL pipeline (host crop, bucketed padded
    dispatch) over pinned programs + shipped weights must match the
    live-traced GRNetRunner bit-for-bit on the same track."""
    from gaitlab.pipeline.runner import GRNetRunner

    serve = served["serve"]
    srunner = serve.load_runner(served["art_dir"])
    assert tuple(srunner.buckets) == (4,)
    assert srunner.crop_size == 64 and srunner.crop_on == "host"

    frames = rng.integers(0, 255, (3, 96, 128, 3)).astype(np.uint8)
    bboxes = np.tile(np.array([64.0, 48.0, 60.0, 60.0], np.float32),
                     (3, 1))
    direct = GRNetRunner(served["model"], buckets=(4,), crop_size=64,
                         crop_on="host").run_track(frames, bboxes)
    got = srunner.run_track(frames, bboxes)
    assert set(direct) == set(got)
    for k in direct:
        np.testing.assert_allclose(got[k], direct[k], rtol=1e-5,
                                   atol=1e-5, err_msg=k)

    # wrong dispatch mode fails loudly, not silently retraces
    with pytest.raises(ValueError, match="raw_uint8"):
        srunner._forward(4, False)
    with pytest.raises(ValueError, match="bucket"):
        srunner._forward(16, True)


def test_serve_cli_e2e(tmp_path, monkeypatch, capsys):
    """export -> run: checkpoint-free tiny trunk exported to a directory,
    then a synthetic walking clip served from the pinned programs into a
    demo-schema pkl."""
    import joblib

    from test_pipeline_e2e import make_synthetic_video

    from gaitlab.cli.serve import main_cli

    art = str(tmp_path / "art")
    rc = main_cli(["export", "--artifacts", art, "--crop_size", "64",
                   "--platforms", "cpu", "--buckets", "32"])
    assert rc == 0
    assert (tmp_path / "art" / "manifest.json").exists()
    assert (tmp_path / "art" / "weights.npz").exists()

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid, n=40)
    out_dir = str(tmp_path / "out")
    rc = main_cli(["run", "--artifacts", art, "--vid_file", vid,
                   "--output_folder", out_dir])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "pinned programs" in printed

    pkl = tmp_path / "out" / "walk_serve_output.pkl"
    assert pkl.exists()
    results = joblib.load(str(pkl))
    assert len(results) >= 1
    person = next(iter(results.values()))
    for key in ("pred_cam", "orig_cam", "verts", "pose", "betas",
                "joints3d", "joints2d", "bboxes", "frame_ids"):
        assert key in person, key
    assert person["pose"].shape[1] == 72
    assert len(person["frame_ids"]) >= 25  # MIN_NUM_FRAMES gate
