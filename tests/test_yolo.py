"""In-repo Flax YOLOv3-tiny detector: darknet weight layout, decode math,
and the neural end-to-end --detector yolo path (VERDICT r1 next-step #3;
reference front-end: /root/reference/demo.py:89-97)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def module_and_vars():
    from gaitlab.nn import yolo

    module = yolo.YoloV3Tiny()
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 416, 416, 3), jnp.float32))
    return module, variables


def test_output_shapes(module_and_vars):
    from gaitlab.nn import yolo

    module, variables = module_and_vars
    x = jnp.zeros((2, 416, 416, 3), jnp.float32)
    y1, y2 = module.apply(variables, x)
    assert y1.shape == (2, 13, 13, 255)
    assert y2.shape == (2, 26, 26, 255)
    d = yolo.detect(module, variables, x)
    assert d.shape == (2, (13 * 13 + 26 * 26) * 3, 85)


def test_darknet_weights_roundtrip(tmp_path, module_and_vars, rng):
    """save -> load reproduces every parameter bit-exactly, validating the
    (out,in,kh,kw) <-> (kh,kw,in,out) transposes and the
    beta/gamma/mean/var ordering of the public darknet format."""
    from gaitlab.nn import yolo

    module, variables = module_and_vars
    noised = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.normal(size=v.shape), v.dtype), variables)
    path = str(tmp_path / "yolov3-tiny.weights")
    yolo.save_darknet_weights(path, noised)

    loaded = yolo.load_darknet_weights(path, variables)
    flat_a = jax.tree_util.tree_leaves_with_path(noised)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for path_k, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path_k]),
                                      err_msg=str(path_k))


def test_darknet_header_and_length_check(tmp_path, module_and_vars):
    from gaitlab.nn import yolo

    module, variables = module_and_vars
    path = str(tmp_path / "w.weights")
    yolo.save_darknet_weights(path, variables)
    data = open(path, "rb").read()
    assert np.frombuffer(data[:12], np.int32).tolist() == [0, 2, 0]
    with pytest.raises(ValueError):
        yolo.load_darknet_weights(data[:-64], variables)  # truncated


def _constant_head_variables(variables, tx=0.0, tw=0.0, obj=3.0, cls0=3.0):
    """Zero all conv kernels (identity BN) and set head biases so every
    grid cell predicts the same box logits — makes the decode chain
    predictable in closed form through the *whole* network."""
    import flax

    p = flax.core.unfreeze(jax.tree_util.tree_map(np.asarray, variables))
    for name, scope in p["params"].items():
        if "conv" in scope:  # ConvBN
            scope["conv"]["kernel"] = np.zeros_like(scope["conv"]["kernel"])
            scope["bn"]["bias"] = np.zeros_like(scope["bn"]["bias"])
            scope["bn"]["scale"] = np.ones_like(scope["bn"]["scale"])
        else:  # detection head
            scope["kernel"] = np.zeros_like(scope["kernel"])
            bias = np.full((3, 85), -10.0, np.float32)
            bias[:, 0] = bias[:, 1] = tx
            bias[:, 2] = bias[:, 3] = tw
            bias[:, 4] = obj
            bias[:, 5] = cls0
            scope["bias"] = bias.reshape(-1)
    for name, scope in p["batch_stats"].items():
        scope["bn"]["mean"] = np.zeros_like(scope["bn"]["mean"])
        scope["bn"]["var"] = np.ones_like(scope["bn"]["var"])
    return p


def test_decode_closed_form(module_and_vars):
    """With zeroed kernels and crafted head biases, the decoded boxes must
    be exactly (grid+0.5)*stride centers with anchor-sized boxes and
    sigmoid'd scores — validates the darknet yolo-layer decode."""
    from gaitlab.nn import yolo

    module, variables = module_and_vars
    p = _constant_head_variables(variables)
    x = jnp.zeros((1, 416, 416, 3), jnp.float32)
    d = np.asarray(yolo.detect(module, p, x))[0]

    # first 13*13*3 rows are the coarse head (stride 32)
    row = d[0]
    assert np.isclose(row[0], 0.5 * 32) and np.isclose(row[1], 0.5 * 32)
    np.testing.assert_allclose(row[2:4], yolo.ANCHORS_COARSE[0], rtol=1e-6)
    sig3 = 1.0 / (1.0 + np.exp(-3.0))
    assert np.isclose(row[4], sig3, atol=1e-6)       # objectness
    assert np.isclose(row[5], sig3, atol=1e-6)       # person class
    assert row[6] < 1e-4                             # other classes off
    # a fine-head row: stride 16, fine anchors
    fine = d[13 * 13 * 3]
    assert np.isclose(fine[0], 0.5 * 16) and np.isclose(fine[1], 0.5 * 16)
    np.testing.assert_allclose(fine[2:4], yolo.ANCHORS_FINE[0], rtol=1e-6)


def test_yolo_detector_end_to_end(tmp_path, monkeypatch, module_and_vars):
    """--detector yolo runs the Flax net end-to-end with converted
    weights: factory resolves the darknet file, the detector returns
    person boxes in original-image coordinates, NMS'd, and SORT consumes
    them."""
    from gaitlab.nn import yolo
    from gaitlab.pipeline import detect, tracks

    module, variables = module_and_vars
    p = _constant_head_variables(variables)
    path = str(tmp_path / "yolov3-tiny.weights")
    yolo.save_darknet_weights(path, p)

    monkeypatch.setenv("GAITLAB_YOLO_WEIGHTS", path)
    det = detect.get_detector("yolo", batch=4)
    assert isinstance(det, detect.YoloTinyDetector)

    frames = np.zeros((6, 240, 320, 3), np.uint8)  # non-square: letterbox
    dets = det(frames)
    assert len(dets) == 6
    for d in dets:
        assert d.ndim == 2 and d.shape[1] == 5
        assert len(d) > 0  # crafted weights fire everywhere, NMS prunes
        x1, y1, x2, y2, score = d[0]
        assert x2 > x1 and y2 > y1
        assert 0.9 < score <= 1.0
        # centers must map back into the original image frame
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        assert -160 < cx < 480 and -120 < cy < 360

    result = tracks.track_video(dets)
    assert result  # SORT consumed the neural detections into tracks


def test_yolo_detector_random_weights_wellformed(module_and_vars):
    """Random weights: detections are well-formed (possibly empty)."""
    from gaitlab.pipeline.detect import YoloTinyDetector

    det = YoloTinyDetector(batch=2, score_threshold=0.99)
    out = det(np.zeros((3, 64, 96, 3), np.uint8))
    assert len(out) == 3
    for d in out:
        assert d.shape[1:] == (5,)


def test_get_detector_forwards_operating_point(tmp_path, monkeypatch,
                                               module_and_vars):
    """--yolo_img_size / --tracker_batch_size reach the neural detector
    (reference operating point demo.py:409-413; these flags were parsed
    but unused before round 2)."""
    from gaitlab.nn import yolo
    from gaitlab.pipeline import detect

    module, variables = module_and_vars
    path = str(tmp_path / "yolov3-tiny.weights")
    yolo.save_darknet_weights(path, variables)
    monkeypatch.setenv("GAITLAB_YOLO_WEIGHTS", path)
    det = detect.get_detector("yolo", input_size=320, batch=4)
    assert isinstance(det, detect.YoloTinyDetector)
    assert det.input_size == 320
    assert det.batch == 4


def test_v3_table_matches_public_cfg():
    """The generated yolov3 table must reproduce the public cfg exactly:
    107 layers, known route/shortcut targets, and a payload float count
    equal to the stock yolov3.weights file (248007048 bytes on disk =
    62001757 floats after the 20-byte header). Same check for tiny
    (35434956 bytes = 8858734 floats)."""
    from gaitlab.nn import yolo

    t = yolo.v3_layers()
    assert len(t) == 107
    assert t[82] == ("yolo", yolo.V3_ANCHORS_32)
    assert t[94] == ("yolo", yolo.V3_ANCHORS_16)
    assert t[106] == ("yolo", yolo.V3_ANCHORS_8)
    assert t[83] == ("route", (-4,))
    assert t[86] == ("route", (-1, 61))
    assert t[98] == ("route", (-1, 36))
    assert sum(1 for e in t if e[0] == "shortcut") == 23  # darknet-53
    assert yolo.expected_float_count(t) == 62001757
    assert yolo.expected_float_count(yolo.tiny_layers()) == 8858734


def test_infer_variant(tmp_path):
    from gaitlab.nn import yolo

    # fabricate files with the exact payload sizes; header is 20 bytes on
    # darknet >= 0.2 (int64 seen) and 16 on older files (int32 seen) —
    # load_darknet_weights accepts both, so detection must too
    for hdr in (20, 16):
        for n, want in ((8858734, "tiny"), (62001757, "v3")):
            path = str(tmp_path / f"{want}_{hdr}.weights")
            with open(path, "wb") as f:
                f.write(b"\0" * (hdr + 4 * n))
            assert yolo.infer_variant(path) == want
    bad = str(tmp_path / "bad.weights")
    with open(bad, "wb") as f:
        f.write(b"\0" * 1000)
    with pytest.raises(ValueError):
        yolo.infer_variant(bad)


def test_get_detector_forced_variant_dnn_fallback(tmp_path, monkeypatch):
    """A forced yolo variant with no darknet weights but a user dnn model
    must construct DnnPersonDetector WITHOUT leaking the yolo-only
    'variant' kwarg (regression: TypeError on the documented fallback)."""
    from gaitlab.pipeline import detect, fetch

    seen = {}

    class StubDnn:
        def __init__(self, model=None, config=None, **kw):
            seen.update(kw, model=model)

    monkeypatch.setattr(detect, "DnnPersonDetector", StubDnn)
    monkeypatch.setattr(fetch, "ASSET_DIR", str(tmp_path))  # no weights
    monkeypatch.delenv("GAITLAB_YOLO_WEIGHTS", raising=False)
    monkeypatch.setenv("GAITLAB_DETECTOR_MODEL", "person.onnx")
    det = detect.get_detector("yolo_tiny", input_size=320)
    assert isinstance(det, StubDnn)
    assert seen["model"] == "person.onnx"
    assert "variant" not in seen
    assert seen["input_size"] == 320


@pytest.fixture(scope="module")
def v3_module_and_vars():
    """Full yolov3 at a small input size (cheap on the CPU backend; conv
    grids stay valid at any multiple of 32)."""
    from gaitlab.nn import yolo

    module = yolo.YoloV3()
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 160, 160, 3), jnp.float32))
    return module, variables


def test_v3_output_shapes(v3_module_and_vars):
    from gaitlab.nn import yolo

    module, variables = v3_module_and_vars
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    maps = module.apply(variables, x)
    assert [m.shape for m in maps] == [
        (1, 5, 5, 255), (1, 10, 10, 255), (1, 20, 20, 255)]
    d = yolo.detect(module, variables, x)
    assert d.shape == (1, (25 + 100 + 400) * 3, 85)


def test_v3_darknet_roundtrip(tmp_path, v3_module_and_vars, rng):
    """save -> load of the FULL topology (residuals, 3 scales, 75 convs)
    reproduces every parameter bit-exactly."""
    from gaitlab.nn import yolo

    module, variables = v3_module_and_vars
    noised = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.normal(size=v.shape), v.dtype), variables)
    path = str(tmp_path / "yolov3.weights")
    yolo.save_darknet_weights(path, noised, layers=module.layers)
    assert yolo.infer_variant(path) == "v3"

    loaded = yolo.load_darknet_weights(path, variables,
                                       layers=module.layers)
    flat_a = jax.tree_util.tree_leaves_with_path(noised)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for path_k, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path_k]),
                                      err_msg=str(path_k))


def test_v3_decode_closed_form(v3_module_and_vars):
    """Constant-head closed form through the full network: residual adds
    and route concats must not disturb the darknet decode chain."""
    from gaitlab.nn import yolo

    module, variables = v3_module_and_vars
    p = _constant_head_variables(variables)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    d = np.asarray(yolo.detect(module, p, x))[0]

    sig3 = 1.0 / (1.0 + np.exp(-3.0))
    # scale order is coarse->fine: stride 32, 16, 8
    offsets = [0, 5 * 5 * 3, 5 * 5 * 3 + 10 * 10 * 3]
    strides = [32, 16, 8]
    anchor_sets = [yolo.V3_ANCHORS_32, yolo.V3_ANCHORS_16, yolo.V3_ANCHORS_8]
    for off, s, anchors in zip(offsets, strides, anchor_sets):
        row = d[off]
        assert np.isclose(row[0], 0.5 * s) and np.isclose(row[1], 0.5 * s)
        np.testing.assert_allclose(row[2:4], anchors[0], rtol=1e-5)
        assert np.isclose(row[4], sig3, atol=1e-6)
        assert np.isclose(row[5], sig3, atol=1e-6)
        assert row[6] < 1e-4


@pytest.mark.slow
def test_v3_detector_end_to_end(tmp_path, monkeypatch, v3_module_and_vars):
    """--detector yolo with a full-v3 .weights file runs end to end
    (VERDICT r2 next-step #3): the factory auto-detects the variant from
    the file, letterboxes, decodes all three scales, NMS's, and SORT
    consumes the boxes — the reference's operating point
    (/root/reference/demo.py:409-413) on the in-repo network."""
    from gaitlab.nn import yolo
    from gaitlab.pipeline import detect, tracks

    module, variables = v3_module_and_vars
    p = _constant_head_variables(variables)
    path = str(tmp_path / "yolov3.weights")
    yolo.save_darknet_weights(path, p, layers=module.layers)

    monkeypatch.setenv("GAITLAB_YOLO_WEIGHTS", path)
    det = detect.get_detector("yolo", input_size=160, batch=2)
    assert isinstance(det, detect.YoloDetector)
    assert det.variant == "v3"

    frames = np.zeros((4, 120, 160, 3), np.uint8)  # non-square: letterbox
    dets = det(frames)
    assert len(dets) == 4
    for d in dets:
        assert d.ndim == 2 and d.shape[1] == 5
        assert len(d) > 0
        x1, y1, x2, y2, score = d[0]
        assert x2 > x1 and y2 > y1
        assert 0.9 < score <= 1.0

    result = tracks.track_video(dets)
    assert result


def test_get_detector_variant_forcing(tmp_path, monkeypatch,
                                      module_and_vars):
    """--detector yolo_tiny / yolo_v3 force the variant regardless of the
    weight-file auto-detection path."""
    from gaitlab.nn import yolo
    from gaitlab.pipeline import detect

    module, variables = module_and_vars
    path = str(tmp_path / "yolov3-tiny.weights")
    yolo.save_darknet_weights(path, variables)
    monkeypatch.setenv("GAITLAB_YOLO_WEIGHTS", path)
    det = detect.get_detector("yolo_tiny", batch=2)
    assert det.variant == "tiny"
    # forcing v3 on a tiny file must fail loudly (wrong float count)
    with pytest.raises(ValueError):
        detect.get_detector("yolo_v3", batch=2)


def test_get_detector_forced_variant_picks_matching_asset(
        tmp_path, monkeypatch, module_and_vars):
    """Asset-dir resolution honours a forced variant: with BOTH
    `yolov3.weights` and `yolov3-tiny.weights` present, `yolo_tiny` must
    load the tiny file (not the full one the unforced search prefers),
    and `yolo_v3` with only a tiny file present must fall back like the
    no-weights case instead of failing the darknet import."""
    from gaitlab.nn import yolo
    from gaitlab.pipeline import detect, fetch

    module, variables = module_and_vars
    tiny_path = tmp_path / "yolov3-tiny.weights"
    yolo.save_darknet_weights(str(tiny_path), variables)
    # a decoy full-v3 file (wrong float count for tiny; first in the
    # unforced search order)
    (tmp_path / "yolov3.weights").write_bytes(b"\0" * 2048)

    monkeypatch.delenv("GAITLAB_YOLO_WEIGHTS", raising=False)
    monkeypatch.delenv("GAITLAB_DETECTOR_MODEL", raising=False)
    monkeypatch.setattr(fetch, "ASSET_DIR", str(tmp_path))

    det = detect.get_detector("yolo_tiny", batch=2)
    assert det.variant == "tiny"

    (tmp_path / "yolov3.weights").unlink()
    det = detect.get_detector("yolo_v3", batch=2)
    assert isinstance(det, detect.MedianBackgroundDetector)


def test_demo_runner_kwargs_cap_buckets():
    """--grnet_batch_size caps the runner bucket set (demo.py:415-416)."""
    from gaitlab.cli import demo

    a = demo.build_parser().parse_args(["--grnet_batch_size", "128"])
    assert demo._runner_kwargs(a) == {"buckets": (32, 64, 128)}
    assert demo._runner_kwargs(demo.build_parser().parse_args([])) == {}


def test_demo_precision_flag_threads_to_runner():
    """--precision passes through to GRNetRunner (both CLIs)."""
    from gaitlab.cli import batch_generation, demo

    a = demo.build_parser().parse_args(["--precision", "float32"])
    assert demo._runner_kwargs(a) == {"precision": "float32"}
    a = demo.build_parser().parse_args(
        ["--precision", "high", "--grnet_batch_size", "64"])
    assert demo._runner_kwargs(a) == {"buckets": (32, 64),
                                      "precision": "high"}
    # batch_generation parses the same choices and defaults to None
    b = batch_generation.build_parser().parse_args(
        ["--vid_folder", "v", "--bbox_path", "b", "--outpath", "o",
         "--precision", "float32"])
    assert b.precision == "float32"
