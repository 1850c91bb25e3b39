"""End-to-end integration test: synthetic video -> demo CLI -> pkl + video.

SURVEY.md §4 test strategy item (3): a short synthetic clip with a scripted
moving box gives a deterministic tracker input; the pipeline must produce
the reference output schema end to end. Runs on the virtual CPU backend
with small model buckets to keep compile time down.
"""

import os
import os.path as osp

import joblib
import numpy as np
import pytest


def make_synthetic_video(path: str, n: int = 40, w: int = 320, h: int = 240,
                         fps: float = 20.0) -> None:
    import cv2

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(0)
    bg = rng.integers(40, 70, size=(h, w, 3)).astype(np.uint8)
    for i in range(n):
        frame = bg.copy()
        x = 20 + 4 * i
        cv2.rectangle(frame, (x, 40), (x + 40, 200), (210, 190, 180), -1)
        cv2.circle(frame, (x + 20, 55), 12, (200, 170, 160), -1)
        writer.write(frame)
    writer.release()


@pytest.mark.slow
def test_demo_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    from gaitlab.cli import demo

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid)
    out_dir = str(tmp_path / "out")

    args = demo.build_parser().parse_args([
        "--vid_file", vid,
        "--output_folder", out_dir,
        "--joint_type", "kinectv2",
        "--smooth",
        "--save_obj",
        "--display",  # headless here: must warn-and-continue, not crash
        "--cfg", "/root/reference/configs/config_grnet.yaml",
    ])
    results = demo.main(args)

    assert len(results) >= 1
    person = next(iter(results.values()))
    n = person["frame_ids"].shape[0]
    assert n > 25
    assert person["pred_cam"].shape == (n, 3)
    assert person["orig_cam"].shape == (n, 4)
    assert person["verts"].shape == (n, 6890, 3)
    assert person["pose"].shape == (n, 72)
    assert person["betas"].shape == (n, 10)
    assert person["joints3d"].shape == (n, 25, 3)  # kinectv2
    assert person["joints2d"].shape[0] == n
    assert person["bboxes"].shape == (n, 4)
    assert np.all(np.isfinite(person["joints3d"]))

    # pkl written with the reference naming scheme
    run_dir = osp.join(out_dir, "walk_mp4")
    pkls = [f for f in os.listdir(run_dir) if f.endswith(".pkl")]
    assert pkls, os.listdir(run_dir)
    loaded = joblib.load(osp.join(run_dir, pkls[0]))
    assert set(loaded.keys()) == set(results.keys())

    # rendered video written (save_vid defaults True via store_false)
    vids = [f for f in os.listdir(run_dir) if f.endswith(".mp4")]
    assert vids, os.listdir(run_dir)

    # --save_obj wrote per-person per-frame meshes with the reference
    # naming (rendered/{person:04d}/{frame:06d}.obj, demo.py:333-338)
    pid = next(iter(results.keys()))
    obj_dir = osp.join(run_dir, "rendered", f"{pid:04d}")
    objs = sorted(os.listdir(obj_dir))
    assert len(objs) == n and objs[0].endswith(".obj")
    with open(osp.join(obj_dir, objs[0])) as f:
        head = f.readline()
    assert head.startswith("v ")


@pytest.mark.slow
def test_demo_cli_multiperson(tmp_path, monkeypatch):
    """BASELINE config #4: multi-person video, variable track lengths."""
    import cv2

    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    from gaitlab.cli import demo

    vid = str(tmp_path / "two.mp4")
    w, h, n = 320, 240, 44
    writer = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 20.0,
                             (w, h))
    rng = np.random.default_rng(1)
    bg = rng.integers(40, 70, size=(h, w, 3)).astype(np.uint8)
    for i in range(n):
        frame = bg.copy()
        x1 = 10 + 4 * i
        cv2.rectangle(frame, (x1, 30), (x1 + 35, 170), (210, 190, 180), -1)
        if i >= 8:  # second person enters later (shorter track)
            x2 = 290 - 4 * i
            cv2.rectangle(frame, (x2, 60), (x2 + 35, 210), (150, 200, 160), -1)
        writer.write(frame)
    writer.release()

    args = demo.build_parser().parse_args([
        "--vid_file", vid,
        "--output_folder", str(tmp_path / "out"),
        "--cfg", "/root/reference/configs/config_grnet.yaml",
    ])
    results = demo.main(args)
    assert len(results) >= 2  # both tracks survive MIN_NUM_FRAMES
    lens = sorted(r["frame_ids"].shape[0] for r in results.values())
    assert lens[0] > 25 and lens[-1] > lens[0]  # variable track lengths


@pytest.mark.slow
def test_demo_cli_precomputed_tracking(tmp_path, monkeypatch):
    """--tracking_path bypasses the detector (reference demo.py:83-87)."""
    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    from gaitlab.cli import demo

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid)
    frames = np.arange(40)
    bbox = np.stack([40 + 4.0 * frames + 20, np.full(40, 120.0),
                     np.full(40, 170.0), np.full(40, 170.0)], axis=1)
    trackfile = str(tmp_path / "tracks.pkl")
    joblib.dump({0: {"frames": frames, "bbox": bbox.astype(np.float32)}},
                trackfile)

    args = demo.build_parser().parse_args([
        "--vid_file", vid,
        "--output_folder", str(tmp_path / "out2"),
        "--tracking_path", trackfile,
        "--cfg", "/root/reference/configs/config_grnet.yaml",
    ])
    results = demo.main(args)
    assert 0 in results
    assert results[0]["joints3d"].shape[1:] == (29, 3)  # spin default->spin2


@pytest.mark.slow
def test_demo_cli_stream_mode(tmp_path, monkeypatch):
    """--stream (no PNG frame folder) produces the same joints as the
    folder pipeline."""
    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    from gaitlab.cli import demo

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid)

    base = ["--vid_file", vid, "--cfg",
            "/root/reference/configs/config_grnet.yaml"]
    args_folder = demo.build_parser().parse_args(
        base + ["--output_folder", str(tmp_path / "o1"), "--save_vid"])
    res_folder = demo.main(args_folder)

    args_stream = demo.build_parser().parse_args(
        base + ["--output_folder", str(tmp_path / "o2"), "--save_vid",
                "--stream"])
    res_stream = demo.main(args_stream)

    assert set(res_stream.keys()) == set(res_folder.keys())
    for pid in res_folder:
        np.testing.assert_array_equal(res_stream[pid]["frame_ids"],
                                      res_folder[pid]["frame_ids"])
        np.testing.assert_allclose(res_stream[pid]["joints3d"],
                                   res_folder[pid]["joints3d"], atol=2e-3)
