"""Image-folder tracking must stream in chunks, never materialising the
whole clip (a 2000-frame 1080p folder is ~12 GB as one array). Regression
for the round-2 whole-video load in cli/demo.run_tracking."""

import numpy as np
import pytest


@pytest.fixture()
def image_folder(tmp_path):
    """130 tiny frames (> 2 chunks of 64) with one moving bright square."""
    import cv2

    rng = np.random.default_rng(7)
    bg = rng.integers(40, 70, size=(120, 240, 3)).astype(np.uint8)
    folder = tmp_path / "frames"
    folder.mkdir()
    for i in range(130):
        frame = bg.copy()
        x = 10 + i
        cv2.rectangle(frame, (x, 20), (x + 30, 100), (210, 190, 180), -1)
        cv2.imwrite(str(folder / f"{i:06d}.png"), frame)
    return str(folder)


def test_folder_tracking_is_chunked(image_folder, monkeypatch):
    from gaitlab.cli import demo
    from gaitlab.pipeline import video

    max_loaded = {"n": 0}
    orig = video.load_frames

    def counting(paths, **kw):
        max_loaded["n"] = max(max_loaded["n"], len(list(paths)))
        return orig(paths, **kw)

    monkeypatch.setattr(video, "load_frames", counting)
    args = demo.build_parser().parse_args(
        ["--vid_file", "unused.mp4", "--img_folder", image_folder,
         "--detector", "median_bg"])
    tracking, num_frames_list = demo.run_tracking(args, image_folder)

    assert max_loaded["n"] <= 64, "folder path must load <=chunk frames"
    assert len(tracking) >= 1
    pid = max(tracking, key=lambda k: len(tracking[k]["frames"]))
    fr = tracking[pid]["frames"]
    assert len(fr) >= 100, "the walker must be tracked across chunks"
    assert np.all(np.diff(fr) >= 1)
