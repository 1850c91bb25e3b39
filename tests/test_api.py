"""High-level API: analyze_video + gait_report on a synthetic clip."""

import numpy as np
import pytest

from test_pipeline_e2e import make_synthetic_video


@pytest.mark.slow
def test_analyze_video_and_report(tmp_path, monkeypatch):
    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    import gaitlab.api as gl

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid)
    results = gl.analyze_video(vid, joint_type="kinectv2", smooth=False)
    assert len(results) >= 1
    person = next(iter(results.values()))
    assert person["joints3d"].shape[1:] == (25, 3)
    assert person["verts"].shape[1:] == (6890, 3)

    report = gl.gait_report(results, fps=20.0)
    feats = next(iter(report.values()))["features"]
    assert "walk_speed" in feats
    assert np.isfinite(feats["feature_vector"]).all()


@pytest.mark.slow
def test_analyze_video_onepass(tmp_path, monkeypatch):
    """onepass=True produces the same schema through the single-decode
    pipeline."""
    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    import gaitlab.api as gl

    vid = str(tmp_path / "walk.mp4")
    make_synthetic_video(vid, n=48)
    results = gl.analyze_video(vid, joint_type="kinectv2", smooth=False,
                               onepass=True)
    assert len(results) >= 1
    person = next(iter(results.values()))
    n = len(person["frame_ids"])
    assert n >= 25
    assert person["joints3d"].shape == (n, 25, 3)
    assert person["orig_cam"].shape == (n, 4)
    assert person["verts"].shape == (n, 6890, 3)
