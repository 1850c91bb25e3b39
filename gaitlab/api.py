"""High-level Python API: one call from video to gait analysis.

The reference is CLI-only; this façade exposes the same pipeline as a
library so downstream clinical tooling can embed it:

    import gaitlab.api as gl
    results = gl.analyze_video("clip.mp4", ckpt="max-grnet.pth.tar")
    feats   = gl.gait_report(results)        # per-person gait features
"""

from __future__ import annotations

import os.path as osp
from typing import Optional

import numpy as np


def load_pipeline(ckpt: str = "", smpl_model: Optional[str] = None,
                  use_gait_feat: bool = False, precision: str = "float32",
                  mesh=None):
    """(model, runner) ready for repeated video analysis.

    precision: "float32" (default — exact torch parity) or "high" (the
    accuracy-qualified production mode: backbone bf16_3x with the PARE
    head at single-pass bf16 via the runner's head_precision="auto",
    0.35 mm worst-case MPJPE at ~2.1x the float32 throughput —
    docs/PRECISION.json)."""
    import argparse

    from gaitlab.cli.demo import load_model
    from gaitlab.pipeline.runner import GRNetRunner

    args = argparse.Namespace(ckpt=ckpt, smpl_model=smpl_model, cfg=None)
    model = load_model(args, cfg=None)
    if use_gait_feat:
        from gaitlab.nn.grnet import GRNet
        from gaitlab.weights import torch_import

        gmodel = GRNet.create(smpl_params=model.smpl, use_gait_feat=True)
        if ckpt and osp.isfile(ckpt):  # re-import weights into gait model
            state = torch_import.load_torch_file(ckpt)
            gen = state.get("gen_state_dict", state)
            gmodel.variables, _, _ = torch_import.import_grnet_ckpt(
                gen, gmodel.variables)
        model = gmodel
    runner = GRNetRunner(model, precision=precision, mesh=mesh)
    return model, runner


def analyze_video(
    vid_file: str,
    ckpt: str = "",
    smpl_model: Optional[str] = None,
    joint_type: str = "spin2",
    smooth: bool = True,
    tracking: Optional[dict] = None,
    runner=None,
    fps: Optional[float] = None,
    onepass: bool = False,
) -> dict:
    """Video -> {person_id: reference-schema output dict} (demo pipeline
    without the CLI/file-system ceremony). `tracking` can supply
    precomputed tracklets; `runner` reuses a load_pipeline() result.

    onepass=True streams the whole pipeline over a SINGLE video decode
    (gaitlab.pipeline.stream.run_video_onepass — detect/track/crop/model
    fused; ~2x sustained fps on decode-bound hosts; occlusion gaps are
    bridged at the smooth_tracking-equivalent operating point, see the
    stream module docstring; `tracking`/`fps` are not supported there).
    """
    from gaitlab.body.joints import convert_kps
    from gaitlab.pipeline import coords, detect, smoothing, tracks, video

    if runner is None:
        _, runner = load_pipeline(ckpt=ckpt, smpl_model=smpl_model)
    model = runner.model

    if onepass:
        assert tracking is None and fps is None, \
            "onepass streams detection itself; precomputed tracking or " \
            "fps resampling need the two-pass path"
        from gaitlab.pipeline import stream as stream_mod

        _, _, w, h = video.get_video_info(vid_file)
        raw = stream_mod.run_video_onepass(runner, vid_file)
        per_track = {pid: (r, np.asarray(r["bboxes"], np.float32),
                           np.asarray(r["frames"]))
                     for pid, r in raw.items()}
    else:
        frames = np.stack(list(video.read_frames(vid_file, fps=fps)))
        h, w = frames.shape[1:3]

        if tracking is None:
            detector = detect.MedianBackgroundDetector()
            tracking = tracks.track_video(detector(frames))
        tracking, _ = tracks.smooth_tracking(tracking)
        per_track = {}
        for pid, tr in tracking.items():
            bboxes = np.asarray(tr["bbox"], np.float32)
            fidx = np.asarray(tr["frames"])
            per_track[pid] = (runner.run_track(frames[fidx], bboxes),
                              bboxes, fidx)

    results = {}
    for pid, (out, bboxes, fidx) in per_track.items():
        verts, pose, joints3d = out["verts"], out["pose"], out["joints3d"]
        if smooth:
            verts, pose, joints3d = smoothing.smooth_pose(
                pose, out["betas"], smpl_params=model.smpl)
        res = {
            "pred_cam": out["pred_cam"],
            "orig_cam": coords.convert_crop_cam_to_orig_img(
                out["pred_cam"], bboxes, w, h),
            "verts": verts,
            "pose": pose,
            "betas": out["betas"],
            "joints3d": (convert_kps(joints3d, "spin2", joint_type)
                         if joint_type not in ("spin", "spin2") else joints3d),
            "joints2d": coords.convert_crop_coords_to_orig_img(
                bboxes, out["joints2d"], 224),
            "bboxes": bboxes,
            "frame_ids": fidx,
        }
        results[pid] = res
    return results


def gait_report(results: dict, fps: float = 30.0,
                scorer=None) -> dict:
    """Per-person gait features (+ dementia score with a fitted scorer).

    `results` joints3d must be kinectv2 25-joint (pass
    joint_type='kinectv2' to analyze_video)."""
    from gaitlab.gait import classify

    report = {}
    for pid, r in results.items():
        j = np.asarray(r["joints3d"])
        if j.shape[1] != 25:
            from gaitlab.body.joints import convert_kps

            j = convert_kps(j, "spin2", "kinectv2")
        report[pid] = classify.score_clip(j, fitted=scorer, fps=fps)
    return report
