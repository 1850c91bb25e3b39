"""Flag-compatible demo CLI: single video -> tracked people -> GRNet ->
smoothed SMPL params / 3D joints -> pkl (+ optional rendered video).

Mirrors /root/reference/demo.py:43-461 flag-for-flag and schema-for-schema:
same 23 CLI flags (demo.py:392-457), same output pkl dict per person
(pred_cam, orig_cam, verts, pose, betas, joints3d, joints2d, bboxes,
frame_ids — demo.py:211-267), same filename de-dup counter. The compute
path is the TPU pipeline: device crop+normalize, bucketed jitted
GRNet+SMPL, scan-based 1-euro smoothing with one batched SMPL re-eval.

Differences by design (TPU-native, documented in README):
  * detector: the external YOLOv3 `multi_person_tracker` is replaced by a
    pluggable detector (default: median-background for static cameras) +
    in-repo SORT; `--tracking_path` precomputed tracklets work unchanged.
  * rendering uses the in-repo software renderer (no EGL/GL dependency).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
import sys
import time

import joblib
import numpy as np

MIN_NUM_FRAMES = 25  # reference demo.py:41


def build_parser() -> argparse.ArgumentParser:
    """The reference's exact argparse surface (demo.py:392-457)."""
    p = argparse.ArgumentParser()
    p.add_argument("--vid_file", type=str, default="",
                   help="input video path or youtube link")
    p.add_argument("--cfg", type=str, default="configs/config_grnet.yaml",
                   help="configuration file for pretrained ckpt.")
    p.add_argument("--ckpt", type=str, default="",
                   help="path to the pretrained checkpoint.")
    p.add_argument("--output_folder", type=str, default="output/",
                   help="output folder to write results")
    p.add_argument("--detector", type=str, default="yolo",
                   choices=["yolo", "yolo_tiny", "yolo_v3", "median_bg",
                            "dnn"],
                   help="object detector to be used for bbox tracking "
                        "(yolo auto-detects the variant from the weight "
                        "file; yolo_tiny/yolo_v3 force one)")
    p.add_argument("--yolo_img_size", type=int, default=416,
                   help="input image size for yolo detector")
    p.add_argument("--tracker_batch_size", type=int, default=12,
                   help="batch size of object detector used for bbox tracking")
    p.add_argument("--grnet_batch_size", type=int, default=450,
                   help="batch size of VIBE")
    p.add_argument("--display", action="store_true",
                   help="visualize the results of each step during demo")
    p.add_argument("--mesh_render", action="store_true",
                   help="enable final video rendering of human mesh.")
    p.add_argument("--wireframe", action="store_true",
                   help="render all meshes as wireframes.")
    p.add_argument("--sideview", action="store_true",
                   help="render an additional side viewpoint.")
    p.add_argument("--save_obj", action="store_true",
                   help="save results as .obj files.")
    p.add_argument("--smooth", action="store_true",
                   help="smooth the results to prevent jitter")
    p.add_argument("--smooth_min_cutoff", type=float, default=0.004,
                   help="one euro filter min cutoff.")
    p.add_argument("--smooth_beta", type=float, default=0.7,
                   help="one euro filter beta.")
    p.add_argument("--tracking_path", type=str, default=None,
                   help="path to precomputed tracking results.")
    p.add_argument("--img_folder", type=str, default=None)
    p.add_argument("--joint_type", type=str, default="spin",
                   help="output 3D joint format.")
    p.add_argument("--save_vid", action="store_false",
                   help="save output video to output folder.")
    p.add_argument("--cpu_only", action="store_true",
                   help="run on CPU instead of the accelerator.")
    p.add_argument("--smpl_model", type=str, default=None,
                   help="path to SMPL model pkl/npz (extension flag; "
                        "defaults to data/smpl_data per config).")
    p.add_argument("--stream", action="store_true",
                   help="decode frames straight from the video (no PNG "
                        "frame folder; extension flag). Requires "
                        "--no rendering/display: combine with "
                        "--save_vid off (pass --save_vid) or it falls "
                        "back to the folder pipeline.")
    p.add_argument("--onepass", action="store_true",
                   help="single-decode pipeline (extension flag): detect, "
                        "track, crop and run the model in ONE streaming "
                        "pass over the video (gaitlab.pipeline.stream) — "
                        "~2x sustained fps on decode-bound hosts. Implies "
                        "--stream semantics; occlusion gaps bridge at the "
                        "smooth_tracking-equivalent operating point.")
    p.add_argument("--precision", type=str, default=None,
                   choices=["high", "float32", "default"],
                   help="matmul precision (extension flag): default is "
                        "the accuracy-qualified mixed mode (backbone "
                        "'high' + head single-pass bf16, 0.35 mm "
                        "worst-case MPJPE); 'float32' = exact torch "
                        "parity; 'default' = fast single-pass bf16 "
                        "(~14 mm, error-tolerant bulk only). "
                        "docs/PRECISION.json has the full study.")
    p.add_argument("--parallel", type=str, default=None,
                   choices=["dp", "pp"],
                   help="multi-chip strategy (extension flag): 'dp' "
                        "shards frame batches over all local devices "
                        "(zero inter-chip bytes — the production choice); "
                        "'pp' runs a 2-stage GPipe pipeline "
                        "(backbone group | head+SMPL group, ~3 MB/frame "
                        "boundary traffic — wins only when stage weights "
                        "exceed one chip's HBM or batch-1 latency must "
                        "shrink below one chip's forward; "
                        "docs/PERFORMANCE.md §Scaling).")
    return p


def load_model(args, cfg, init_img: int = 224):
    """GRNet + weights. Torch checkpoints are converted on the fly via
    gaitlab.weights.torch_import (the reference's 3 remap rules).
    init_img != 224 builds the cheap dryrun/test-sized trunk (see
    GRNet.create) — pair with GRNetRunner(crop_size=init_img)."""
    import jax

    from gaitlab.body import smpl as body_smpl
    from gaitlab.nn.grnet import GRNet
    from gaitlab.weights import torch_import

    smpl_params = None
    smpl_path = args.smpl_model
    if smpl_path is None:
        from gaitlab.config import SMPL_DATA_DIR

        cand = osp.join(SMPL_DATA_DIR, "SMPL_NEUTRAL.pkl")
        smpl_path = cand if osp.isfile(cand) else None
    if smpl_path:
        smpl_params = body_smpl.load_smpl_params(smpl_path)
        extra = osp.join(osp.dirname(smpl_path), "J_regressor_extra.npy")
        if osp.isfile(extra):
            smpl_params = body_smpl.with_extra_regressor(smpl_params, extra)
    else:
        print("WARNING: no SMPL model file found; using synthetic SMPL "
              "parameters (outputs are structurally valid, not meaningful).")

    model = GRNet.create(smpl_params=smpl_params, joint_mode="spin2")

    if args.ckpt and osp.isfile(args.ckpt):
        state = torch_import.load_torch_file(args.ckpt)
        gen = state.get("gen_state_dict", state)
        variables, missing, unused = torch_import.import_grnet_ckpt(
            gen, model.variables)
        if missing:
            print(f"WARNING: {len(missing)} model params not in checkpoint "
                  f"(e.g. {missing[:3]})")
        model.variables = variables
        perf = state.get("performance", None)
        if perf is not None:
            print(f"Performance of pretrained model on 3DPW: {perf}")
    elif args.ckpt:
        raise FileNotFoundError(f"checkpoint not found: {args.ckpt}")
    else:
        print("WARNING: --ckpt not given; running with random weights.")
    return model


def run_tracking(args, image_folder, video_file=None):
    """Detection + SORT. With video_file set (--stream), frames stream
    straight from the container in chunks; otherwise the frame folder is
    loaded like the reference (demo.py:89-97)."""
    import joblib as jl
    import numpy as np

    from gaitlab.pipeline import detect, tracks, video

    trackpath = args.tracking_path
    if trackpath and osp.isfile(trackpath):
        tracking_results = jl.load(trackpath)
        if 0 not in list(tracking_results.keys()):
            tracking_results = {0: tracking_results}
        print(f'Loaded precomputed tracklets from "{trackpath}"')
    elif video_file is not None:
        detector = detect.get_detector(
            args.detector, input_size=args.yolo_img_size,
            batch=args.tracker_batch_size)
        if isinstance(detector, detect.MedianBackgroundDetector):
            head = []
            got = 0
            for chunk in video.VideoChunkReader(video_file, chunk=64):
                head.append(chunk)
                got += len(chunk)
                if got >= 64:
                    break
            detector.fit(np.concatenate(head, axis=0))

        def det_stream():
            for chunk in video.VideoChunkReader(video_file, chunk=64,
                                                reuse_buffers=True):
                yield from detector(chunk)

        tracking_results = tracks.track_video(det_stream())
    else:
        # chunked like the stream path: never materialise the whole clip
        # (a 2000-frame 1080p folder is ~12 GB as one array)
        files = video.list_image_files(image_folder)
        detector = detect.get_detector(
            args.detector, input_size=args.yolo_img_size,
            batch=args.tracker_batch_size)
        if isinstance(detector, detect.MedianBackgroundDetector):
            # calibrate on frames sampled ACROSS the clip (random access is
            # free on a folder): a head-of-clip sample would bake a person
            # standing still in the first seconds into the background
            idx = np.unique(np.linspace(0, len(files) - 1,
                                        min(60, len(files))).astype(int))
            detector.fit(video.load_frames([files[i] for i in idx]))

        def det_folder_stream():
            for s0 in range(0, len(files), 64):
                yield from detector(video.load_frames(files[s0 : s0 + 64]))

        tracking_results = tracks.track_video(det_folder_stream())
    return tracks.smooth_tracking(tracking_results)


def _person_output(out, bboxes, frames, person_id, args, model,
                   orig_width, orig_height) -> dict:
    """run_track-style outputs -> reference pkl entry (demo.py:211-229):
    optional 1-euro smoothing, crop->image coordinate conversion, skeleton
    format conversion."""
    from gaitlab.body.joints import convert_kps
    from gaitlab.pipeline import coords, smoothing

    pred_cam, pred_verts = out["pred_cam"], out["verts"]
    pred_pose, pred_betas = out["pose"], out["betas"]
    pred_joints3d, smpl_joints2d = out["joints3d"], out["joints2d"]

    if args.smooth:
        print(f"Running smoothing on person {person_id}, "
              f"min_cutoff: {args.smooth_min_cutoff}, "
              f"beta: {args.smooth_beta}")
        pred_verts, pred_pose, pred_joints3d = smoothing.smooth_pose(
            pred_pose, pred_betas, smpl_params=model.smpl,
            min_cutoff=args.smooth_min_cutoff, beta=args.smooth_beta)

    orig_cam = coords.convert_crop_cam_to_orig_img(
        pred_cam, bboxes, orig_width, orig_height)
    joints2d_img = coords.convert_crop_coords_to_orig_img(
        bboxes, smpl_joints2d, crop_size=224)

    output_dict = {
        "pred_cam": pred_cam,
        "orig_cam": orig_cam,
        "verts": pred_verts,
        "pose": pred_pose,
        "betas": pred_betas,
        "joints3d": pred_joints3d,
        "joints2d": joints2d_img,
        "bboxes": bboxes,
        "frame_ids": frames,
    }
    if args.joint_type != "spin":
        # model emits spin2 (29 joints); reference converts to the
        # requested skeleton (demo.py:224-229 says 'spin' but the
        # kinectv2-mode SMPL yields spin2 — SURVEY.md §2A defect note).
        try:
            output_dict["joints3d"] = convert_kps(
                pred_joints3d, "spin2", args.joint_type)
        except KeyError:
            print(f"Unknown skeleton type: {args.joint_type}.")
    return output_dict



def _runner_kwargs(args) -> dict:
    """Map --grnet_batch_size (reference forward batch, demo.py:415-416)
    onto the runner's static bucket set: buckets are capped at the
    requested batch. The default 450 equals the default max bucket, so
    only an explicit override changes anything. --precision passes
    through to GRNetRunner (the accuracy-qualified default is "high" +
    head bf16; "float32" is exact torch parity)."""
    from gaitlab.pipeline.runner import DEFAULT_BUCKETS

    kw = {}
    gbs = int(getattr(args, "grnet_batch_size", 0) or 0)
    if gbs and gbs != 450:
        kw["buckets"] = tuple(sorted(
            {b for b in DEFAULT_BUCKETS if b < gbs} | {gbs}))
    prec = getattr(args, "precision", None)
    if prec:
        kw["precision"] = prec
    par = getattr(args, "parallel", None)
    if par:
        kw["parallel"] = par
    return kw


def main(args):
    from gaitlab.config import parse_args
    from gaitlab.pipeline import video
    from gaitlab.pipeline.runner import GRNetRunner
    from gaitlab.utils import StageTimer, profile_trace

    total_time = time.time()
    timer = StageTimer()
    cfg, _ = parse_args(args)

    if args.cpu_only:
        import jax

        jax.config.update("jax_platforms", "cpu")

    video_file = args.vid_file
    if not args.img_folder and video_file and "://" in video_file:
        # the reference's --vid_file help promises YouTube download
        # (lib/utils/demo_utils.py:88); this deployment is zero-egress,
        # so fail with the actionable message instead of "does not exist"
        sys.exit(
            f"Input video \"{video_file}\" is a URL. This build runs "
            "offline (no network egress): download the clip first "
            "(e.g. yt-dlp on a connected machine) and pass the local file.")
    if not args.img_folder and not osp.isfile(video_file):
        sys.exit(f"Input video \"{video_file}\" does not exist!")

    output_path = osp.join(
        args.output_folder,
        osp.basename(video_file if video_file else args.img_folder).replace(
            ".", "_"),
    )
    os.makedirs(output_path, exist_ok=True)

    onepass = (bool(args.onepass) and not args.img_folder
               and not args.tracking_path)
    stream = (bool(args.stream) or onepass) and not args.img_folder
    if stream and (args.save_vid or args.mesh_render or args.display):
        print("WARNING: --stream/--onepass need rendering/display off "
              "(pass --save_vid to disable video output); using the "
              "frame-folder pipeline.")
        stream = onepass = False

    if args.img_folder:
        image_folder = args.img_folder
        files = video.list_image_files(image_folder)
        num_frames = len(files)
        import cv2

        first = cv2.imread(files[0])
        orig_height, orig_width = first.shape[:2]
    elif stream:
        image_folder = None
        num_frames, _fps, orig_width, orig_height = video.get_video_info(
            video_file)
    else:
        with timer.stage("decode"):
            image_folder, num_frames, img_shape = video.video_to_images(
                video_file, return_info=True)
        orig_height, orig_width = img_shape[:2]

    print(f"Input video number of frames {num_frames}")

    if onepass:
        # single-decode pipeline: detect + track + crop + model in one
        # streaming pass over the video (gaitlab.pipeline.stream)
        from gaitlab.pipeline import detect
        from gaitlab.pipeline import stream as stream_mod

        model = load_model(args, cfg)
        runner = GRNetRunner(model, bbox_scale=1.0, **_runner_kwargs(args))
        grnet_time = time.time()
        profile_ctx = profile_trace()
        profile_ctx.__enter__()
        with timer.stage("onepass"):
            res = stream_mod.run_video_onepass(
                runner, video_file,
                detector=detect.get_detector(
                    args.detector, input_size=args.yolo_img_size,
                    batch=args.tracker_batch_size))
        grnet_results = {}
        # sorted union of frame ids — the same list the two-pass path gets
        # from smooth_tracking's second return (demo.py:99,236), so the
        # VIBE/Total FPS prints below count FRAMES, not tracks
        num_frames_list = sorted(
            {int(f) for r in res.values() for f in r["frames"]})
        for person_id, out in res.items():
            grnet_results[person_id] = _person_output(
                out, out["bboxes"], out["frames"], person_id, args, model,
                orig_width, orig_height)
        profile_ctx.__exit__(None, None, None)
        timer.stages["model"] = time.time() - grnet_time
        fps = len(num_frames_list) / (time.time() - grnet_time)
        print(f"VIBE FPS: {fps:.2f}")
        t = time.time() - total_time
        print(f"Total time spent: {t:.2f} seconds "
              f"(including model loading time).")
        print(f"Total FPS (including model loading time): "
              f"{len(num_frames_list) / t:.2f}.")
        return _save_and_render(args, grnet_results, num_frames_list,
                                image_folder, output_path, video_file,
                                model, timer, orig_width, orig_height)

    with timer.stage("tracking"):
        tracking_results, num_frames_list = run_tracking(
            args, image_folder, video_file=video_file if stream else None)
    for person_id in list(tracking_results.keys()):
        if tracking_results[person_id]["frames"].shape[0] < MIN_NUM_FRAMES:
            del tracking_results[person_id]

    model = load_model(args, cfg)
    runner = GRNetRunner(model, bbox_scale=1.0, **_runner_kwargs(args))
    image_files = (np.array(video.list_image_files(image_folder))
                   if image_folder else None)

    print("Running Model on each tracklet...")
    grnet_time = time.time()
    grnet_results = {}
    profile_ctx = profile_trace()
    profile_ctx.__enter__()
    for person_id in list(tracking_results.keys()):
        bboxes = np.array(tracking_results[person_id]["bbox"], np.float32)
        frames = np.asarray(tracking_results[person_id]["frames"])
        if image_files is None:  # --stream: decode straight from the video
            source = video.VideoChunkReader(video_file, frame_ids=frames,
                                            reuse_buffers=True)
        else:
            source = list(image_files[frames])

        out = runner.run_track(source, bboxes)
        grnet_results[person_id] = _person_output(
            out, bboxes, frames, person_id, args, model,
            orig_width, orig_height)

    profile_ctx.__exit__(None, None, None)
    timer.stages["model"] = time.time() - grnet_time
    fps = len(num_frames_list) / (time.time() - grnet_time)
    print(f"VIBE FPS: {fps:.2f}")
    t = time.time() - total_time
    print(f"Total time spent: {t:.2f} seconds (including model loading time).")
    print(f"Total FPS (including model loading time): "
          f"{len(num_frames_list) / t:.2f}.")

    return _save_and_render(args, grnet_results, num_frames_list,
                            image_folder, output_path, video_file,
                            model, timer, orig_width, orig_height)


def _save_and_render(args, grnet_results, num_frames_list, image_folder,
                     output_path, video_file, model, timer,
                     orig_width, orig_height):
    """Shared tail of the demo: pkl dump, --save_obj, overlay render,
    frame-folder cleanup, stage-timing report (demo.py:255-387)."""
    ckpt_base = osp.basename(args.ckpt).split(".")[0] if args.ckpt else "grnet"
    pklname = ckpt_base + ".pkl"
    idx = sum(1 for f in os.listdir(output_path)
              if ckpt_base in f and f.endswith(".pkl"))
    pklname = pklname if not idx else f"{ckpt_base}{idx}.pkl"
    pklpath = osp.join(output_path, pklname)
    print(f'Saving complete output results to "{pklpath}".')
    joblib.dump(grnet_results, pklpath)

    if args.save_obj and grnet_results:
        # per-person per-frame meshes, reference naming
        # (rendered/{person:04d}/{frame:06d}.obj — demo.py:333-338); written
        # here from the results dict so the flag works with or without
        # --mesh_render
        from gaitlab.render import export

        faces = model.smpl.faces
        if faces is None:
            print("WARNING: --save_obj needs SMPL faces; skipping.")
        else:
            for person_id, d in grnet_results.items():
                folder = osp.join(output_path, "rendered", f"{person_id:04d}")
                os.makedirs(folder, exist_ok=True)
                for verts, fid in zip(d["verts"], d["frame_ids"]):
                    export.export_obj(
                        osp.join(folder, f"{int(fid):06d}.obj"), verts, faces)
            print(f'Saved per-frame .obj meshes under '
                  f'"{osp.join(output_path, "rendered")}".')

    if args.save_vid and grnet_results:
        from gaitlab.render import overlay

        save_name = osp.join(output_path, pklname.split(".")[0] + ".mp4")
        timer.stages.setdefault("render", 0.0)
        t_render = time.time()
        overlay.render_video(
            grnet_results, num_frames_list, image_folder, save_name,
            orig_size=(orig_width, orig_height),
            mesh_render=args.mesh_render, wireframe=args.wireframe,
            sideview=args.sideview, joint_type=args.joint_type,
            smpl_faces=(model.smpl.faces
                        if model.smpl.faces is not None else None),
            display=args.display,
        )
        timer.stages["render"] = time.time() - t_render

    if not args.img_folder and image_folder:
        shutil.rmtree(image_folder)
    print("Stage timing:\n" + timer.report())
    print("================= END =================")
    return grnet_results


if __name__ == "__main__":
    main(build_parser().parse_args())


def main_cli():
    main(build_parser().parse_args())
