"""Flag-compatible batch_generation CLI: folder of clips -> sharded
kinectv2 25-joint 3D database.

Mirrors /root/reference/batch_generation.py:180-387: same flags
(--vid_folder --bbox_path --outpath --pretrained_file), same tunables
(fps=20 extraction :253, MAX_seqlen=400 :34, MAX_VID=50 shard size :37,
frame-count alignment within MIN_FDIFF=10 :256-261), same sharded output
schema {vid_name, bbox, joints3D(kinectv2 25x3)} dumped as
`<outpath>_{k}.json` joblib files every 50 videos.

TPU-native extensions (documented, additive):
  * --num_shards / --shard_id: multi-host scale-out by video (DCN-level
    process sharding, SURVEY.md §2C — embarrassingly parallel, no
    collectives). With num_shards > 1 each worker writes
    `<outpath>.w{shard_id}_{k}.json`, so every worker can point at the
    SAME outpath (e.g. a shared filesystem) without colliding;
  * --resume: skip shard files that already exist (idempotent restarts);
  * --cpu_only / --crop_size: run on the CPU backend / at a dryrun-sized
    trunk (224 is the deployed operating point — other values are for
    tests and plumbing checks, mirroring GRNet.create(init_img=...));
  * --stream: decode clips straight from the container at the same
    fps-20 resample (pipeline/video.VideoChunkReader) instead of the
    reference's video->PNG-folder->re-decode round trip — identical frame
    selection, no filesystem churn (PNG extraction measures ~4 fps at
    1080p, see bench_e2e.py);
  * the runner fetches only kp_3d from the device — the database schema
    needs nothing else, and vertex readback is ~80x the joint traffic;
  * failed videos are recorded in `<outpath>_failed.json` instead of
    aborting the run (SURVEY.md §5 failure-detection plan).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
import time
from collections import defaultdict

import joblib
import numpy as np

from gaitlab.body.joints import convert_kps

# tunables (reference batch_generation.py:24-37)
MIN_FDIFF = 10
MAX_seqlen = 400
MAX_VID = 50
EXTRACT_FPS = 20


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--vid_folder", type=str, default="",
                   help="folder containing videos to process.")
    p.add_argument("--bbox_path", type=str, default="",
                   help="json file path, the precomputed bbox (.json).")
    p.add_argument("--outpath", type=str,
                   default=f"data/{time.strftime('%Y%m%d-%H%M%S')}",
                   help="output path to save generated 3D joints.")
    p.add_argument("--pretrained_file", type=str,
                   default="checkpoint/max-grnet.pth.tar",
                   help="path to the pretrained weights.")
    p.add_argument("--smpl_model", type=str, default=None,
                   help="path to SMPL model pkl/npz.")
    p.add_argument("--num_shards", type=int, default=1,
                   help="process-level sharding: total number of workers.")
    p.add_argument("--shard_id", type=int, default=0,
                   help="process-level sharding: this worker's index.")
    p.add_argument("--resume", action="store_true",
                   help="skip output shards that already exist.")
    p.add_argument("--stream", action="store_true",
                   help="decode straight from the video (no PNG folder).")
    p.add_argument("--precision", type=str, default=None,
                   choices=["high", "float32", "default"],
                   help="matmul precision (extension flag; see demo.py "
                        "--precision / docs/PRECISION.json).")
    p.add_argument("--cpu_only", action="store_true",
                   help="force the CPU backend (extension flag, matches "
                        "demo.py --cpu_only).")
    p.add_argument("--crop_size", type=int, default=224,
                   help="trunk input size; 224 is the deployed operating "
                        "point, other values build dryrun/test-sized "
                        "models (extension flag).")
    return p


def _sort_key(name: str):
    """Reference clip-name ordering (batch_generation.py:196) with a
    lexicographic fallback for other naming schemes."""
    try:
        return (0, int(name[1:4] + name[6:9] + name[11:14] + name[16:19]))
    except (ValueError, IndexError):
        return (1, name)


def run_grnet_on_frames(runner, img_dir: str, frames: np.ndarray,
                        bboxes: np.ndarray) -> dict:
    """Reference run_grnet_on_frame (batch_generation.py:289-371):
    scale=1.1 crops, spin2 -> kinectv2 joints."""
    from gaitlab.pipeline import video as video_mod

    paths = np.array(video_mod.list_image_files(img_dir))[frames]
    out = runner.run_track(list(paths), bboxes, scale=1.1)
    kp_3d = convert_kps(out["joints3d"], src="spin2", dst="kinectv2")
    return {"kp_3d": kp_3d.astype(np.float32)}


def _shard_path(outpath: str, out_ind: int, num_shards: int = 1,
                shard_id: int = 0) -> str:
    """Per-flush output file. Single worker keeps the reference naming
    `<outpath>_{k}.json` (batch_generation.py:276); multiple workers get
    worker-disjoint names so a shared outpath never collides."""
    assert outpath.endswith(".json")
    base = outpath[:-5]
    if num_shards > 1:
        return f"{base}.w{shard_id}_{out_ind}.json"
    return f"{base}_{out_ind}.json"


def _flush_db(db: dict, outfp: str, start_time: float):
    for k, v in db.items():
        if isinstance(v[0], np.ndarray):
            db[k] = np.concatenate(v, axis=0).astype(np.float32)
        else:
            db[k] = np.array(v)
        print(f"{k} shape: {db[k].shape}")
    rate = db["vid_name"].shape[0] / (time.time() - start_time)
    print(f"=====>>> Generation frame rate: {rate}.")
    joblib.dump(dict(db), outfp)
    print(f"Save database to {outfp}.")
    return outfp


def prepare_data(fv: str, vid_folder: str, outpath: str,
                 pretrained_file: str = None, smpl_model: str = None,
                 num_shards: int = 1, shard_id: int = 0,
                 resume: bool = False, debug: bool = False,
                 stream: bool = False, precision: str = None,
                 cpu_only: bool = False, crop_size: int = 224):
    """Reference prepare_data (batch_generation.py:180-287), TPU pipeline."""
    if cpu_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from gaitlab.cli.demo import load_model
    from gaitlab.pipeline import video as video_mod
    from gaitlab.pipeline.runner import GRNetRunner

    assert osp.isfile(fv), fv
    annos = joblib.load(fv)
    vidnames = sorted(os.listdir(vid_folder), key=_sort_key)
    vidnames = [v for i, v in enumerate(vidnames)
                if i % num_shards == shard_id]

    args = argparse.Namespace(ckpt=pretrained_file or "",
                              smpl_model=smpl_model, cfg=None)
    model = load_model(args, cfg=None, init_img=crop_size)
    # database schema stores only joints3D: skip the 6890-vertex readback
    rkw = {"precision": precision} if precision else {}
    runner = GRNetRunner(model, fetch=("kp_3d",), crop_size=crop_size,
                         **rkw)
    if not outpath.endswith(".json"):
        outpath = outpath + ".json"

    # shard granularity override for tests/ops (videos per output file;
    # the reference flushes every MAX_VID=50, batch_generation.py:37)
    max_vid = int(os.environ.get("GAITLAB_BG_MAXVID", MAX_VID))

    db = defaultdict(list)
    failed = []
    start = time.time()
    out_ind = 0
    for idx, vid_name in enumerate(vidnames):
        if idx % max_vid == 0 and idx > 0 and (len(vidnames) - idx) > 10:
            outfp = _shard_path(outpath, out_ind, num_shards, shard_id)
            if not (resume and osp.isfile(outfp)):
                _flush_db(db, outfp, start)
            out_ind += 1
            db = defaultdict(list)
            start = time.time()
        print("=" * 50 + f" process video {idx + 1}/{len(vidnames)} " + "=" * 50)
        if debug and idx > 5:
            break
        if resume and osp.isfile(
                _shard_path(outpath, out_ind, num_shards, shard_id)):
            continue  # shard already produced by a previous run
        if vid_name.split(".")[0] not in annos:
            print(f"Skip video {vid_name}, no precomputed 2D joints!")
            continue
        try:
            vid_path = osp.join(vid_folder, vid_name)
            bboxes = np.asarray(annos[vid_name.split(".")[0]], np.float32)
            frame_num = bboxes.shape[0]
            if stream:
                n_raw, fps_in, _, _ = video_mod.get_video_info(vid_path)
                keep = video_mod._fps_resample_indices(
                    n_raw, fps_in, EXTRACT_FPS)
                n_extracted = len(keep)
            else:
                img_dir = video_to_images_fps20(vid_path)
                img_files = video_mod.list_image_files(img_dir)
                n_extracted = len(img_files)
            assert abs(n_extracted - frame_num) < MIN_FDIFF, \
                f"frame mismatch: {n_extracted} vs {frame_num}"
            if n_extracted - frame_num != 0:
                # reference realigns by repeating the first bbox (:258-261)
                bboxes = np.repeat(bboxes[0, None, :], n_extracted, axis=0)
                frame_num = n_extracted
            if stream:
                reader = video_mod.VideoChunkReader(vid_path,
                                                    frame_ids=keep,
                                                    reuse_buffers=True)
                out = runner.run_track(reader, bboxes, scale=1.1)
                kp_3d = convert_kps(out["joints3d"], src="spin2",
                                    dst="kinectv2").astype(np.float32)
                outputs = {"kp_3d": kp_3d}
            else:
                outputs = run_grnet_on_frames(
                    runner, img_dir, np.arange(frame_num), bboxes)
            db["vid_name"].extend([vid_name.split(".")[0]] * frame_num)
            db["bbox"].append(bboxes.reshape(frame_num, 4))
            db["joints3D"].append(outputs["kp_3d"].reshape(frame_num, 25, 3))
            if not stream:
                shutil.rmtree(img_dir)
        except Exception as e:  # quarantine, don't abort the corpus run
            print(f"FAILED video {vid_name}: {e}")
            failed.append({"vid_name": vid_name, "error": str(e)})

    if len(db):
        _flush_db(db, _shard_path(outpath, out_ind, num_shards, shard_id),
                  start)
    if failed:
        failpath = outpath[:-5] + (f".w{shard_id}_failed.json"
                                   if num_shards > 1 else "_failed.json")
        joblib.dump(failed, failpath)
        print(f"{len(failed)} videos failed; manifest at {failpath}.")
    return out_ind + (1 if len(db) else 0)


def video_to_images_fps20(vid_path: str) -> str:
    from gaitlab.pipeline import video as video_mod

    return video_mod.video_to_images(vid_path, fps=EXTRACT_FPS)


def main(args):
    prepare_data(fv=args.bbox_path, vid_folder=args.vid_folder,
                 outpath=args.outpath, pretrained_file=args.pretrained_file,
                 smpl_model=args.smpl_model, num_shards=args.num_shards,
                 shard_id=args.shard_id, resume=args.resume,
                 stream=args.stream, precision=args.precision,
                 cpu_only=args.cpu_only, crop_size=args.crop_size)


if __name__ == "__main__":
    main(build_parser().parse_args())


def main_cli():
    main(build_parser().parse_args())
