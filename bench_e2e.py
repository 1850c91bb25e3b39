"""End-to-end sustained throughput benchmark: video -> 3D joints, per stage.

The north-star metric (BASELINE.md): >= 300 fps/chip *end-to-end* on real
hardware, not just the model loop. Measured on a 2000-frame 1080p clip so
one-time costs (compile, background model) amortize out. Three pipeline
architectures are compared:

1. **reference-compatible** — the reference's exact flow
   (/root/reference/demo.py): video -> PNG frame folder (ffmpeg-style,
   demo_utils.py:105-134) -> detection+tracking over the folder -> model
   loop re-decoding the PNGs -> postproc. The PNG round trip alone runs at
   ~4 fps for 1080p (PNG encode dominates): this architecture cannot reach
   the target no matter how fast the chip is.
2. **streaming (TPU-native, two-pass)** — pipeline/video.VideoChunkReader
   decodes H.264 straight into tracking and then AGAIN into GRNetRunner's
   streamed host-crop -> H2D -> bucketed forward -> D2H pipeline; the
   filesystem is never touched but the video decodes twice.
3. **one-pass** — pipeline/stream.run_video_onepass: ONE decode feeding
   detect -> SORT -> crop -> model incrementally (demo --onepass).

Model variants: "joints" fetches theta+kp_3d+kp_2d (~1 KB/frame D2H — the
clinical batch_generation contract); "full" adds the 6890-vertex mesh
(82 KB/frame — the demo/render contract). D2H through this container's
tunneled TPU runs ~30 MB/s so they differ here; on a locally-attached
chip they converge.

Timing discipline: stage walls end at real data materialization
(np.asarray of outputs) — through the axon tunnel `block_until_ready`
lies, but a completed D2H cannot.

Writes docs/BENCH_E2E.json and prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

import numpy as np

N_FRAMES = 2000
W, H = 1920, 1080          # reference batch_generation operating point
WARMUP_FRAMES = 256        # compile all buckets before the measured run
CACHE = osp.expanduser("~/.cache/gaitlab/bench")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_clip(path: str, n: int = N_FRAMES) -> None:
    """Synthetic corridor-walk clip: static background + moving person."""
    import cv2

    rng = np.random.default_rng(0)
    bg = rng.integers(35, 75, size=(H, W, 3)).astype(np.uint8)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 20.0,
                             (W, H))
    for i in range(n):
        frame = bg.copy()
        x = int(100 + (W - 400) * (0.5 + 0.5 * np.sin(i / 150.0)))
        y = 300 + int(30 * np.sin(i / 7.0))
        cv2.rectangle(frame, (x, y), (x + 130, y + 520), (205, 185, 175), -1)
        cv2.circle(frame, (x + 65, y + 60), 45, (195, 165, 155), -1)
        writer.write(frame)
    writer.release()


def main():
    import jax

    from gaitlab.body.joints import convert_kps
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import coords, detect, tracks, video
    from gaitlab.pipeline.loader import PrefetchLoader, load_frames
    from gaitlab.pipeline.runner import GRNetRunner

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    os.makedirs(CACHE, exist_ok=True)
    clip = osp.join(CACHE, f"e2e_{N_FRAMES}_{W}x{H}.mp4")
    if not osp.isfile(clip):
        log("building benchmark clip (one-time)...")
        make_clip(clip)

    stages: dict[str, float] = {}

    # ---- host<->device link probe ----------------------------------------
    # The tunneled v5e link runs ~30-40 MB/s BOTH directions (a bare
    # device_put timing shows ~GB/s because it returns before the transfer
    # completes — force materialization with a dependent reduce). The link,
    # not the chip, bounds crop-fed throughput here: 224² uint8 crops are
    # ~147 KB/frame. Record the measured bandwidth and implied ceiling so
    # every number below carries its infrastructure context.
    import jax.numpy as jnp

    reduce_fn = jax.jit(lambda x: x.astype(jnp.float32).sum())
    probe = np.random.default_rng(0).integers(
        0, 255, size=(16, 1024, 1024), dtype=np.uint8)
    float(reduce_fn(jax.device_put(probe[:1])))  # compile
    t0 = time.perf_counter()
    float(reduce_fn(jax.device_put(probe)))
    h2d_mbps = 16.0 / (time.perf_counter() - t0)
    dvc = jax.device_put(probe)
    dvc.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(dvc)
    d2h_mbps = 16.0 / (time.perf_counter() - t0)
    crop_bytes = 224 * 224 * 3
    h2d_ceiling_fps = h2d_mbps * 1e6 / crop_bytes
    log(f"link: H2D {h2d_mbps:.0f} MB/s, D2H {d2h_mbps:.0f} MB/s -> "
        f"crop-feed ceiling {h2d_ceiling_fps:.0f} fps")

    # ---- 1. reference-compatible: video -> PNG folder (cached + timed) --
    folder = osp.join(CACHE, f"e2e_{N_FRAMES}_frames")
    decode_time_file = osp.join(folder, "_decode_seconds.json")
    if not osp.isfile(decode_time_file):
        t0 = time.perf_counter()
        video.video_to_images(clip, img_folder=folder)
        dt = time.perf_counter() - t0
        with open(decode_time_file, "w") as f:
            json.dump({"seconds": dt}, f)
    stages["decode_png"] = json.load(open(decode_time_file))["seconds"]
    paths = video.list_image_files(folder)
    n = len(paths)
    log(f"decode_png: {n} frames, {stages['decode_png']:.1f}s "
        f"({n / stages['decode_png']:.0f} fps)")

    # ---- tracking over the PNG folder (streamed chunks) -----------------
    t0 = time.perf_counter()
    sample = load_frames(paths[:: max(1, n // 40)])
    detector = detect.MedianBackgroundDetector().fit(sample)

    def det_stream():
        for chunk in PrefetchLoader(paths, chunk=64):
            yield from detector(chunk)

    tracking = tracks.track_video(det_stream())
    stages["track_png"] = time.perf_counter() - t0
    pid = max(tracking, key=lambda k: len(tracking[k]["frames"]))
    bboxes = np.asarray(tracking[pid]["bbox"], np.float32)
    frame_ids = np.asarray(tracking[pid]["frames"])
    track_paths = [paths[i] for i in frame_ids]
    nt = len(bboxes)
    log(f"track_png: {nt}-frame track, {stages['track_png']:.1f}s "
        f"({n / stages['track_png']:.0f} fps)")

    # ---- model loop, from PNGs and from the video stream ----------------
    model = GRNet.create()
    buckets = (128, 256)  # static shapes the measured runs will hit
    runners = {
        "joints": GRNetRunner(model, fetch=("theta", "kp_3d", "kp_2d"),
                              buckets=buckets),
        "full": GRNetRunner(model, buckets=buckets),
    }
    # warmup compiles every bucket once (128+256 = 384 frames)
    wu = min(384, nt)
    for r in runners.values():
        r.run_track(track_paths[:wu], bboxes[:wu])

    out = None
    for variant, runner in runners.items():
        t0 = time.perf_counter()
        o = runner.run_track(track_paths, bboxes)
        stages[f"model_png_{variant}"] = time.perf_counter() - t0
        if variant == "joints":
            out = o
        log(f"model_png[{variant}]: {nt} frames, "
            f"{stages[f'model_png_{variant}']:.1f}s "
            f"({nt / stages[f'model_png_{variant}']:.0f} fps)")

    # ---- 2. streaming architecture: no filesystem -----------------------
    t0 = time.perf_counter()
    head = []
    for chunk in video.VideoChunkReader(clip, chunk=64):
        head.append(chunk)
        if sum(len(c) for c in head) >= 64:
            break
    sdetector = detect.MedianBackgroundDetector().fit(
        np.concatenate(head, axis=0))

    def det_stream_vid():
        for chunk in video.VideoChunkReader(clip, chunk=64,
                                            reuse_buffers=True):
            yield from sdetector(chunk)

    tracking_s = tracks.track_video(det_stream_vid())
    stages["track_stream"] = time.perf_counter() - t0
    pid_s = max(tracking_s, key=lambda k: len(tracking_s[k]["frames"]))
    bboxes_s = np.asarray(tracking_s[pid_s]["bbox"], np.float32)
    ids_s = np.asarray(tracking_s[pid_s]["frames"])
    nts = len(bboxes_s)
    log(f"track_stream: {nts}-frame track, {stages['track_stream']:.1f}s "
        f"({n / stages['track_stream']:.0f} fps)")

    for variant, runner in runners.items():
        t0 = time.perf_counter()
        o = runner.run_track(
            video.VideoChunkReader(clip, frame_ids=ids_s, chunk=32,
                                   reuse_buffers=True),
            bboxes_s)
        stages[f"model_stream_{variant}"] = time.perf_counter() - t0
        log(f"model_stream[{variant}]: {nts} frames, "
            f"{stages[f'model_stream_{variant}']:.1f}s "
            f"({nts / stages[f'model_stream_{variant}']:.0f} fps)")

    # ---- 3. one-pass architecture: ONE decode, detect+track+crop+model ---
    # (gaitlab.pipeline.stream: SORT is causal, so the whole pipeline runs
    # in a single streaming pass — the two-pass numbers above decode the
    # video twice, and decode is the host bottleneck at 1 core)
    from gaitlab.pipeline import stream as stream_mod

    for variant, runner in runners.items():
        t0 = time.perf_counter()
        res = stream_mod.run_video_onepass(runner, clip)
        stages[f"onepass_{variant}"] = time.perf_counter() - t0
        n1 = max(len(r["frames"]) for r in res.values()) if res else 0
        log(f"onepass[{variant}]: {n1}-frame track, "
            f"{stages[f'onepass_{variant}']:.1f}s "
            f"({n / stages[f'onepass_{variant}']:.0f} fps)")

    # ---- device-bound variant: frames already in RAM ---------------------
    # isolates crop -> H2D -> forward -> D2H from host video decode (this
    # container has a single CPU core - see summary host_cores - so both
    # architectures above are decode-bound; production TPU hosts have
    # ~100+ cores and parallel/overlapped decode)
    mem_n = 450
    mem_frames = np.stack([c for ch in video.VideoChunkReader(
        clip, frame_ids=ids_s[:mem_n], chunk=64) for c in ch])
    for variant, runner in runners.items():
        runner.run_track(mem_frames[:wu], bboxes_s[:wu])  # warm
        t0 = time.perf_counter()
        for _ in range(2):
            runner.run_track(mem_frames, bboxes_s[:mem_n])
        stages[f"model_mem_{variant}"] = (time.perf_counter() - t0) / 2
        log(f"model_mem[{variant}]: {mem_n} frames, "
            f"{stages[f'model_mem_{variant}']:.1f}s "
            f"({mem_n / stages[f'model_mem_{variant}']:.0f} fps)")

    # ---- postproc: coordinate + skeleton conversion ----------------------
    t0 = time.perf_counter()
    orig_cam = coords.convert_crop_cam_to_orig_img(
        out["pred_cam"], bboxes, W, H)
    joints2d_img = coords.convert_crop_coords_to_orig_img(
        bboxes, out["joints2d"], crop_size=224)
    kin = convert_kps(out["joints3d"], "spin2", "kinectv2")
    stages["postproc"] = time.perf_counter() - t0
    assert np.all(np.isfinite(kin)) and np.all(np.isfinite(orig_cam))
    assert joints2d_img.shape[0] == nt
    log(f"postproc: {stages['postproc'] * 1e3:.0f} ms")

    def e2e(decode_s, track_s, model_s, frames):
        return frames / (decode_s + track_s + model_s + stages["postproc"])

    summary = {
        "frames": n, "resolution": f"{W}x{H}",
        "device": str(dev.device_kind),
        "host_cores": os.cpu_count(),
        "link_MBps": {"h2d": round(h2d_mbps, 1), "d2h": round(d2h_mbps, 1)},
        "crop_feed_ceiling_fps": round(h2d_ceiling_fps, 1),
        "stages_s": {k: round(v, 2) for k, v in stages.items()},
        "model_mem_fps": {
            "joints": round(450 / stages["model_mem_joints"], 1),
            "full": round(450 / stages["model_mem_full"], 1),
        },
        "e2e_fps": {
            "reference_arch_joints": round(
                e2e(stages["decode_png"], stages["track_png"],
                    stages["model_png_joints"], nt), 1),
            "reference_arch_full": round(
                e2e(stages["decode_png"], stages["track_png"],
                    stages["model_png_full"], nt), 1),
            "streaming_joints": round(
                e2e(0.0, stages["track_stream"],
                    stages["model_stream_joints"], nts), 1),
            "streaming_full": round(
                e2e(0.0, stages["track_stream"],
                    stages["model_stream_full"], nts), 1),
            "onepass_joints": round(n / stages["onepass_joints"], 1),
            "onepass_full": round(n / stages["onepass_full"], 1),
        },
        "precision_mode": "high (0.24mm MPJPE worst-case, "
                          "docs/PRECISION.json)",
    }
    repo = osp.dirname(osp.abspath(__file__))
    with open(osp.join(repo, "docs", "BENCH_E2E.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(json.dumps(summary, indent=2))
    print(json.dumps({
        "metric": "e2e_video_to_joints_fps_per_chip",
        "value": summary["e2e_fps"]["onepass_joints"],
        "unit": "frames/s",
        "vs_baseline": round(
            summary["e2e_fps"]["onepass_joints"] / 300.0, 3),
    }))


if __name__ == "__main__":
    main()
