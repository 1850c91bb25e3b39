"""End-to-end sustained throughput benchmark: video -> 3D joints, per stage.

The north-star metric (BASELINE.md): >= 300 fps/chip *end-to-end* on real
hardware, not just the model loop. Measured on a 2000-frame 1080p clip so
one-time costs (compile, background model) amortize out. Three pipeline
architectures are compared:

1. **one-pass** — pipeline/stream.run_video_onepass: ONE decode feeding
   detect -> SORT -> crop -> model incrementally (demo --onepass).
2. **streaming (TPU-native, two-pass)** — pipeline/video.VideoChunkReader
   decodes H.264 straight into tracking and then AGAIN into GRNetRunner's
   streamed host-crop -> H2D -> bucketed forward -> D2H pipeline; the
   filesystem is never touched but the video decodes twice.
3. **reference-compatible** — the reference's exact flow
   (/root/reference/demo.py): video -> PNG frame folder (ffmpeg-style,
   demo_utils.py:105-134) -> detection+tracking over the folder -> model
   loop re-decoding the PNGs -> postproc. The PNG round trip alone runs
   ~7 fps at 1080p: this architecture cannot reach the target on any
   chip. Skippable with GAITLAB_BENCH_SKIP_PNG=1 (cached stages reuse
   prior measurements).

Model variants: "joints" fetches theta+kp_3d+kp_2d (~1 KB/frame D2H — the
clinical batch_generation contract); "full" adds the 6890-vertex mesh
(82 KB/frame — the demo/render contract).

**Infrastructure honesty**: this container has ONE host core and a
tunneled TPU whose host<->device link moves ~20-40 MB/s each way AND
drifts by 2-3x within minutes (shared tunnel). The link is probed before
every section (forced-materialization timing — a bare device_put returns
before the transfer completes and shows fake GB/s) and each section's
probe is recorded next to its numbers; interpret cross-section
comparisons through those probes. Stage walls end at real data
materialization (np.asarray of outputs). Each main section runs THREE
times; the canonical number is the MEDIAN (all runs + their probes are
recorded — VERDICT r2 next-step #10).

**Roofline section** (VERDICT r2 next-step #4): per-stage standalone
capacities — host decode, detect, crop (all with frames in RAM), the
chip-side model rate with crops PRE-STAGED on device (a dependency-chain
loop the tunnel cannot pollute), and computed H2D/D2H caps — combined
into implied end-to-end fps at the measured link and at 1/10/40 GB/s,
for both this 1-core serial host and a production parallel host. This is
the measured bridge between the tunnel-bound sustained number and the
"chip-bound elsewhere" claim.

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
CACHE = osp.expanduser("~/.cache/gaitlab/bench")
CROP_BYTES = 224 * 224 * 3


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


def link_probe(jax, probes: list, section: str) -> float:
    """Measured H2D MB/s (forced materialization) recorded per section."""
    import jax.numpy as jnp

    if not hasattr(link_probe, "_fn"):
        link_probe._fn = jax.jit(lambda x: x.astype(jnp.float32).sum())
        link_probe._buf = np.random.default_rng(0).integers(
            0, 255, size=(12, 1024, 1024), dtype=np.uint8)
        float(link_probe._fn(jax.device_put(link_probe._buf[:1])))
    t0 = time.perf_counter()
    float(link_probe._fn(jax.device_put(link_probe._buf)))
    mbps = 12.0 / (time.perf_counter() - t0)
    probes.append({"section": section, "h2d_MBps": round(mbps, 1)})
    log(f"[probe:{section}] H2D {mbps:.0f} MB/s "
        f"(crop-feed ceiling {mbps * 1e6 / CROP_BYTES:.0f} fps)")
    return mbps


def median(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    import jax
    import joblib

    from gaitlab.body.joints import convert_kps
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import coords, detect, stream, tracks, video
    from gaitlab.pipeline.loader import PrefetchLoader, load_frames
    from gaitlab.pipeline.runner import GRNetRunner

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    skip_png = os.environ.get("GAITLAB_BENCH_SKIP_PNG", "") not in ("", "0")

    os.makedirs(CACHE, exist_ok=True)
    clip = osp.join(CACHE, f"e2e_{N_FRAMES}_{W}x{H}.mp4")
    if not osp.isfile(clip):
        log("building benchmark clip (one-time)...")
        make_clip(clip)

    stages: dict[str, float] = {}       # MEDIAN wall per section
    stage_runs: dict[str, list] = {}    # all runs (link-weather record)
    probes: list = []
    repeats = int(os.environ.get("GAITLAB_BENCH_REPEATS", "3"))

    def timed(section: str, fn, n_runs: int = None):
        """Run fn() n_runs times with a link probe before each; stages[k]
        = median wall, stage_runs[k] = every wall. Returns last result."""
        n_runs = repeats if n_runs is None else n_runs
        walls, result = [], None
        for _ in range(n_runs):
            link_probe(jax, probes, section)
            t0 = time.perf_counter()
            result = fn()
            walls.append(time.perf_counter() - t0)
        stages[section] = median(walls)
        stage_runs[section] = [round(w, 2) for w in walls]
        return result

    # ---- model + runners + warmup (compile all bucket programs) ---------
    model = GRNet.create()
    buckets = (128, 256)
    runners = {
        "joints": GRNetRunner(model, fetch=("theta", "kp_3d", "kp_2d"),
                              buckets=buckets),
        "full": GRNetRunner(model, buckets=buckets),
    }
    from itertools import islice

    head = np.concatenate(
        [np.array(c) for c in islice(
            iter(video.VideoChunkReader(clip, chunk=64)), 6)],
        axis=0)[:384]
    wdetector = detect.MedianBackgroundDetector().fit(head)
    wtrack = tracks.track_video(wdetector(head))
    wpid = max(wtrack, key=lambda k: len(wtrack[k]["frames"]))
    wbb = wtrack[wpid]["bbox"]
    wfr = head[wtrack[wpid]["frames"]]

    # ---- roofline part 1: HOST stage capacities, measured BEFORE any
    # device work touches this process (an earlier run measured decode at
    # 72 fps mid-bench vs 150 fps track_stream — tunnel-client CPU and
    # queue drain pollute late host measurements) -------------------------
    log("roofline: standalone host-stage capacities (pre-device)...")
    roof = {}
    rn = 450

    def decode_pass():
        got = 0
        t0 = time.perf_counter()
        for chunk in video.VideoChunkReader(clip, chunk=64,
                                            reuse_buffers=True):
            got += len(chunk)
            if got >= rn:
                break
        return got / (time.perf_counter() - t0)

    decode_pass()  # warm the page cache: a cold file read gates pass 1
    roof["decode_fps"] = round(decode_pass(), 1)

    rdet = detect.MedianBackgroundDetector().fit(head)
    t0 = time.perf_counter()
    for s0 in range(0, len(head), 64):
        rdet(head[s0 : s0 + 64])
    roof["detect_fps"] = round(len(head) / (time.perf_counter() - t0), 1)

    wbb_tiled = np.tile(wbb[:1], (len(head), 1))
    t0 = time.perf_counter()
    crops_u8 = runners["joints"]._host_crop(head, wbb_tiled, 1.0)
    roof["crop_fps"] = round(len(head) / (time.perf_counter() - t0), 1)
    del crops_u8
    log(f"roofline host caps: {roof}")

    t0 = time.perf_counter()
    for r in runners.values():
        r.run_track(wfr, wbb)
    log(f"warmup (compiles): {time.perf_counter() - t0:.0f}s")

    # ---- 1. one-pass architecture: single decode ------------------------
    for variant, runner in runners.items():
        res = timed(f"onepass_{variant}",
                    lambda r=runner: stream.run_video_onepass(r, clip))
        n1 = max(len(r["frames"]) for r in res.values()) if res else 0
        log(f"onepass[{variant}]: {n1}-frame track, "
            f"{stages[f'onepass_{variant}']:.1f}s median of "
            f"{stage_runs[f'onepass_{variant}']} "
            f"({N_FRAMES / stages[f'onepass_{variant}']:.0f} fps)")

    # ---- 2. streaming two-pass ------------------------------------------
    def run_track_stream():
        sdetector = detect.MedianBackgroundDetector().fit(head)

        def det_stream_vid():
            for chunk in video.VideoChunkReader(clip, chunk=64,
                                                reuse_buffers=True):
                yield from sdetector(chunk)

        return tracks.track_video(det_stream_vid())

    tracking_s = timed("track_stream", run_track_stream)
    pid_s = max(tracking_s, key=lambda k: len(tracking_s[k]["frames"]))
    bboxes_s = np.asarray(tracking_s[pid_s]["bbox"], np.float32)
    ids_s = np.asarray(tracking_s[pid_s]["frames"])
    nts = len(bboxes_s)
    log(f"track_stream: {nts}-frame track, {stages['track_stream']:.1f}s "
        f"median ({N_FRAMES / stages['track_stream']:.0f} fps)")

    out = None
    for variant, runner in runners.items():
        o = timed(f"model_stream_{variant}", lambda r=runner: r.run_track(
            video.VideoChunkReader(clip, frame_ids=ids_s, chunk=32,
                                   reuse_buffers=True),
            bboxes_s))
        if variant == "joints":
            out = o
        log(f"model_stream[{variant}]: {nts} frames, "
            f"{stages[f'model_stream_{variant}']:.1f}s median "
            f"({nts / stages[f'model_stream_{variant}']:.0f} fps)")

    # ---- 3. device-bound variant: frames already in RAM ------------------
    # isolates crop -> H2D -> forward -> D2H from host video decode (this
    # container has a single CPU core; production TPU hosts have ~100+
    # cores and parallel/overlapped decode)
    mem_n = 450
    mem_frames = np.stack([c for ch in video.VideoChunkReader(
        clip, frame_ids=ids_s[:mem_n], chunk=64) for c in ch])
    full_out = None
    for variant, runner in runners.items():
        runner.run_track(mem_frames[:256], bboxes_s[:256])  # warm shapes
        o = timed(f"model_mem_{variant}",
                  lambda r=runner: r.run_track(mem_frames, bboxes_s[:mem_n]))
        if variant == "full":
            full_out = o
        log(f"model_mem[{variant}]: {mem_n} frames, "
            f"{stages[f'model_mem_{variant}']:.1f}s median "
            f"({mem_n / stages[f'model_mem_{variant}']:.0f} fps)")

    # ---- 4. postproc: coordinate + skeleton conversion -------------------
    t0 = time.perf_counter()
    orig_cam = coords.convert_crop_cam_to_orig_img(
        out["pred_cam"], bboxes_s, W, H)
    joints2d_img = coords.convert_crop_coords_to_orig_img(
        bboxes_s, out["joints2d"], crop_size=224)
    kin = convert_kps(out["joints3d"], "spin2", "kinectv2")
    stages["postproc"] = time.perf_counter() - t0
    assert np.all(np.isfinite(kin)) and np.all(np.isfinite(orig_cam))
    assert joints2d_img.shape[0] == nts
    log(f"postproc: {stages['postproc'] * 1e3:.0f} ms")

    # ---- 5. reference-compatible PNG-folder architecture -----------------
    n = N_FRAMES
    if not skip_png:
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

        track_cache = osp.join(folder, "_tracking.pkl")
        if osp.isfile(track_cache):
            cached = joblib.load(track_cache)
            tracking, stages["track_png"] = cached["t"], cached["s"]
        else:
            t0 = time.perf_counter()
            sample = load_frames(paths[:: max(1, n // 40)])
            detector = detect.MedianBackgroundDetector().fit(sample)

            def det_stream():
                for chunk in PrefetchLoader(paths, chunk=64):
                    yield from detector(chunk)

            tracking = tracks.track_video(det_stream())
            stages["track_png"] = time.perf_counter() - t0
            joblib.dump({"t": tracking, "s": stages["track_png"]},
                        track_cache)
        pid = max(tracking, key=lambda k: len(tracking[k]["frames"]))
        bboxes = np.asarray(tracking[pid]["bbox"], np.float32)
        frame_ids = np.asarray(tracking[pid]["frames"])
        track_paths = [paths[i] for i in frame_ids]
        nt = len(bboxes)
        log(f"track_png: {nt}-frame track, {stages['track_png']:.1f}s "
            f"({n / stages['track_png']:.0f} fps)")

        for variant, runner in runners.items():
            link_probe(jax, probes, f"model_png_{variant}")
            t0 = time.perf_counter()
            runner.run_track(track_paths, bboxes)
            stages[f"model_png_{variant}"] = time.perf_counter() - t0
            log(f"model_png[{variant}]: {nt} frames, "
                f"{stages[f'model_png_{variant}']:.1f}s "
                f"({nt / stages[f'model_png_{variant}']:.0f} fps)")

    # ---- 6. roofline part 2: chip model rate + link, then combine --------
    # The chip-side model rate comes from bench.py in a FRESH subprocess:
    # in-process measurements after ~20 min of tunnel traffic read 10-30x
    # low (dispatch/queue pollution — two runs measured 94 and 97 "fps"
    # for a program bench.py reproducibly measures at ~1480), and bench.py
    # is the canonical, dependency-chained, single-purpose measurement.
    import json as json_mod
    import subprocess
    import sys as sys_mod

    import jax.numpy as jnp

    log("roofline: chip model rate via fresh bench.py subprocess...")
    bench_out = subprocess.run(
        [sys_mod.executable, osp.join(osp.dirname(osp.abspath(__file__)),
                                      "bench.py")],
        capture_output=True, text=True, timeout=900)
    if bench_out.returncode == 0:
        roof["model_chip_fps"] = json_mod.loads(
            bench_out.stdout.strip().splitlines()[-1])["value"]
    else:
        log(f"bench.py subprocess failed: {bench_out.stderr[-500:]}")
        roof["model_chip_fps"] = None

    # D2H bandwidth probe (forced materialization of a device buffer)
    dbuf = jax.device_put(jnp.zeros((12, 1024, 1024), jnp.uint8)) + 1
    np.asarray(dbuf[:1])
    t0 = time.perf_counter()
    np.asarray(dbuf)
    roof["d2h_MBps_measured"] = round(12.0 / (time.perf_counter() - t0), 1)
    roof["h2d_MBps_measured"] = round(link_probe(jax, probes, "roofline"), 1)

    # bytes crossing the link per frame
    h2d_bpf = CROP_BYTES  # uint8 224-crop feed (crop_on="host")
    d2h_bpf = {
        "joints": int(sum(np.asarray(v).nbytes for v in out.values()) / nts),
        "full": int(sum(np.asarray(v).nbytes
                        for v in full_out.values()) / mem_n),
    }
    roof["h2d_bytes_per_frame"] = h2d_bpf
    roof["d2h_bytes_per_frame"] = d2h_bpf

    hs = (roof["decode_fps"], roof["detect_fps"], roof["crop_fps"])
    host_caps = {
        "serial_1core": round(1.0 / sum(1.0 / f for f in hs), 1),
        "parallel_host": round(min(hs), 1),
        # production host: decode/detect parallelize across cores (16
        # assumed), crop already rides a thread pool
        "host_16core_parallel": round(
            min(hs[0] * 16, hs[1] * 16, hs[2] * 8), 1),
    }
    roof["host_caps_fps"] = host_caps
    table = []
    model_fps = roof["model_chip_fps"] or float("inf")
    for link_name, mbps in (("measured", roof["h2d_MBps_measured"]),
                            ("1GBps", 1000.0), ("10GBps", 10000.0),
                            ("40GBps", 40000.0)):
        for host_name, host_fps in host_caps.items():
            caps = {
                "host": host_fps,
                "h2d": mbps * 1e6 / h2d_bpf,
                "model": model_fps,
                "d2h": mbps * 1e6 / d2h_bpf["joints"],
            }
            stage, fps = min(caps.items(), key=lambda kv: kv[1])
            table.append({"link": link_name, "host": host_name,
                          "implied_e2e_fps": round(fps, 1),
                          "bottleneck": stage})
            log(f"roofline[{link_name:>8}, {host_name:>13}]: "
                f"{fps:7.1f} fps, bound by {stage}")
    roof["table"] = table
    log(f"roofline stage caps: {roof}")

    def e2e(*keys, frames=n):
        return round(frames / (sum(stages[k] for k in keys)
                               + stages["postproc"]), 1)

    e2e_fps = {
        "onepass_joints": e2e("onepass_joints", frames=N_FRAMES),
        "onepass_full": e2e("onepass_full", frames=N_FRAMES),
        "streaming_joints": e2e("track_stream", "model_stream_joints",
                                frames=nts),
        "streaming_full": e2e("track_stream", "model_stream_full",
                              frames=nts),
    }
    if not skip_png:
        e2e_fps["reference_arch_joints"] = e2e(
            "decode_png", "track_png", "model_png_joints", frames=nt)
        e2e_fps["reference_arch_full"] = e2e(
            "decode_png", "track_png", "model_png_full", frames=nt)

    summary = {
        "frames": N_FRAMES, "resolution": f"{W}x{H}",
        "device": str(dev.device_kind),
        "host_cores": os.cpu_count(),
        "link_probes_MBps": probes,
        "crop_feed_ceiling_fps_at_probe": [
            round(p["h2d_MBps"] * 1e6 / CROP_BYTES, 1) for p in probes],
        "stages_s": {k: round(v, 2) for k, v in stages.items()},
        "stage_runs_s": stage_runs,
        "section_policy": (f"median of {repeats} runs per section (PNG "
                           "architecture sections: 1 run, cached)"),
        "roofline": roof,
        "model_mem_fps": {
            "joints": round(450 / stages["model_mem_joints"], 1),
            "full": round(450 / stages["model_mem_full"], 1),
        },
        "e2e_fps": e2e_fps,
        "precision_mode": "backbone high + head bf16 (0.35mm MPJPE "
                          "worst-case, docs/PRECISION.json)",
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
