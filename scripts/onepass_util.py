"""One-pass per-stage utilization audit on the real TPU (VERDICT r3 #3).

BASELINE.md's roofline table implied 127 fps for the one-pass pipeline on
this container, but the sustained median is ~57 fps (docs/BENCH_E2E.json).
This script instruments pipeline/stream.run_video_onepass with per-stage
HOST busy time over the standard 2000-frame 1080p synthetic clip and
writes docs/ONEPASS_UTILIZATION.json: either the host is saturated (busy
≈ wall, so the stage-MAX roofline was the wrong model for a 1-core host —
CPU stages serialize, they must be SUMMED) or there is idle time to
reclaim.

Usage (real chip): python scripts/onepass_util.py [n_frames]
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench_e2e
    from gaitlab.nn.grnet import GRNet
    from gaitlab.pipeline import stream
    from gaitlab.pipeline.runner import GRNetRunner
    from gaitlab.utils import StageTimer

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else bench_e2e.N_FRAMES
    dev = jax.devices()[0]
    bench_e2e.log(f"device: {dev.platform} {dev.device_kind}")

    import os

    os.makedirs(bench_e2e.CACHE, exist_ok=True)
    clip = osp.join(bench_e2e.CACHE,
                    f"e2e_{n_frames}_{bench_e2e.W}x{bench_e2e.H}.mp4")
    if not osp.isfile(clip):
        bench_e2e.log(f"building {n_frames}-frame synthetic clip...")
        bench_e2e.make_clip(clip, n_frames)

    # EXACTLY bench_e2e's "joints" runner, so the wall is comparable to
    # BENCH_E2E.json's onepass_joints median (modulo tunnel drift)
    model = GRNet.create()
    runner = GRNetRunner(model, fetch=("theta", "kp_3d", "kp_2d"))

    probes: list = []
    bench_e2e.link_probe(jax, probes, "before")

    # warmup: compile every bucket the clip will hit
    bench_e2e.log("warmup run (compiles)...")
    stream.run_video_onepass(runner, clip)

    bench_e2e.link_probe(jax, probes, "mid")
    timer = StageTimer()
    t0 = time.perf_counter()
    res = stream.run_video_onepass(runner, clip, timer=timer)
    wall = time.perf_counter() - t0
    bench_e2e.link_probe(jax, probes, "after")

    busy = dict(timer.stages)
    busy_total = sum(busy.values())
    longest = max((len(r["frames"]) for r in res.values()), default=0)
    crop_mb = longest * bench_e2e.CROP_BYTES / 1e6
    link = np.median([p["h2d_MBps"] for p in probes])

    out = {
        "clip": f"{n_frames} frames 1920x1080 (bench_e2e synthetic)",
        "device": str(dev.device_kind),
        "host_cores": 1,
        "wall_s": round(wall, 2),
        "fps": round(n_frames / wall, 1),
        "host_busy_s": {k: round(v, 2) for k, v in sorted(
            busy.items(), key=lambda kv: -kv[1])},
        "host_busy_total_s": round(busy_total, 2),
        "host_busy_fraction": round(busy_total / wall, 3),
        "unattributed_s": round(wall - busy_total, 2),
        "crop_h2d_mb": round(crop_mb, 1),
        "link_probes_MBps": probes,
        "crop_h2d_at_link_s": round(crop_mb / link, 2),
        "note": ("host_busy stages are CPU work that CANNOT overlap each "
                 "other on this 1-core host — only device compute hides "
                 "behind them. 'feed'/'finish' include the dispatch "
                 "thread handoff and the device+D2H drain respectively; "
                 "the H2D crop stream is serialized by the tunnel writer "
                 "thread on the SAME core, so its cost surfaces inside "
                 "whichever inline bracket runs concurrently (detect "
                 "inflates from its ~2 ms/frame standalone rate by "
                 "roughly crop_h2d_at_link_s). Interpretation: busy "
                 "fraction 0.88-0.96 across runs = the host is "
                 "saturated; wall tracks the drifting tunnel "
                 "(BENCH_E2E.json r3 onepass_joints median was 34.8 s at "
                 "a ~31-40 MB/s link day). The correct 1-core roofline "
                 "SUMS cpu-stage + link costs (see BASELINE.md); the old "
                 "127-fps figure took the stage MIN, a parallel-host "
                 "model."),
    }
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "docs", "ONEPASS_UTILIZATION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
