"""gaitlab quickstart: synthetic clip -> 3D joints -> gait report.

Run: python examples/quickstart.py [--out /tmp/gaitlab_quickstart]

Generates a small synthetic walking clip (so it works with zero data),
runs the full pipeline through the high-level API, and prints the gait
report. Swap `make_clip` for a real video path and pass your trained
checkpoint + SMPL model for meaningful outputs:

    results = gl.analyze_video("clinic_walk.mp4",
                               ckpt="data/grnet_data/max-grnet.pth.tar",
                               smpl_model="data/smpl_data/SMPL_NEUTRAL.pkl",
                               joint_type="kinectv2")
"""

import argparse
import os
import os.path as osp


def make_clip(path: str, n: int = 40, w: int = 320, h: int = 240) -> str:
    import cv2
    import numpy as np

    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 20.0,
                             (w, h))
    rng = np.random.default_rng(0)
    bg = rng.integers(40, 70, size=(h, w, 3)).astype(np.uint8)
    for i in range(n):
        frame = bg.copy()
        x = 20 + 4 * i
        cv2.rectangle(frame, (x, 40), (x + 40, 200), (210, 190, 180), -1)
        cv2.circle(frame, (x + 20, 55), 12, (200, 170, 160), -1)
        writer.write(frame)
    writer.release()
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gaitlab_quickstart")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--smpl_model", default=None)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    os.environ.setdefault("GAITLAB_BUCKETS", "64")  # one small compile

    import gaitlab.api as gl

    clip = make_clip(osp.join(args.out, "walk.mp4"))
    print(f"analyzing {clip} ...")
    results = gl.analyze_video(clip, ckpt=args.ckpt,
                               smpl_model=args.smpl_model,
                               joint_type="kinectv2", smooth=True)
    print(f"{len(results)} person track(s)")
    report = gl.gait_report(results, fps=20.0)
    for pid, rep in report.items():
        feats = rep["features"]
        print(f"person {pid}:")
        for k in ("walk_speed", "cadence", "step_length", "step_asymmetry"):
            print(f"  {k}: {feats[k]:.3f}")


if __name__ == "__main__":
    main()
