#!/usr/bin/env python
"""Data-layout checker/preparer (reference scripts/prepare_data.sh role).

The reference shell script downloads checkpoints, SMPL data and a sample
video. This environment has no egress, so this script instead verifies the
expected layout, pulls files from a local mirror (GAITLAB_ASSET_DIR) when
available, and prints exactly what is missing and where to put it.

Expected layout (reference lib/core/config.py:23-24 conventions):
  data/smpl_data/SMPL_NEUTRAL.pkl         official SMPL neutral model
  data/smpl_data/J_regressor_extra.npy    SPIN extra-joint regressor
  data/smpl_data/smpl_mean_params.npz     mean pose/shape/cam
  data/grnet_data/hrnet_w32.pth.tar       HRNet-W32 backbone weights
  data/grnet_data/pare_w_3dpw_checkpoint.ckpt   PARE head weights
  checkpoint/max-grnet.pth.tar            deployed GRNet checkpoint
  sample_video.mp4                        demo clip (optional)
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
import sys

EXPECTED = [
    ("data/smpl_data/SMPL_NEUTRAL.pkl", "official SMPL neutral body model"),
    ("data/smpl_data/J_regressor_extra.npy", "SPIN extra-joint regressor"),
    ("data/smpl_data/smpl_mean_params.npz", "SMPL mean parameters"),
    ("data/grnet_data/hrnet_w32.pth.tar", "HRNet-W32 backbone checkpoint"),
    ("data/grnet_data/pare_w_3dpw_checkpoint.ckpt", "PARE head checkpoint"),
    ("checkpoint/max-grnet.pth.tar", "MAX-GRNet deployed checkpoint"),
    ("sample_video.mp4", "demo sample clip (optional)"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".", help="repo/data root")
    args = ap.parse_args()

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from gaitlab.pipeline import fetch

    missing = []
    for rel, desc in EXPECTED:
        dst = osp.join(args.root, rel)
        if osp.isfile(dst):
            print(f"[ok]      {rel}")
            continue
        try:
            src = fetch.resolve_asset(osp.basename(rel))
            os.makedirs(osp.dirname(dst) or ".", exist_ok=True)
            shutil.copy(src, dst)
            print(f"[copied]  {rel}  <- {src}")
        except FileNotFoundError:
            print(f"[MISSING] {rel}  ({desc})")
            missing.append(rel)

    if missing:
        print("\nPlace the files above (fetch them on a connected machine, "
              "or set GAITLAB_ASSET_DIR to a local mirror) and re-run.")
        sys.exit(1)
    print("\nAll data present.")


if __name__ == "__main__":
    main()
