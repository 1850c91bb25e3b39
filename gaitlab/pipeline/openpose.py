"""OpenPose .mat annotation ingestion -> coarse bbox database.

Re-implementation of /root/reference/batch_generation.py:95-177
(`load_openpose_anno`): read per-clip OpenPose skeleton .mat files,
filter interaction actions and unusable annotations, pick the dominant
skeleton, derive one constant square bbox per clip via the 1-medoid
reduction (gaitlab.pipeline.medoids), and dump a joblib bbox database
plus a bad-annotation quarantine list.
"""

from __future__ import annotations

import os
import os.path as osp

import joblib
import numpy as np

from gaitlab.pipeline.medoids import IMG_H, IMG_W, get_bbox_from_joints2d

# thresholds (batch_generation.py:27-33)
M = 3             # minimum credible joints in a frame
MIN_SDIFF = 0.01  # confidence-score difference threshold
MAX_THRESH = 0.3  # 2D joint confidence threshold
INTERACT_ACTIONS = (44, 45, 46, 47, 48)  # actions with interaction (:109)


def load_openpose_anno(anno_folder: str = "./data/openpose/",
                       out_json_path: str = "data/coarse_bbox.json",
                       bad_json_path: str = "data/sample_wo_joints2D.json",
                       img_w: int = IMG_W, img_h: int = IMG_H) -> dict:
    import scipy.io as sio

    assert osp.isdir(anno_folder)
    total, count = 0, 0
    output = {}
    fnames = [osp.join(anno_folder, x) for x in sorted(os.listdir(anno_folder))]
    bad_annos = []

    for fn in fnames:
        base = osp.basename(fn)
        try:
            act = int(base.split("_")[0][1:])
        except ValueError:
            act = -1
        if act in INTERACT_ACTIONS:
            continue
        joints2d = sio.loadmat(fn)["skeleton"]
        if joints2d.size == 0:
            bad_annos.append(base)
            continue
        if not (np.logical_and.reduce(
                (joints2d[:, :, :, 2] > 0).sum(-1) > M, axis=-1)).sum():
            bad_annos.append(base)
            continue
        seqlen = joints2d.shape[1]
        vid_name = base.split(".")[0]
        valid = np.logical_and.reduce(
            np.logical_or.reduce(joints2d[:, :, 2] > MAX_THRESH, axis=-1),
            axis=-1)
        if valid.sum() == 0:
            bad_annos.append(base)
            continue
        total += 1
        joints2d = joints2d[valid].reshape(-1, seqlen, 25, 3)
        mask = np.array([True])
        if joints2d.shape[0] > 1:
            scores = joints2d[:, :, :, 2].mean(-1).mean(-1)
            mask = (scores.max() - scores) < MIN_SDIFF
        if mask.sum() > 1:
            count += 1
        j2ds = joints2d[mask].reshape(-1, seqlen, 25, 3).copy()
        j2ds[:, :, :, 0] *= img_w
        j2ds[:, :, :, 1] *= img_h
        area = 0.0
        bboxes = None
        for j2d in j2ds:  # keep the skeleton with the largest bbox (:141-147)
            bbox = get_bbox_from_joints2d(j2d, smooth=False)
            if bbox[0, 2] > area:
                area = bbox[0, 2]
                bboxes = bbox
        output[vid_name] = bboxes

    print(f"Current with-interaction files: {count}/{total}.")
    joblib.dump(output, out_json_path)
    joblib.dump(bad_annos, bad_json_path)
    return output
