"""Training-data helpers: sequence chunking and augmentation.

Counterparts of the reference img_utils training-support functions
(/root/reference/lib/data_utils/img_utils.py:30-52,365-494): sliding-window
chunking of per-video frame indices (split_into_chunks, used by the absent
training pipeline), random crop augmentation parameters, color scaling and
body-part occlusion masking.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np


def split_into_chunks(vid_names: np.ndarray, seqlen: int, stride: int):
    """Per-video sliding windows over a flat frame index
    (img_utils.py:365-382). Returns [(start_idx, end_idx_incl), ...]."""
    vid_names = np.asarray(vid_names)
    video_start_end_indices = []
    video_names, group = np.unique(vid_names, return_index=True)
    perm = np.argsort(group)
    video_names, group = video_names[perm], group[perm]
    indices = np.split(np.arange(0, vid_names.shape[0]), group[1:])
    for idx in range(len(video_names)):
        indexes = indices[idx]
        if indexes.shape[0] < seqlen:
            continue
        n_windows = indexes.shape[0] - seqlen + 1
        starts = np.arange(0, n_windows, stride)
        chunks = np.stack([indexes[s : s + seqlen] for s in starts])
        video_start_end_indices += chunks[:, (0, -1)].tolist()
    return video_start_end_indices


def do_augmentation(scale_factor: float = 0.3, color_factor: float = 0.2,
                    rng: Optional[random.Random] = None):
    """Random crop-scale + per-channel color scale (img_utils.py:30-38;
    rotation and flip are disabled there too)."""
    r = rng or random
    scale = r.uniform(1.2, 1.2 + scale_factor)
    rot = 0
    do_flip = False
    c_up = 1.0 + color_factor
    c_low = 1.0 - color_factor
    color_scale = [r.uniform(c_low, c_up) for _ in range(3)]
    return scale, rot, do_flip, color_scale


def color_jitter(image: np.ndarray, color_scale: Sequence[float]) -> np.ndarray:
    """Per-channel multiplicative color scaling with uint8 clamping
    (img_utils.py:160-163 role)."""
    img = image.astype(np.float32) * np.asarray(color_scale, np.float32)
    return np.clip(img, 0, 255).astype(image.dtype)


def get_image_masked(image: np.ndarray, bbox, ratio=(0.6, 0.3),
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Occlusion augmentation: zero a random sub-rectangle of the person
    bbox (img_utils.py:423-448 role). bbox = [cx, cy, w, h]."""
    g = rng or np.random.default_rng()
    img = image.copy()
    cx, cy, w, h = [float(v) for v in bbox]
    mw, mh = w * ratio[0], h * ratio[1]
    x0 = int(np.clip(cx - w / 2 + g.uniform(0, w - mw), 0, img.shape[1] - 1))
    y0 = int(np.clip(cy - h / 2 + g.uniform(0, h - mh), 0, img.shape[0] - 1))
    x1 = int(np.clip(x0 + mw, 0, img.shape[1]))
    y1 = int(np.clip(y0 + mh, 0, img.shape[0]))
    img[y0:y1, x0:x1] = 0
    return img
