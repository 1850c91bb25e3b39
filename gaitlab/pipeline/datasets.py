"""Dataset-style wrappers for users migrating from the reference API.

The reference exposes torch Datasets (`Inference`, `ImageFolder`,
lib/dataset/inference.py:28-104). gaitlab's native path is batch-oriented
(runner + device crop), but these thin classes keep the familiar
per-item surface for scripts that iterate frames:

    ds = Inference(image_folder, frames, bboxes, scale=1.0)
    norm_img = ds[0]                  # (224,224,3) float32 NHWC
    batch = ds.batch(range(len(ds)))  # device-cropped batch (preferred)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from gaitlab.pipeline import boxes as boxes_mod
from gaitlab.pipeline import crop as crop_mod
from gaitlab.pipeline import video as video_mod


class Inference:
    """Per-track crop dataset (reference lib/dataset/inference.py:28-87).

    Unlike the reference, input bboxes are NOT mutated in place
    (inference.py:48 scales the caller's array — a documented defect).
    """

    def __init__(self, image_folder: str, frames, bboxes=None,
                 joints2d=None, scale: float = 1.0, crop_size: int = 224):
        paths = np.array(video_mod.list_image_files(image_folder))
        frames = np.asarray(frames)
        self.scale = scale
        self.crop_size = crop_size
        self.has_keypoints = joints2d is not None
        if self.has_keypoints:
            frames, bboxes, joints2d = boxes_mod.track_window_from_joints2d(
                frames, joints2d)
            self.joints2d = joints2d
            self.bboxes = bboxes
        else:
            self.joints2d = None
            bboxes = np.array(bboxes, np.float32, copy=True)
            bboxes[:, 2:] *= scale
            self.bboxes = bboxes
        self.frames = frames
        self.image_file_names = paths[frames]

    def __len__(self):
        return len(self.image_file_names)

    def __getitem__(self, idx: int):
        norm, _, kp = crop_mod.get_single_image_crop_demo(
            str(self.image_file_names[idx]), self.bboxes[idx],
            kp_2d=self.joints2d[idx] if self.has_keypoints else None,
            scale=1.0 if not self.has_keypoints else self.scale,
            crop_size=self.crop_size)
        if self.has_keypoints:
            return norm, kp
        return norm

    def batch(self, indices: Optional[Sequence[int]] = None):
        """Device-cropped batch (the fast path): (N,224,224,3) f32."""
        from gaitlab.pipeline.loader import load_frames

        idx = np.arange(len(self)) if indices is None else np.asarray(indices)
        imgs = load_frames([str(p) for p in self.image_file_names[idx]])
        return crop_mod.crop_and_normalize(
            imgs, self.bboxes[idx], scale=1.0, crop_size=self.crop_size)


class ImageFolder:
    """Whole-frame dataset (reference inference.py:90-104)."""

    def __init__(self, image_folder: str):
        self.image_file_names = video_mod.list_image_files(image_folder)

    def __len__(self):
        return len(self.image_file_names)

    def __getitem__(self, idx: int):
        import cv2

        img = cv2.cvtColor(cv2.imread(self.image_file_names[idx]),
                           cv2.COLOR_BGR2RGB)
        return img.astype(np.float32) / 255.0
