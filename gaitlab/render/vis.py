"""Skeleton drawing utilities (2D overlay via cv2, 3D via matplotlib).

Re-design of the drawing helpers in /root/reference/lib/utils/vis.py
(draw_skeleton :413, draw_3d_skeleton :571) on top of the gaitlab skeleton
registry. Host-side visualisation only — no device work.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gaitlab.body import joints as joints_mod


def draw_2d_skeleton(img: np.ndarray, kp_2d: np.ndarray, fmt: str = "spin2",
                     color=(0, 255, 0), radius: int = 3,
                     thickness: int = 2) -> np.ndarray:
    """Draw joints + bones of one person on an image (in place)."""
    import cv2

    try:
        skeleton = joints_mod.get_skeleton(fmt)
    except Exception:
        skeleton = np.zeros((0, 2), np.int64)
    h, w = img.shape[:2]
    lim = 4 * max(h, w)  # keep cv2 int coords sane even for wild outputs
    kp = np.clip(np.nan_to_num(np.asarray(kp_2d, np.float64)), -lim, lim)
    for x, y in kp[:, :2]:
        cv2.circle(img, (int(x), int(y)), radius, color, -1)
    for a, b in skeleton:
        if a < len(kp) and b < len(kp):
            pa, pb = kp[a, :2], kp[b, :2]
            cv2.line(img, (int(pa[0]), int(pa[1])),
                     (int(pb[0]), int(pb[1])), color, thickness)
    return img


def draw_3d_skeleton(joints3d: np.ndarray, ax, dataset: str = "spin2",
                     color: str = "tab:blue"):
    """Plot a 3D skeleton on a matplotlib 3D axis (reference
    vis.py:571-588 role)."""
    try:
        skeleton = joints_mod.get_skeleton(dataset)
    except Exception:
        skeleton = np.zeros((0, 2), np.int64)
    j = np.asarray(joints3d)
    ax.scatter(j[:, 0], j[:, 1], j[:, 2], s=8, c=color)
    for a, b in skeleton:
        if a < len(j) and b < len(j):
            ax.plot([j[a, 0], j[b, 0]], [j[a, 1], j[b, 1]],
                    [j[a, 2], j[b, 2]], c=color, linewidth=1.5)
    return ax


def render_image(img: np.ndarray, verts: np.ndarray, cam,
                 faces: np.ndarray, color=(0.9, 0.9, 0.8)) -> np.ndarray:
    """Standalone mesh-on-image render (reference vis.py:77-120 role),
    via the software rasterizer."""
    from gaitlab.render import raster

    return raster.render_mesh(np.asarray(img), verts, cam, faces, color=color)


def denormalize_image(norm_img: np.ndarray) -> np.ndarray:
    """Invert the ImageNet normalization of a crop -> uint8 RGB (reference
    torch2numpy, img_utils.py:300-312)."""
    from gaitlab.pipeline.crop import IMAGENET_MEAN, IMAGENET_STD

    img = norm_img * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def visualize_preds(image: np.ndarray, pred_kp2d: np.ndarray,
                    target_kp2d: Optional[np.ndarray] = None,
                    fmt: str = "spin2", crop_size: int = 224) -> np.ndarray:
    """Pred-vs-target keypoint panel (reference visualize_preds,
    vis.py:221-286 role): normalized crop + [-1,1] keypoints -> side-by-side
    uint8 panel with skeletons drawn."""
    from gaitlab.pipeline.crop import normalize_2d_kp

    base = (denormalize_image(image) if image.dtype != np.uint8
            else image.copy())
    panels = []
    pred_px = normalize_2d_kp(np.asarray(pred_kp2d)[:, :2], crop_size,
                              inv=True)
    p = base.copy()
    draw_2d_skeleton(p, pred_px, fmt=fmt, color=(0, 255, 0))
    panels.append(p)
    if target_kp2d is not None:
        t = base.copy()
        tgt_px = normalize_2d_kp(np.asarray(target_kp2d)[:, :2], crop_size,
                                 inv=True)
        draw_2d_skeleton(t, tgt_px, fmt=fmt, color=(0, 0, 255))
        panels.append(t)
    return np.concatenate(panels, axis=1)


def visualize_batch_preds(images: np.ndarray, pred_kp2d: np.ndarray,
                          target_kp2d: Optional[np.ndarray] = None,
                          fmt: str = "spin2", max_items: int = 4) -> np.ndarray:
    """Batch/video variant (reference vis.py:288-358 role): stack per-frame
    panels vertically."""
    rows = []
    n = min(len(images), max_items)
    for i in range(n):
        tgt = target_kp2d[i] if target_kp2d is not None else None
        rows.append(visualize_preds(images[i], pred_kp2d[i], tgt, fmt=fmt))
    return np.concatenate(rows, axis=0)


def body_orientation_rotmat(joints3d_frame: np.ndarray) -> np.ndarray:
    """Procrustes rotation aligning the body to +x for matplotlib display
    (reference demo.py:239-247: hip x shoulder cross product, 49-joint
    spin indices 27/28/39/40)."""
    from scipy.linalg import orthogonal_procrustes

    j = np.asarray(joints3d_frame)
    if j.shape[0] >= 41:  # spin 49-joint layout
        h = j[28] - j[27]
        v = j[40] - j[39]
    else:  # spin2 29-joint: right/left hip 2,3; shoulders 17,16
        h = j[3] - j[2]
        v = j[16] - j[2]
    h = h / np.linalg.norm(h)
    v = v / np.linalg.norm(v)
    init_orient = np.cross(h, v).reshape(1, 3)
    rot, _ = orthogonal_procrustes(np.array([[1.0, 0.0, 0.0]]), init_orient)
    return rot
