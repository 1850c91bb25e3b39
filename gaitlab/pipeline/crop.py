"""On-device crop + normalize: the preprocessing hot path.

The reference does per-frame cv2.warpAffine on CPU DataLoader workers
(/root/reference/lib/data_utils/img_utils.py:90-113,252-285 driven by
lib/dataset/inference.py:71-87). Here the whole batch of frames is cropped,
resampled and ImageNet-normalized **on the TPU** in one jitted program:
the inference affine is always axis-aligned (rot=0, no flip), so the
bilinear warp is separable into a row pass and a column pass of gathered
lerps, fused by XLA with the /255-mean-std normalisation.

Numerical parity notes (SURVEY.md §7 "hard parts" #1):
  * OpenCV >= 5 warps in float32; float sample positions + final
    round-to-uint8 match it to <= 1 intensity count. Legacy OpenCV 4.x
    quantized sub-pixel positions to 1/32 px (INTER_BITS=5);
    `quantize=True` replicates that fixed-point path.
  * BORDER_CONSTANT zero-fill is reproduced by masking out-of-range taps.
  * The reference's non-square branch (img_utils.py:98-106) letterboxes via
    TWO successive warps; `generate_patch_image` reproduces both branches.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INTER_BITS = 5  # cv2 fixed-point sub-pixel resolution


def gen_trans_from_patch(c_x, c_y, src_width, src_height, dst_width,
                         dst_height, scale, rot, inv=False) -> np.ndarray:
    """2x3 affine matching the reference triangle construction
    (img_utils.py:54-88). rot in degrees."""
    src_w = src_width * scale
    src_h = src_height * scale
    rot_rad = np.pi * rot / 180.0

    def rot2d(pt):
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs],
                        np.float64)

    src = np.zeros((3, 2), np.float64)
    src[0] = [c_x, c_y]
    src[1] = src[0] + rot2d([0, src_h * 0.5])
    src[2] = src[0] + rot2d([src_w * 0.5, 0])
    dst = np.zeros((3, 2), np.float64)
    dst[0] = [dst_width * 0.5, dst_height * 0.5]
    dst[1] = dst[0] + [0, dst_height * 0.5]
    dst[2] = dst[0] + [dst_width * 0.5, 0]
    if inv:
        src, dst = dst, src
    # cv2.getAffineTransform takes float32 points (the reference casts,
    # img_utils.py:85-87) and solves in double — replicate both steps.
    src = src.astype(np.float32).astype(np.float64)
    dst = dst.astype(np.float32).astype(np.float64)
    A = np.concatenate([src, np.ones((3, 1))], axis=1)  # (3,3)
    M = np.linalg.solve(A, dst).T  # (2,3)
    return M


def trans_point2d(pt_2d, trans) -> np.ndarray:
    src = np.array([pt_2d[0], pt_2d[1], 1.0])
    return (trans @ src)[:2]


def _axis_samples(dst_size: int, inv_scale: np.ndarray, offset: np.ndarray,
                  src_size: int, quantize: bool):
    """Source coordinates + lerp weights for one axis of the inverse map.

    src = dst * inv_scale + offset, per batch element; computed on host in
    float64 (cv2 builds its warp matrices in double — f32 flips 1/32 bins).
    Returns numpy (lo (B,D) int32, frac (B,D) f32, valid_lo, valid_hi).
    """
    d = np.arange(dst_size, dtype=np.float64)
    inv_scale = np.asarray(inv_scale, np.float64)
    offset = np.asarray(offset, np.float64)
    if quantize:
        # cv2.warpAffine fixed point: per-axis terms rounded to AB_BITS=10
        # fractional bits separately, +AB_SCALE/INTER_TAB_SIZE/2 rounding
        # delta, then arithmetic-shifted down to INTER_BITS=5.
        v = (np.rint(offset[:, None] * 1024.0) + 16.0
             + np.rint(d[None, :] * inv_scale[:, None] * 1024.0))
        src = np.floor(v / 32.0) / 32.0
    else:
        src = d[None, :] * inv_scale[:, None] + offset[:, None]  # (B,D)
    lo = np.floor(src)
    frac = (src - lo).astype(np.float32)
    lo_i = lo.astype(np.int32)
    valid_lo = ((lo_i >= 0) & (lo_i <= src_size - 1)).astype(np.float32)
    valid_hi = ((lo_i + 1 >= 0) & (lo_i + 1 <= src_size - 1)).astype(np.float32)
    lo_c = np.clip(lo_i, 0, src_size - 1)
    return lo_c, frac, valid_lo, valid_hi


def _gather_lerp(x: Array, lo: Array, frac: Array, vlo: Array, vhi: Array,
                 axis: int) -> Array:
    """Bilinear tap along `axis` with zero border.  x: (B, H, W, C)."""
    hi = jnp.clip(lo + 1, 0, x.shape[axis] - 1)
    a = jnp.take_along_axis(x, _expand(lo, x, axis), axis=axis)
    b = jnp.take_along_axis(x, _expand(hi, x, axis), axis=axis)
    f = _expand_f(frac, x, axis)
    return (a * _expand_f(vlo, x, axis) * (1.0 - f)
            + b * _expand_f(vhi, x, axis) * f)


def _expand(idx: Array, x: Array, axis: int) -> Array:
    """(B,D) indices -> take_along_axis index view.

    take_along_axis broadcasts non-axis dims, so a (B,D,1,1)-shaped view is
    enough — materializing a full (B,D,W,C) index tensor would cost GBs on
    1080p batches.
    """
    shape = [1] * x.ndim
    shape[0] = idx.shape[0]
    shape[axis] = idx.shape[1]
    return idx.reshape(shape)


def _expand_f(w: Array, x: Array, axis: int) -> Array:
    shape = [1] * x.ndim
    shape[0] = w.shape[0]
    shape[axis] = w.shape[1]
    return w.reshape(shape)


@partial(jax.jit, static_argnames=("round_uint8", "normalize"))
def _sample_and_normalize(frames, lo_y, fy, vlo_y, vhi_y,
                          lo_x, fx, vlo_x, vhi_x,
                          round_uint8: bool, normalize: bool) -> Array:
    frames = frames.astype(jnp.float32)
    out = _gather_lerp(frames, lo_y, fy, vlo_y, vhi_y, axis=1)  # (B,c,W,3)
    out = _gather_lerp(out, lo_x, fx, vlo_x, vhi_x, axis=2)     # (B,c,c,3)
    if round_uint8:
        # cv2.warpAffine emits uint8: round to integer intensity like the
        # reference's warp -> ToTensor path does.
        out = jnp.round(jnp.clip(out, 0.0, 255.0))
    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
        std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
        out = (out - mean) / std
    return out


def crop_and_normalize(
    frames: Array,
    bboxes: np.ndarray,
    scale: float = 1.0,
    crop_size: int = 224,
    quantize: bool = False,
    normalize: bool = True,
    round_uint8: bool = True,
) -> Array:
    """Batched square-bbox crop -> crop_size² -> ImageNet normalize, on device.

    frames: (B, H, W, 3) uint8/float RGB (device or host); bboxes: host
    (B, 4) [cx, cy, w, h] with w == h (the deployed demo path — tracker
    boxes are square). Returns (B, crop_size, crop_size, 3) float32 NHWC.

    The inverse map of the reference affine (img_utils.py:54-113 with
    rot=0, square bbox) is src = (dst - c/2) * (w*scale/c) + center, i.e.
    axis-aligned — evaluated separably on rows then columns. The tiny
    (B, crop) sampling tables are built host-side in float64 (bboxes come
    from host tracking anyway); the resample + normalize is one fused
    device program.
    """
    h, w = frames.shape[1:3]
    bboxes = np.asarray(bboxes, np.float64)
    # Build the exact forward affine per box (float32 triangle points, like
    # cv2.getAffineTransform sees them) and invert in double, exactly as
    # cv2.warpAffine does internally.
    inv_scale = np.empty(len(bboxes))
    off_x = np.empty(len(bboxes))
    off_y = np.empty(len(bboxes))
    inv_scale_y = np.empty(len(bboxes))
    for i, bb in enumerate(bboxes):
        M = gen_trans_from_patch(bb[0], bb[1], bb[2], bb[3],
                                 crop_size, crop_size, scale, 0)
        Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))
        inv_scale[i] = Minv[0, 0]
        inv_scale_y[i] = Minv[1, 1]
        off_x[i] = Minv[0, 2]
        off_y[i] = Minv[1, 2]

    lo_x, fx, vlo_x, vhi_x = _axis_samples(crop_size, inv_scale, off_x, w, quantize)
    lo_y, fy, vlo_y, vhi_y = _axis_samples(crop_size, inv_scale_y, off_y, h, quantize)
    return _sample_and_normalize(frames, lo_y, fy, vlo_y, vhi_y,
                                 lo_x, fx, vlo_x, vhi_x,
                                 round_uint8=round_uint8, normalize=normalize)


def normalize_image(img: Array) -> Array:
    """uint8 RGB (…,3) -> float ImageNet-normalized (torchvision ToTensor +
    Normalize, img_utils.py:355-363), NHWC."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (img.astype(jnp.float32) / 255.0 - mean) / std


def normalize_2d_kp(kp_2d, crop_size: int = 224, inv: bool = False):
    """[0, crop) <-> [-1, 1] (img_utils.py:344-353)."""
    if not inv:
        return 2.0 * kp_2d / crop_size - 1.0
    return (kp_2d + 1.0) * crop_size / 2.0


def generate_patch_image(
    cvimg: np.ndarray, c_x, c_y, bb_width, bb_height,
    patch_width: int, patch_height: int, do_flip: bool = False,
    scale: float = 1.0, rot: float = 0.0,
):
    """Host-exact reproduction of img_utils.py:90-113 (both branches) via
    cv2; returns (patch RGB uint8, 2x3 forward trans)."""
    import cv2

    img = np.asarray(cvimg)
    img_height, img_width = img.shape[:2]
    if do_flip:
        img = img[:, ::-1, :]
        c_x = img_width - c_x - 1
    if bb_width != bb_height:
        assert patch_height == patch_width
        s = patch_height / max(bb_height, bb_width)
        ptrans = gen_trans_from_patch(c_x, c_y, bb_width, bb_height,
                                      int(s * bb_width), int(s * bb_height),
                                      scale, rot)
        img = cv2.warpAffine(img, ptrans, (int(s * bb_width), int(s * bb_height)),
                             flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_CONSTANT)
        dx = patch_width / 2 - img.shape[1] / 2
        dy = patch_width / 2 - img.shape[0] / 2
        trans = np.array([[1, 0, dx], [0, 1, dy]], np.float64)
    else:
        trans = gen_trans_from_patch(c_x, c_y, bb_width, bb_height,
                                     patch_width, patch_height, scale, rot)
    patch = cv2.warpAffine(img, trans, (int(patch_width), int(patch_height)),
                           flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT)
    return patch, trans


def get_single_image_crop_demo(image, bbox, kp_2d=None, scale: float = 1.2,
                               crop_size: int = 224):
    """Host parity API (img_utils.py:252-285): one crop + normalized tensor.

    Returns (norm_img (crop,crop,3) f32 NHWC, raw_img uint8, kp_2d).
    """
    import cv2
    import os

    if isinstance(image, str):
        if not os.path.isfile(image):
            raise FileNotFoundError(image)
        image = cv2.cvtColor(cv2.imread(image), cv2.COLOR_BGR2RGB)
    image = np.asarray(image)
    patch, trans = generate_patch_image(
        image, bbox[0], bbox[1], bbox[2], bbox[3], crop_size, crop_size,
        do_flip=False, scale=scale, rot=0,
    )
    if kp_2d is not None:
        kp_2d = np.asarray(kp_2d, np.float32).copy()
        for j in range(kp_2d.shape[0]):
            kp_2d[j, :2] = trans_point2d(kp_2d[j], trans)
    norm = np.asarray(normalize_image(jnp.asarray(patch)))
    return norm, patch, kp_2d
