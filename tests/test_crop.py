"""Parity: on-device crop+normalize vs. the reference cv2.warpAffine path."""

import numpy as np
import pytest

import refutil
from gaitlab.pipeline import crop


def _ref_img_utils():
    import sys
    import types

    # img_utils imports skimage.util.shape.view_as_windows; shim it.
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sku = types.ModuleType("skimage.util")
        sks = types.ModuleType("skimage.util.shape")
        sks.view_as_windows = None
        sku.shape = sks
        sk.util = sku
        sys.modules.update(
            {"skimage": sk, "skimage.util": sku, "skimage.util.shape": sks}
        )
    # Full torchvision/timm shims from refutil — a partial shim here would
    # shadow the complete one for later tests in the same process.
    refutil.install_misc_shims()
    return refutil.load_module_from_path(
        "ref_img_utils", refutil.REF + "/lib/data_utils/img_utils.py"
    )


@pytest.fixture(scope="module")
def ref_img_utils():
    return _ref_img_utils()


def _rand_image(rng, h=480, w=640):
    # Smooth-ish image so 1/32-px quantization differences stay tiny.
    img = rng.integers(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
    import cv2

    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


def test_gen_trans_matches_cv2(rng, ref_img_utils):
    for _ in range(5):
        cx, cy = rng.uniform(50, 500), rng.uniform(50, 400)
        w, h = rng.uniform(80, 300), rng.uniform(80, 300)
        rot = rng.uniform(-30, 30)
        for inv in (False, True):
            ref = ref_img_utils.gen_trans_from_patch_cv(
                cx, cy, w, h, 224, 224, 1.1, rot, inv=inv)
            got = crop.gen_trans_from_patch(cx, cy, w, h, 224, 224, 1.1, rot,
                                            inv=inv)
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_device_crop_matches_reference_square(rng, ref_img_utils):
    img = _rand_image(rng)
    boxes = []
    for _ in range(6):
        side = rng.uniform(90, 280)
        boxes.append([rng.uniform(80, 560), rng.uniform(80, 400), side, side])
    bboxes = np.array(boxes, np.float32)
    frames = np.stack([img] * len(boxes))

    got = np.asarray(crop.crop_and_normalize(frames, bboxes, scale=1.1))

    for i, bb in enumerate(bboxes):
        ref_norm, _, _ = ref_img_utils.get_single_image_crop_demo(
            img.copy(), bb, kp_2d=None, scale=1.1, crop_size=224)
        ref_chw = ref_norm.numpy()  # (3,224,224) torch layout
        ref_hwc = np.transpose(ref_chw, (1, 2, 0))
        # cv2 fixed-point interpolation differs from float by O(1/255).
        diff = np.abs(got[i] - ref_hwc)
        assert diff.max() < 0.06, diff.max()  # ~3 uint8 counts pre-normalize
        assert np.mean(diff) < 0.005


def test_device_crop_partially_outside(rng, ref_img_utils):
    img = _rand_image(rng)
    bboxes = np.array([[20.0, 30.0, 200.0, 200.0],
                       [630.0, 470.0, 180.0, 180.0]], np.float32)
    frames = np.stack([img, img])
    got = np.asarray(crop.crop_and_normalize(frames, bboxes, scale=1.0))
    for i, bb in enumerate(bboxes):
        ref_norm, _, _ = ref_img_utils.get_single_image_crop_demo(
            img.copy(), bb, kp_2d=None, scale=1.0, crop_size=224)
        ref_hwc = np.transpose(ref_norm.numpy(), (1, 2, 0))
        assert np.abs(got[i] - ref_hwc).max() < 0.06


def test_host_crop_nonsquare_matches_reference(rng, ref_img_utils):
    img = _rand_image(rng)
    bb = np.array([300.0, 250.0, 160.0, 240.0], np.float32)
    kp = rng.uniform(100, 400, size=(17, 3)).astype(np.float32)
    ref_norm, ref_raw, ref_kp = ref_img_utils.get_single_image_crop_demo(
        img.copy(), bb, kp_2d=kp.copy(), scale=1.0, crop_size=224)
    got_norm, got_raw, got_kp = crop.get_single_image_crop_demo(
        img.copy(), bb, kp_2d=kp.copy(), scale=1.0, crop_size=224)
    np.testing.assert_array_equal(got_raw, ref_raw)
    np.testing.assert_allclose(
        got_norm, np.transpose(ref_norm.numpy(), (1, 2, 0)), atol=1e-5)
    np.testing.assert_allclose(got_kp, ref_kp, rtol=1e-4)


def test_normalize_2d_kp_roundtrip(rng):
    kp = rng.uniform(0, 224, size=(10, 2)).astype(np.float32)
    n = crop.normalize_2d_kp(kp)
    assert np.all(np.abs(n) <= 1.0)
    back = crop.normalize_2d_kp(n, inv=True)
    np.testing.assert_allclose(back, kp, rtol=1e-5)
