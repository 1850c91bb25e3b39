"""Dataset-style wrappers (Inference/ImageFolder API compatibility)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    import cv2

    d = str(tmp_path_factory.mktemp("ds_frames"))
    rng = np.random.default_rng(0)
    for i in range(5):
        cv2.imwrite(os.path.join(d, f"{i+1:06d}.png"),
                    rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    return d


def test_inference_dataset(frame_dir):
    from gaitlab.pipeline.datasets import Inference

    bb = np.tile([80.0, 60.0, 70.0, 70.0], (5, 1)).astype(np.float32)
    orig = bb.copy()
    ds = Inference(frame_dir, np.arange(5), bboxes=bb, scale=1.1)
    assert len(ds) == 5
    img = ds[0]
    assert img.shape == (224, 224, 3)
    np.testing.assert_array_equal(bb, orig)  # no in-place mutation (defect fixed)
    batch = np.asarray(ds.batch())
    assert batch.shape == (5, 224, 224, 3)
    np.testing.assert_allclose(batch[0], img, atol=2e-2)


def test_inference_dataset_keypoint_path(frame_dir, rng):
    from gaitlab.pipeline.datasets import Inference

    j2d = np.zeros((5, 21, 3), np.float32)
    j2d[:, :, 0] = rng.uniform(40, 120, (5, 21))
    j2d[:, :, 1] = rng.uniform(20, 100, (5, 21))
    j2d[:, :, 2] = 0.9
    ds = Inference(frame_dir, np.arange(5), joints2d=j2d)
    norm, kp = ds[0]
    assert norm.shape == (224, 224, 3) and kp.shape == (21, 3)


def test_image_folder(frame_dir):
    from gaitlab.pipeline.datasets import ImageFolder

    fold = ImageFolder(frame_dir)
    assert len(fold) == 5
    assert fold[0].shape == (120, 160, 3)
    assert fold[0].max() <= 1.0
