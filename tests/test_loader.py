"""Native C++ batch decoder: build, decode parity with cv2, prefetch."""

import os

import numpy as np
import pytest

from gaitlab.pipeline import loader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(10):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        p = str(d / f"{i:06d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    # one jpeg too
    jp = str(d / "extra.jpg")
    cv2.imwrite(jp, rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    return paths, jp


def test_native_builds_and_decodes_png(image_dir):
    paths, _ = image_dir
    mod = loader._native()
    if mod is None:
        pytest.skip("native toolchain unavailable")
    import cv2

    out = loader.load_frames(paths)
    assert out.shape == (10, 48, 64, 3) and out.dtype == np.uint8
    for i, p in enumerate(paths):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(out[i], ref)


def test_native_decodes_jpeg(image_dir):
    _, jp = image_dir
    if loader._native() is None:
        pytest.skip("native toolchain unavailable")
    import cv2

    out = loader.load_frames([jp])
    ref = cv2.cvtColor(cv2.imread(jp), cv2.COLOR_BGR2RGB)
    # libjpeg vs cv2's jpeg path may differ by small IDCT rounding
    assert out.shape == (1, 48, 64, 3)
    assert np.mean(np.abs(out[0].astype(int) - ref.astype(int))) < 2.0


def test_image_size(image_dir):
    paths, _ = image_dir
    assert loader.image_size(paths[0]) == (48, 64)


def test_decode_error_on_missing(image_dir):
    paths, _ = image_dir
    if loader._native() is None:
        pytest.skip("native toolchain unavailable")
    with pytest.raises(Exception):
        loader.load_frames([paths[0], "/nonexistent/x.png"])


def test_prefetch_loader(image_dir):
    paths, _ = image_dir
    chunks = list(loader.PrefetchLoader(paths, chunk=4))
    assert [c.shape[0] for c in chunks] == [4, 4, 2]
    full = np.concatenate(chunks)
    direct = loader.load_frames(paths)
    np.testing.assert_array_equal(full, direct)
