"""Skeleton registry parity vs reference kp_utils (name tables + conversion)."""

import numpy as np
import pytest

from gaitlab.body import joints as J
from refutil import load_module_from_path

kp = load_module_from_path("ref_kp_utils", "/root/reference/lib/data_utils/kp_utils.py")

FORMATS = [
    "spin", "spin2", "kinectv2", "smpl", "smpl2", "h36m", "shcommon",
    "common", "coco", "mpii", "mpii3d", "mpii3d_test", "insta", "staf",
    "posetrack", "pennaction", "smplcoco", "3dpw", "cmu21", "h36m32",
    "OP21a",
]


@pytest.mark.parametrize("fmt", FORMATS)
def test_joint_names_match(fmt):
    ref_names = getattr(kp, f"get_{fmt}_joint_names")()
    assert J.get_joint_names(fmt) == list(ref_names)


@pytest.mark.parametrize(
    "fmt", ["spin", "kinectv2", "smpl", "h36m", "common", "coco", "mpii",
            "insta", "staf", "smplcoco", "3dpw", "OP21a"]
)
def test_skeletons_match(fmt):
    ref = getattr(kp, f"get_{fmt}_skeleton")()
    np.testing.assert_array_equal(J.get_skeleton(fmt), ref)


@pytest.mark.parametrize(
    "src,dst",
    [("spin", "kinectv2"), ("spin2", "kinectv2"), ("spin", "common"),
     ("spin", "h36m"), ("coco", "spin"), ("spin", "spin2")],
)
def test_convert_kps_parity(src, dst):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, len(J.get_joint_names(src)), 3))
    ref = kp.convert_kps(x, src, dst)
    ours = J.convert_kps(x, src, dst)
    np.testing.assert_allclose(ours, ref)
    # jax path agrees with numpy path
    import jax.numpy as jnp

    ours_jax = np.asarray(J.convert_kps(jnp.asarray(x), src, dst))
    np.testing.assert_allclose(ours_jax, ref, atol=1e-6)


def test_left_right_and_hflip():
    for fmt in ["spin", "kinectv2", "common"]:
        assert J.get_left_right_index(fmt) == tuple(kp.get_left_right_index(fmt)) or \
            list(J.get_left_right_index(fmt)) == list(kp.get_left_right_index(fmt))
    x = np.random.default_rng(1).uniform(0, 100, size=(4, 10, 3))
    np.testing.assert_allclose(
        J.keypoint_hflip(x, 224), kp.keypoint_hflip(x.copy(), 224)
    )
