"""Composed end-to-end numerical oracle: gaitlab demo CLI vs the torch
reference demo composition (VERDICT r4 weak #1 / next-step #1).

Stagewise parity (crop, model, filters, converters, joints, smoothing) is
proven elsewhere; ordering/interplay bugs can hide BETWEEN stages. This
test re-runs the reference demo's exact composition — precomputed
tracklets -> smooth_tracking -> Inference crop -> GRNet forward ->
smooth_pose -> convert_crop_cam_to_orig_img / convert_crop_coords_to_
orig_img -> convert_kps (demo.py:130-267) — stage for stage with the
reference torch code (tests/refutil shims, BN-calibrated random weights),
and asserts one `gaitlab.cli.demo.main()` call on the same PNG clip with
the same imported weights produces the same pkl-level numbers.

Joint-format note (characterized here, documented in PARITY.md): the
reference demo's --smooth path re-evaluates SMPL through
smooth_pose(kinectv2=False) (smooth_pose.py:60-61), which switches
joints3d from the model's spin2 (29) to the spin (49) format, and then
demo.py:225 converts src='spin' -> kinectv2 — zero-filling the four hand
joints (leftHand/rightHand/leftHandTip/rightHandTip exist in spin2 but
not spin). gaitlab keeps spin2 through smoothing (the reference's own
smooth_pose(kinectv2=True) composition, smooth_pose.py:113-114), which
fills all 25 kinectv2 joints; the oracle below therefore compares
joints3d against the reference's kinectv2=True smooth path, and
separately asserts the demo-path defect (zero hands) is real.
"""

import os
import os.path as osp

import cv2
import joblib
import numpy as np
import pytest
import torch

import refutil

N, W, H = 32, 320, 240
MISSING = (14, 15)  # in-track hole (gap <= smooth_tracking interv-1: kept)


def _write_clip(frames_dir: str):
    """Deterministic moving-person clip as 1-indexed PNGs (the frame
    naming video_to_images produces, demo_utils.py:105)."""
    os.makedirs(frames_dir, exist_ok=True)
    rng = np.random.default_rng(3)
    bg = rng.integers(40, 70, size=(H, W, 3)).astype(np.uint8)
    for f in range(N):
        img = bg.copy()
        x = 15 + 6 * f
        cv2.rectangle(img, (x, 40), (x + 50, 200), (210, 190, 180), -1)
        cv2.circle(img, (x + 25, 55), 14, (200, 170, 160), -1)
        cv2.line(img, (x + 10, 200), (x + 2 + (f % 7), 232), (185, 170, 160), 5)
        cv2.line(img, (x + 40, 200), (x + 48 - (f % 5), 232), (185, 170, 160), 5)
        cv2.imwrite(osp.join(frames_dir, f"{f + 1:06d}.png"), img)
    present = np.array([f for f in range(N) if f not in MISSING])
    bboxes = np.array([(15 + 6.0 * f + 25.0, 130.0, 190.0, 190.0)
                       for f in present], np.float32)
    return present, bboxes


def _build_calibrated_ref(tmpdir: str):
    """Reference GRNet with random weights + BN-calibrated running stats
    (scripts/precision_study.py build_oracle recipe: fresh running stats
    collapse the deep stack into an input-independent function), saved in
    the demo's gen_state_dict checkpoint flavour (demo.py:116-117)."""
    torch.manual_seed(0)
    from lib.models.hrnet import hrnet_w32 as ref_hrnet_w32
    from lib.models.pare import PareHead as RefPareHead

    hrnet = ref_hrnet_w32(pretrained=False, pretrained_ckpt="",
                          use_conv=True, downsample=False)
    torch.save(hrnet.state_dict(), "data/grnet_data/hrnet_w32.pth.tar")
    head = RefPareHead(num_joints=24, num_input_features=480,
                       num_features_pare=128, num_features_smpl=64)
    torch.save({"state_dict": {f"model.head.{k}": v
                               for k, v in head.state_dict().items()}},
               "data/grnet_data/pare_w_3dpw_checkpoint.ckpt")

    from lib.models.grnet import GRNet as RefGRNet

    RefGRNet.is_demo = True
    ref = RefGRNet(writer=None, seqlen=8)
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.reset_running_stats()
            m.momentum = None  # cumulative average: exact batch stats
    ref.train()
    calib = np.random.default_rng(5).normal(
        size=(16, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref(torch.tensor(calib))
    ref.eval()
    # Tame the cam/shape head outputs to trained-model magnitudes. Raw
    # random single-Linear heads emit +-30-scale cam/betas, which (a)
    # amplifies the <=1-uint8-count crop-boundary noise (device warp vs
    # cv2.warpAffine) by ~1000x, drowning composition signal, and (b)
    # drives smoothing/SMPL/coord-conversion far outside their working
    # regime. A 0.02 weight scale + the canonical weak-perspective cam
    # base keeps every path live and input-sensitive while a real
    # composition bug (stage swap, wrong format, unit error) still shows
    # at O(output scale) = ~50x the tolerances below.
    with torch.no_grad():
        for mlp in (ref.head.cam_mlp, ref.head.shape_mlp):
            for p in mlp.parameters():
                p.mul_(0.02)
        ref.head.cam_mlp.bias.add_(torch.tensor([0.9, 0.0, 0.0]))
    ckpt_path = osp.join(tmpdir, "oracle_ckpt.pth")
    torch.save({"gen_state_dict": ref.state_dict()}, ckpt_path)
    return ref, ckpt_path


def _ref_demo_composition(ref, frames_dir, trackfile):
    """The reference demo model loop, stage for stage (demo.py:130-267)."""
    from torch.utils.data import DataLoader

    from lib.data_utils.kp_utils import convert_kps as ref_convert_kps
    from lib.dataset.inference import Inference
    from lib.utils.demo_utils import (convert_crop_cam_to_orig_img,
                                      convert_crop_coords_to_orig_img,
                                      smooth_tracking)
    from lib.utils.smooth_pose import smooth_pose as ref_smooth_pose

    tracking_results = joblib.load(trackfile)
    tracking_results, _ = smooth_tracking(tracking_results)  # demo.py:98
    for pid in list(tracking_results):  # demo.py:100-102 MIN_NUM_FRAMES
        if tracking_results[pid]["frames"].shape[0] < 25:
            del tracking_results[pid]
    assert list(tracking_results) == [0]
    bboxes = tracking_results[0]["bbox"]
    frames = tracking_results[0]["frames"]

    dataset = Inference(image_folder=frames_dir, frames=frames,
                        bboxes=bboxes, joints2d=None, scale=1.0)
    bboxes, frames = dataset.bboxes, dataset.frames  # demo.py:142-143
    loader = DataLoader(dataset, batch_size=len(dataset), num_workers=0)
    with torch.no_grad():
        batch = next(iter(loader)).unsqueeze(0)  # demo.py:159-160
        out = ref(batch)[-1]
        B, T = batch.shape[:2]
        pred_cam = out["theta"][:, :, :3].reshape(B * T, -1).numpy()
        pose = out["theta"][:, :, 3:75].reshape(B * T, -1).numpy()
        betas = out["theta"][:, :, 75:].reshape(B * T, -1).numpy()
        joints3d_raw = out["kp_3d"].reshape(B * T, -1, 3).numpy()
        joints2d = out["kp_2d"].reshape(B * T, -1, 2).numpy()

    # degenerate-oracle guard (CLAUDE.md BN-calibration note): the
    # composition comparison is vacuous unless outputs vary with input
    spread_mm = float(np.linalg.norm(
        joints3d_raw - joints3d_raw.mean(0), axis=-1).mean() * 1000.0)
    assert spread_mm > 5.0, f"input-independent oracle ({spread_mm} mm)"

    # --smooth: 1-euro + SMPL re-eval (demo.py:203-208). kinectv2=True is
    # the reference's own spin2->kinectv2 smooth composition
    # (smooth_pose.py:113-114) that gaitlab mirrors; kinectv2=False (the
    # demo default) switches to spin-49 and the later src='spin' convert
    # zero-fills the 4 hand joints (defect, asserted in the test below).
    verts, pose_hat, joints3d_kv2 = ref_smooth_pose(
        pose.copy(), betas, min_cutoff=0.004, beta=0.7, kinectv2=True)
    _, _, joints3d_spin = ref_smooth_pose(
        pose.copy(), betas, min_cutoff=0.004, beta=0.7, kinectv2=False)
    joints3d_demo = ref_convert_kps(joints3d_spin, src="spin",
                                    dst="kinectv2")

    orig_cam = convert_crop_cam_to_orig_img(
        cam=pred_cam, bbox=bboxes, img_width=W, img_height=H)
    joints2d_img = convert_crop_coords_to_orig_img(
        bbox=bboxes, keypoints=joints2d, crop_size=224)

    return dict(frames=frames, bboxes=bboxes, pred_cam=pred_cam,
                pose=pose_hat, betas=betas, verts=verts,
                joints3d=joints3d_kv2, joints3d_demo_path=joints3d_demo,
                orig_cam=orig_cam, joints2d=joints2d_img,
                spread_mm=spread_mm)


@pytest.mark.slow
def test_demo_matches_reference_numerically(tmp_path, monkeypatch):
    monkeypatch.setenv("GAITLAB_BUCKETS", "64")
    tmpdir = str(tmp_path)
    refutil.setup_ref_data_dir(tmpdir, seed=0)
    monkeypatch.chdir(tmpdir)
    refutil.import_ref_lib()

    frames_dir = osp.join(tmpdir, "frames")
    present, bboxes = _write_clip(frames_dir)
    trackfile = osp.join(tmpdir, "tracks.pkl")
    joblib.dump({0: {"frames": present, "bbox": bboxes.copy()}}, trackfile)

    ref, ckpt_path = _build_calibrated_ref(tmpdir)
    expect = _ref_demo_composition(ref, frames_dir, trackfile)

    # ---- gaitlab: ONE demo CLI call on the same inputs ----
    from gaitlab.cli import demo

    args = demo.build_parser().parse_args([
        "--img_folder", frames_dir,
        "--tracking_path", trackfile,
        "--ckpt", ckpt_path,
        "--smpl_model", osp.join(tmpdir, "data", "smpl_data",
                                 "SMPL_NEUTRAL.pkl"),
        "--output_folder", osp.join(tmpdir, "out"),
        "--joint_type", "kinectv2",
        "--smooth",
        "--save_vid",  # store_false: disables the overlay video
        "--precision", "float32",
        "--cfg", "/root/reference/configs/config_grnet.yaml",
    ])
    res = demo.main(args)[0]

    # composition-identity stages: exact
    np.testing.assert_array_equal(res["frame_ids"], expect["frames"])
    np.testing.assert_allclose(res["bboxes"], expect["bboxes"],
                               rtol=0, atol=1e-5)

    # model-output stages: f32-parity tolerances. The remaining delta is
    # the crop boundary (device warp vs cv2.warpAffine, <=1 uint8 count on
    # scattered border pixels) amplified by a BN-calibrated random-weight
    # stack — the pathological regime; trained weights sit far inside.
    def mm(a, b):  # mean joint/vertex error in mm (synthetic scale ~0.3)
        return float(np.linalg.norm(np.asarray(a, np.float64) - b,
                                    axis=-1).mean() * 1000.0)

    # pose is compared as rotations: axis-angle has a +-pi sign ambiguity
    # (an angle-axis near pi can round-trip with flipped sign through the
    # rot6d -> rotmat -> angle-axis chain), so raw-value max-abs spikes
    # while the rotation — and everything downstream (joints3d 0.25 mm) —
    # is identical. Geodesic distance is the representation-free metric.
    from scipy.spatial.transform import Rotation

    rot_res = Rotation.from_rotvec(np.asarray(res["pose"],
                                              np.float64).reshape(-1, 3))
    rot_exp = Rotation.from_rotvec(np.asarray(expect["pose"],
                                              np.float64).reshape(-1, 3))
    geo = (rot_res * rot_exp.inv()).magnitude()
    checks = {
        "pred_cam": float(np.abs(res["pred_cam"] - expect["pred_cam"]).max()),
        "orig_cam": float(np.abs(res["orig_cam"] - expect["orig_cam"]).max()),
        "pose": float(geo.mean()),
        "pose_max": float(geo.max()),
        "betas": float(np.abs(res["betas"] - expect["betas"]).max()),
        "verts_mm": mm(res["verts"], expect["verts"]),
        "joints3d_mm": mm(res["joints3d"], expect["joints3d"]),
        "joints2d_px": float(np.linalg.norm(
            res["joints2d"] - expect["joints2d"], axis=-1).mean()),
    }
    print(f"composed-oracle deltas (oracle spread "
          f"{expect['spread_mm']:.1f} mm): {checks}")

    # Tolerance floor: the <=1-uint8-count crop-boundary delta (device
    # warp vs cv2.warpAffine) through a BN-calibrated random-weight stack
    # (the pathological amplification regime; measured deltas sit ~2-3x
    # under these). A composition bug (stage swap, wrong joint format,
    # unit error) shows at O(output scale) = 10-50x over.
    assert res["joints3d"].shape == (len(expect["frames"]), 25, 3)
    assert checks["pred_cam"] < 0.05, checks
    assert checks["orig_cam"] < 0.05, checks
    # geodesic rotation distance (rad): a permuted/offset pose layout
    # would put MANY joints at O(pi); crop noise puts a FEW small-norm-6D
    # end joints (tiny lever arm, see joints3d_mm) at a few degrees
    assert checks["pose"] < 0.01, checks
    assert checks["pose_max"] < 0.2, checks
    assert checks["betas"] < 0.05, checks
    assert checks["verts_mm"] < 3.0, checks
    assert checks["joints3d_mm"] < 3.0, checks
    assert checks["joints2d_px"] < 2.0, checks

    # The reference demo-path defect is real and exactly this shape
    # (PARITY.md footer): on the --smooth path its spin-src conversion
    # (a) zero-fills the 4 hand joints the model actually predicts
    # (absent from spin-49), and (b) sources hip / Spine (H36M) / neck /
    # Head (H36M) from the spin-49 assembly's vertex/H36M-regressed
    # variants instead of the spin2 joints every other composition in the
    # repo emits. gaitlab follows the reference's own
    # smooth_pose(kinectv2=True) spin2 composition uniformly; the
    # remaining 17 joints are bit-identical between the two paths.
    from lib.data_utils.kp_utils import (get_kinectv2_joint_names,
                                         get_spin_joint_names)
    kv2, spin = get_kinectv2_joint_names(), get_spin_joint_names()
    hands = [i for i, n in enumerate(kv2) if n not in spin]
    assert len(hands) == 4
    np.testing.assert_array_equal(
        expect["joints3d_demo_path"][:, hands], 0.0)
    divergent = {"hip", "Spine (H36M)", "neck", "Head (H36M)"}
    same = [i for i, n in enumerate(kv2)
            if n in spin and n not in divergent]
    diff = np.abs(expect["joints3d_demo_path"] - expect["joints3d"])
    np.testing.assert_allclose(diff[:, same], 0.0, atol=1e-6)
    for n in divergent:
        assert diff[:, kv2.index(n)].max() > 1e-5, n
    assert np.abs(res["joints3d"][:, hands]).max() > 1e-3
