"""Training CLI smoke: synthetic shards -> a few steps -> checkpoint/resume."""

import glob
import os
import os.path as osp

import numpy as np
import pytest


def _make_shards(d, n=8, img=64, num_joints=29, seed=0):
    rng = np.random.default_rng(seed)
    for shard in range(2):
        np.savez(
            str(d / f"shard{shard}.npz"),
            images=rng.integers(0, 255, (n, img, img, 3)).astype(np.uint8),
            kp_2d=np.concatenate(
                [rng.normal(size=(n, num_joints, 2)),
                 np.ones((n, num_joints, 1))], -1).astype(np.float32),
            kp_3d=np.concatenate(
                [rng.normal(size=(n, num_joints, 3)),
                 np.ones((n, num_joints, 1))], -1).astype(np.float32),
            pose=np.tile(np.eye(3, dtype=np.float32), (n, 24, 1, 1)),
            betas=(rng.normal(size=(n, 10)) * 0.03).astype(np.float32),
            has_smpl=np.ones((n,), np.float32),
        )


@pytest.mark.slow
def test_train_cli_steps_and_resume(tmp_path):
    from gaitlab.cli import train

    _make_shards(tmp_path)
    workdir = str(tmp_path / "run")
    args = train.build_parser().parse_args([
        "--data", str(tmp_path / "shard*.npz"),
        "--workdir", workdir,
        "--batch_size", "2",
        "--steps", "4",
        "--save_every", "2",
        "--log_every", "2",
        "--lr", "1e-4",
    ])
    model, state = train.main(args)
    assert int(state.step) == 4
    assert osp.isdir(osp.join(workdir, "ckpt"))

    # resume continues from the saved step
    args2 = train.build_parser().parse_args([
        "--data", str(tmp_path / "shard*.npz"),
        "--workdir", workdir,
        "--batch_size", "2",
        "--steps", "6",
        "--save_every", "100",
        "--resume",
    ])
    _, state2 = train.main(args2)
    assert int(state2.step) == 6


def test_train_cli_gait_shards(tmp_path):
    """--gait with .npz shards: FeatCorrector trains and checkpoints.
    (The --data synthetic trunk-feature path is covered by
    test_gait_training.py::test_gait_training_on_real_trunk_features.)"""
    from gaitlab import training
    from gaitlab.cli import train

    b, t, j, c = 2, 8, 4, 8
    batch = training.synthetic_gait_batch(b, t=t, j=j, c=c, seed=0)
    np.savez(str(tmp_path / "gait0.npz"),
             **{k: np.asarray(v) for k, v in batch.items()})
    args = train.build_parser().parse_args([
        "--data", str(tmp_path / "gait*.npz"),
        "--workdir", str(tmp_path / "run"),
        "--gait", "--gait_h_size", "16",
        "--steps", "3", "--save_every", "3", "--log_every", "1",
        "--lr", "1e-3",
    ])
    module, state = train.main(args)
    assert int(state.step) == 3
    assert osp.isdir(osp.join(str(tmp_path / "run"), "ckpt_gait"))
