"""Training CLI: fine-tune the PARE head (+ gait branch) on keypoint data.

The reference ships no training code (its config carries a "TODO training
params" marker, /root/reference/lib/core/config.py:41); this completes the
framework with a minimal, TPU-native trainer:

  * data: .npz shards with images (N,224,224,3 uint8 or normalized f32),
    kp_2d (N,J,3 incl. confidence), kp_3d (N,J,4 incl. confidence),
    pose (N,24,3,3), betas (N,10), has_smpl (N,);
  * step: gaitlab.training (SPIN/PARE-style losses), jitted over the
    ("data","model") mesh from gaitlab.parallel when >1 device;
  * checkpoints: Orbax save/restore every --save_every steps, resumable.
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True,
                   help="glob of .npz training shards")
    p.add_argument("--workdir", type=str, default="runs/train",
                   help="checkpoints + logs directory")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_every", type=int, default=200)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_ckpt", type=str, default="",
                   help="torch checkpoint to initialise from")
    p.add_argument("--smpl_model", type=str, default=None)
    p.add_argument("--use_mesh", action="store_true",
                   help="jit over all visible devices (data parallel)")
    p.add_argument("--gait", action="store_true",
                   help="train the gait-branch FeatCorrector on REAL trunk "
                        "pose features (training.trunk_gait_batch): "
                        "--data 'synthetic' renders walker clips with known "
                        "speed/phase and runs the backbone+PARE extractor; "
                        "otherwise --data globs .npz shards with keys "
                        "features/clean_features/cparams/gait_avg/gait_phase")
    p.add_argument("--gait_clips", type=int, default=6,
                   help="walker clips per generated batch (--data synthetic)")
    p.add_argument("--gait_seq_len", type=int, default=32)
    p.add_argument("--gait_img", type=int, default=64,
                   help="crop size for trunk feature extraction")
    p.add_argument("--gait_h_size", type=int, default=256)
    return p


def _load_shards(pattern: str) -> dict:
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no shards match {pattern}")
    parts = [np.load(f) for f in files]
    keys = ("images", "kp_2d", "kp_3d", "pose", "betas", "has_smpl")
    return {k: np.concatenate([p[k] for p in parts], axis=0) for k in keys}


def _batches(data: dict, batch_size: int, steps: int, seed: int):
    import numpy.random as npr

    n = data["images"].shape[0]
    rng = npr.default_rng(seed)
    for _ in range(steps):
        idx = rng.integers(0, n, batch_size)
        batch = {k: v[idx] for k, v in data.items()}
        img = batch["images"]
        if img.dtype == np.uint8:
            from gaitlab.pipeline.crop import normalize_image
            import jax.numpy as jnp

            batch["images"] = np.asarray(normalize_image(jnp.asarray(img)))
        yield batch


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    from gaitlab import training
    from gaitlab.utils import enable_compile_cache

    enable_compile_cache()  # repeat train-step shapes compile warm
    from gaitlab.cli.demo import load_model
    from gaitlab.utils import AverageMeter, create_logger
    from gaitlab.weights import cache as wcache

    os.makedirs(args.workdir, exist_ok=True)
    logger = create_logger(args.workdir, phase="train")
    if args.gait:
        return main_gait(args, logger)

    ns = argparse.Namespace(ckpt=args.init_ckpt, smpl_model=args.smpl_model,
                            cfg=None)
    model = load_model(ns, cfg=None)
    optimizer = optax.adam(args.lr)
    state = training.create_train_state(model.variables, optimizer)

    ckpt_dir = osp.abspath(osp.join(args.workdir, "ckpt"))
    start_step = 0
    if args.resume and osp.isdir(ckpt_dir):
        state = wcache.load(ckpt_dir, state)
        start_step = int(state.step)
        logger.info(f"resumed from step {start_step}")

    step_fn = training.make_train_step(model.module, model.smpl, optimizer)
    if args.use_mesh and len(jax.devices()) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gaitlab.parallel import make_mesh, param_shardings

        mesh = make_mesh()
        state_sh = training.TrainState(
            params=param_shardings(state.params, mesh),
            opt_state=param_shardings(state.opt_state, mesh),
            step=NamedSharding(mesh, P()))
        batch_sh = NamedSharding(mesh, P("data"))
        step_fn = jax.jit(step_fn, in_shardings=(state_sh, batch_sh),
                          out_shardings=(state_sh, NamedSharding(mesh, P())))
        state = jax.device_put(state, state_sh)
    else:
        step_fn = jax.jit(step_fn)

    data = _load_shards(args.data)
    logger.info(f"{data['images'].shape[0]} samples loaded")
    meter = AverageMeter()
    t0 = time.time()
    for i, batch in enumerate(
            _batches(data, args.batch_size, args.steps - start_step,
                     args.seed), start=start_step + 1):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        meter.update(float(metrics["loss"]))
        if i % args.log_every == 0:
            rate = args.batch_size * args.log_every / (time.time() - t0)
            logger.info(f"step {i}: loss {meter.avg:.4f} "
                        f"({rate:.1f} samples/s)")
            meter.reset()
            t0 = time.time()
        if i % args.save_every == 0 or i == args.steps:
            wcache.save(jax.device_get(state), ckpt_dir)
            logger.info(f"checkpoint saved at step {i}")
    model.variables = jax.device_get(state.params)
    return model, state


def main_gait(args, logger):
    """Gait-branch trainer: FeatCorrector on trunk pose features.

    The reference's use_gt_gaitfeat intent (feature_correction.py:19,
    126-129) with a runnable data path: synthetic walking clips with
    generator-known speed/phase run through the REAL backbone + PARE
    feature extractor (training.trunk_gait_batch), or user .npz shards
    carrying the same contract."""
    import jax
    import optax

    from gaitlab import training
    from gaitlab.nn.gait import FeatCorrector
    from gaitlab.pipeline.crop import generate_patch_image, normalize_image
    from gaitlab.utils import AverageMeter
    from gaitlab.weights import cache as wcache
    import jax.numpy as jnp

    if args.data == "synthetic":
        from gaitlab.nn.grnet import GRNet

        model = GRNet.create(init_img=args.gait_img)
        frames, bboxes, _ = training.synthetic_walker_clip(
            16, seed=args.seed + 99)
        crops = np.stack([generate_patch_image(
            frames[i], *bboxes[i], args.gait_img, args.gait_img,
            scale=1.0)[0] for i in range(16)])
        model.variables = training.calibrate_backbone_bn(
            model.module, model.variables, normalize_image(
                jnp.asarray(crops)))
        logger.info("rendering walker clips + extracting trunk features...")
        batches = [training.trunk_gait_batch(
            model, b=args.gait_clips, t=args.gait_seq_len,
            img=args.gait_img, seed=args.seed + 31 * s) for s in range(4)]
    else:
        files = sorted(glob.glob(args.data))
        if not files:
            raise FileNotFoundError(f"no gait shards match {args.data}")
        keys = ("features", "clean_features", "cparams", "gait_avg",
                "gait_phase")
        batches = [{k: np.asarray(np.load(f)[k], np.float32) for k in keys}
                   for f in files]
    f0 = batches[0]["features"]
    j, c = f0.shape[2], f0.shape[3]
    module = FeatCorrector(num_joints=j, feat_dim=c,
                           h_size=args.gait_h_size, num_heads=2,
                           stop_gaitfeat_grad=False)
    params = module.init(jax.random.PRNGKey(args.seed), f0,
                         batches[0]["cparams"])
    optimizer = optax.adam(args.lr)
    state = training.create_train_state(params, optimizer)

    ckpt_dir = osp.abspath(osp.join(args.workdir, "ckpt_gait"))
    start_step = 0
    if args.resume and osp.isdir(ckpt_dir):
        state = wcache.load(ckpt_dir, state)
        start_step = int(state.step)
        logger.info(f"resumed from step {start_step}")

    step_fn = jax.jit(training.make_gait_train_step(module, optimizer))
    meter = AverageMeter()
    t0 = time.time()
    for i in range(start_step + 1, args.steps + 1):
        state, metrics = step_fn(state, batches[(i - 1) % len(batches)])
        meter.update(float(metrics["loss"]))
        if i % args.log_every == 0:
            rate = args.log_every / (time.time() - t0)
            logger.info(f"step {i}: gait loss {meter.avg:.4f} "
                        f"({rate:.1f} steps/s)")
            meter.reset()
            t0 = time.time()
        if i % args.save_every == 0 or i == args.steps:
            wcache.save(jax.device_get(state), ckpt_dir)
            logger.info(f"gait checkpoint saved at step {i}")
    return module, state


def main_cli():
    main(build_parser().parse_args())


if __name__ == "__main__":
    main_cli()
