"""Deployment CLI: version-pinned serving from StableHLO artifacts.

The reference has no deployment story at all — every host rebuilds the
torch model from Python source + checkpoint and re-traces it
(/root/reference/demo.py:401-420). A TPU fleet wants the opposite: a
build step that compiles + pins the program once, and serving hosts that
run the pinned artifact with zero Python model code.

  # build box: checkpoint -> self-contained artifact directory
  python -m gaitlab.cli.serve export --ckpt max-grnet.pth.tar \
      --smpl_model data/smpl_data/SMPL_NEUTRAL.pkl --artifacts art/

  # serving box: artifact directory -> per-track pkl (demo.py schema)
  python -m gaitlab.cli.serve run --artifacts art/ \
      --vid_file clinic_walk.mp4 --output_folder out/

`run` drives the SAME one-pass pipeline as `demo --onepass` (single
decode, streaming detect/track/crop, bucketed padded dispatch) — only the
per-bucket forward is the deserialized jax.export program instead of a
fresh jit trace (gaitlab/serve.py::load_runner), and the weights come
from the artifact directory (weights.npz).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("export", help="checkpoint -> artifact directory")
    ex.add_argument("--artifacts", type=str, required=True,
                    help="output artifact directory")
    ex.add_argument("--ckpt", type=str, default=None,
                    help="pretrained GRNet checkpoint (.pth.tar)")
    ex.add_argument("--cfg", type=str, default=None, help="yacs yaml")
    ex.add_argument("--smpl_model", type=str, default=None,
                    help="SMPL_*.pkl body model file")
    ex.add_argument("--buckets", type=str, default=None,
                    help="comma-separated batch buckets to export "
                         "(default: the runner's bucket set)")
    ex.add_argument("--platforms", type=str, default="tpu,cpu",
                    help="lowering platforms (default tpu,cpu)")
    ex.add_argument("--precision", type=str, default=None,
                    help="trunk matmul precision (default: the "
                         "accuracy-qualified 'high' + bf16 head)")
    ex.add_argument("--crop_size", type=int, default=224,
                    help="crop resolution; non-224 sizes build a "
                         "matching (test/edge) trunk via init_img")

    rn = sub.add_parser("run", help="artifact directory -> joints pkl")
    rn.add_argument("--artifacts", type=str, required=True)
    rn.add_argument("--vid_file", type=str, required=True)
    rn.add_argument("--output_folder", type=str, default="output/")
    rn.add_argument("--detector", type=str, default="median_bg",
                    choices=["yolo", "dnn", "median_bg"])
    rn.add_argument("--joint_type", type=str, default="spin2")
    rn.add_argument("--smooth", action="store_true")
    rn.add_argument("--smooth_min_cutoff", type=float, default=0.004)
    rn.add_argument("--smooth_beta", type=float, default=1.5)
    return p


def main_export(args) -> int:
    from gaitlab.cli import demo as demo_cli
    from gaitlab import serve
    from gaitlab.pipeline.runner import GRNetRunner

    model_args = argparse.Namespace(ckpt=args.ckpt,
                                    smpl_model=args.smpl_model)
    if args.crop_size == 224:
        model = demo_cli.load_model(model_args, None)
    else:
        # small-trunk build for tests / edge deployments: the PARE head's
        # locally-connected params depend on the crop grid (grnet.py)
        from gaitlab.nn.grnet import GRNet

        if args.ckpt:
            print("WARNING: --ckpt ignored for non-224 crop sizes "
                  "(checkpoint layouts are 224-trained)")
        model = GRNet.create(init_img=args.crop_size)

    kw = {"crop_size": args.crop_size}
    if args.buckets:
        kw["buckets"] = tuple(
            int(b) for b in args.buckets.split(",") if b)
    if args.precision:
        kw["precision"] = args.precision
    runner = GRNetRunner(model, **kw)
    platforms = tuple(p for p in args.platforms.split(",") if p)
    t0 = time.time()
    manifest = serve.save_artifacts(runner, args.artifacts,
                                    platforms=platforms)
    n = len(manifest["files"])
    print(f"Exported {n} bucket programs + weights to {args.artifacts} "
          f"in {time.time() - t0:.1f}s "
          f"(precision={manifest['precision']}, "
          f"head={manifest['head_precision']}, "
          f"platforms={manifest['platforms']})")
    return 0


def main_run(args) -> int:
    import joblib

    from gaitlab import serve
    from gaitlab.cli.demo import _person_output
    from gaitlab.pipeline import detect
    from gaitlab.pipeline import stream as stream_mod
    from gaitlab.pipeline import video as video_mod

    if not osp.isfile(args.vid_file):
        print(f"Input video does not exist: {args.vid_file}")
        return 1
    runner = serve.load_runner(args.artifacts)
    print(f"Loaded {len(runner.buckets)} pinned programs "
          f"(buckets {list(runner.buckets)}, "
          f"precision={runner.precision}) from {args.artifacts}")

    detector = detect.get_detector(args.detector)
    t0 = time.time()
    res = stream_mod.run_video_onepass(runner, args.vid_file,
                                       detector=detector)
    _n, _fps, w, h = video_mod.get_video_info(args.vid_file)
    results = {}
    for pid, out in res.items():
        results[pid] = _person_output(
            out, out["bboxes"], out["frames"], pid, args,
            runner.model, w, h)
    dt = time.time() - t0

    os.makedirs(args.output_folder, exist_ok=True)
    base = osp.splitext(osp.basename(args.vid_file))[0]
    pkl = osp.join(args.output_folder, f"{base}_serve_output.pkl")
    joblib.dump(results, pkl)
    n_frames = len({int(f) for r in results.values()
                    for f in r["frame_ids"]})
    fps = n_frames / dt if dt > 0 else float("nan")
    print(f"{len(results)} tracks, {n_frames} frames in {dt:.1f}s "
          f"({fps:.1f} fps) -> {pkl}")
    return 0


def main_cli(argv=None) -> int:
    from gaitlab.utils import enable_compile_cache

    enable_compile_cache()  # export-time compiles land in the warm cache
    args = build_parser().parse_args(argv)
    return main_export(args) if args.cmd == "export" else main_run(args)


if __name__ == "__main__":
    sys.exit(main_cli())
