"""Per-stage matmul-precision sensitivity study on the real TPU.

VERDICT r1 next-step #2: the f32 parity path (matmul precision HIGHEST =
six bf16 passes on TPU) costs ~80% of the machine; find the cheapest
precision assignment that stays inside the 0.5 mm MPJPE budget vs the
PyTorch reference, and report MPJPE for EVERY speed mode so no throughput
number ships without an error bar.

Oracle: the reference torch GRNet (/root/reference/lib/models/grnet.py)
built with random weights via tests/refutil, imported into gaitlab with the
standard checkpoint translation — the same harness as
tests/test_models_parity.py, run here against the real TPU instead of the
CPU backend. Random weights are the *pathological* regime for bf16 error
compounding (no trained-weight smoothness), so the numbers below are
upper bounds.

Throughput uses the device-side dependency-chain discipline (bench.py):
through the axon tunnel `block_until_ready` returns before the device
finishes, so iteration i+1 must consume a scalar from iteration i.

Writes docs/PRECISION.json and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import contextlib
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))
sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

BATCH = 128
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_oracle(tmpdir: str):
    """Reference torch GRNet (random weights) + matching gaitlab model."""
    import torch

    import refutil
    from gaitlab.body import smpl as gsmpl
    from gaitlab.nn.grnet import GRNet
    from gaitlab.weights import torch_import as ti

    refutil.setup_ref_data_dir(tmpdir, seed=0)
    os.chdir(tmpdir)
    refutil.import_ref_lib()
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
    ref.eval()

    # Fresh random weights leave BatchNorm running stats at (0,1), which
    # collapses the deep conv stack: the output becomes input-INDEPENDENT
    # (joint spread across random frames ~0.001 mm), making any precision
    # comparison vacuous. Calibrate the BN running stats on random batches
    # (cumulative-average momentum, train-mode passes) so activations stay
    # unit-scale through depth and the output actually depends on the
    # input — only then does bf16-vs-f32 error mean anything.
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.reset_running_stats()
            m.momentum = None
    ref.train()
    calib = np.random.default_rng(5).normal(
        size=(32, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        for _ in range(2):
            ref(torch.tensor(calib))
    ref.eval()

    smpl_params = gsmpl.load_smpl_params("data/smpl_data/SMPL_NEUTRAL.pkl")
    smpl_params = gsmpl.with_extra_regressor(
        smpl_params, "data/smpl_data/J_regressor_extra.npy")
    ours = GRNet.create(smpl_params=smpl_params)
    variables, missing, _ = ti.import_grnet_ckpt(
        ref.state_dict(), ours.variables, strict=False)
    assert not missing, missing[:5]
    ours.variables = variables
    return ref, ours


def torch_reference_outputs(ref, images_nchw: np.ndarray) -> dict:
    import torch

    outs = []
    with torch.no_grad():
        for s in range(0, len(images_nchw), 16):
            out = ref(torch.tensor(images_nchw[s : s + 16]))[-1]
            outs.append({k: v.numpy()[0] for k, v in out.items()
                         if k in ("kp_3d", "verts", "theta")})
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


REGIONS = ("stem", "layer1", "stage2", "stage3", "stage4", "heads")

_STEM_KEYS = ("conv1", "bn1", "conv2", "bn2")


def parse_mode(mode: str):
    """Mode -> (bb_p, hd_p, sm_p, regions, trunk16, f32_stem).

    Grammar (beyond the round-2 named modes):
      A:<region>       backbone "high" with ONE region at single-pass
                       default, head+SMPL f32 — per-region bf16
                       sensitivity, isolated from head error.
      B:<r1+r2+...>    backbone default with the listed regions at
                       "high", head "high", SMPL f32 — candidate
                       production mixes.
      bb_high+head_default   judge-requested: error provably lives in the
                       backbone, so run the head at single-pass bf16.
      bf16trunk+f32stem      bf16 weights/activations everywhere EXCEPT
                       the stem (f32 params + HIGH precision), testing
                       whether first-layer rounding seeds the bf16 error.
    """
    regions = ()
    trunk16 = False
    f32_stem = False
    l1act16 = mode.endswith("+l1act16")
    if l1act16:
        # layer1 activations STORED as genuine bf16 at every block
        # boundary, convs consuming them natively via the region's w2x
        # mode (the faithful "bf16 activation storage under high
        # matmuls": x_lo = 0 degenerates bf16_3x to the 2-pass kernel
        # split). The MFU-trace-nominated probe for the one remaining
        # HBM-bound block (layer1: 10.5 ms at 75% of HBM peak streaming
        # 56²x256 f32).
        mode = mode[: -len("+l1act16")]
    s2d = mode.endswith("+s2d")
    if s2d:
        mode = mode[: -len("+s2d")]
    resize_high = mode.endswith("+resize_high")
    if resize_high:
        # bilinear-resize einsums at 3-pass "high" instead of 6-pass
        # HIGHEST: the MFU trace shows them HBM-bound (~600 GB/s at 18%
        # MXU), so this probes whether fewer passes cut their traffic.
        mode = mode[: -len("+resize_high")]
    heads_2p = None
    for suffix in ("+heads_w2x", "+heads_a2x"):
        if mode.endswith(suffix):
            # HR upsample-head convs at an explicit 2-pass decomposition
            # (layers.conv_w2x / conv_a2x) — the MFU-trace-nominated
            # probe: those convs are compute-bound at 92% MXU under HIGH,
            # so pass count is their only lever; w2x rounds the
            # activation once, a2x rounds the kernel once.
            heads_2p = suffix[-3:]
            mode = mode[: -len(suffix)]
    if mode in ("default", "high", "float32"):
        bb_p = hd_p = sm_p = mode
    elif mode == "bf16trunk":
        bb_p = hd_p = "default"
        sm_p = "float32"
        trunk16 = True
    elif mode == "bf16trunk+high":
        bb_p = hd_p = "high"
        sm_p = "float32"
        trunk16 = True
    elif mode == "bf16trunk+f32stem":
        bb_p = hd_p = "default"
        sm_p = "float32"
        trunk16 = True
        f32_stem = True
        regions = (("stem", "high"),)
    elif mode == "backbone_high+rest_f32":
        bb_p, hd_p, sm_p = "high", "float32", "float32"
    elif mode == "backbone_default+rest_f32":
        bb_p, hd_p, sm_p = "default", "float32", "float32"
    elif mode == "bb_high+head_default":
        bb_p, hd_p, sm_p = "high", "default", "float32"
    elif mode == "bb_high+head_default+smpl_high":
        # the exact production runner configuration: global "high" context
        # with GRNetCore.head_precision="default"
        bb_p, hd_p, sm_p = "high", "default", "high"
    elif mode.startswith("A:"):
        bb_p, hd_p, sm_p = "high", "float32", "float32"
        regions = ((mode[2:], "default"),)
    elif mode.startswith("B:"):
        bb_p, hd_p, sm_p = "default", "high", "float32"
        regions = tuple((r, "high") for r in mode[2:].split("+") if r)
    elif mode.startswith("W:"):
        # production-candidate mixes: backbone "high" with the listed
        # regions at the 2-pass w2x decomposition (2/3 of high's MACs,
        # activation rounded once, kernel near-exact), PARE head at
        # single-pass bf16, SMPL high — extends the qualified mode after
        # the heads_w2x probe measured kernel rounding (not activation
        # rounding) as the dominant bf16 error source.
        bb_p, hd_p, sm_p = "high", "default", "high"
        regions = tuple((r, "w2x") for r in mode[2:].split("+") if r)
    else:
        raise ValueError(mode)
    if heads_2p:
        regions += (("heads", heads_2p),)
    if l1act16:
        regions += (("layer1", "w2x"),)
    return (bb_p, hd_p, sm_p, regions, trunk16, f32_stem, s2d, resize_high,
            l1act16)


def make_forward(model, mode: str):
    """One jitted crop->outputs forward for a named precision mode."""
    import jax
    import jax.numpy as jnp

    from gaitlab.nn.grnet import vp_regress

    (bb_p, hd_p, sm_p, regions, trunk16, f32_stem, s2d,
     resize_high, l1act16) = parse_mode(mode)
    smpl = model.smpl
    module = model.module
    if regions or f32_stem or s2d or resize_high or l1act16:
        # clone the study model's module so any non-default configuration
        # it carries is preserved — param structure/names are unchanged,
        # so the imported variables apply as-is
        module = module.clone(
            backbone_region_precision=regions,
            backbone_cast_after=(("stem", "bfloat16"),) if f32_stem else (),
            backbone_act_store=(
                (("layer1", "bfloat16"),) if l1act16 else ()),
            stem_s2d=s2d,
            backbone_resize_precision="high" if resize_high else "highest")

    def prec(p):
        return (jax.default_matmul_precision(p) if p != "default"
                else contextlib.nullcontext())

    def fwd(variables, smpl, images, bias):
        x = images + bias
        if trunk16:
            if f32_stem:
                # stem params stay f32; everything downstream bf16 (the
                # activation boundary cast lives in the backbone cfg)
                import jax.tree_util as jtu

                def cast_leaf(path, v):
                    # stem = conv1/bn1/conv2/bn2 DIRECTLY under backbone
                    # (every BasicBlock also has conv1/bn1 names)
                    keys = [getattr(p, "key", None) for p in path]
                    in_stem = any(
                        a == "backbone" and b in _STEM_KEYS
                        for a, b in zip(keys, keys[1:]))
                    if in_stem or not jnp.issubdtype(v.dtype, jnp.floating):
                        return v
                    return v.astype(jnp.bfloat16)

                variables = jtu.tree_map_with_path(cast_leaf, variables)
            else:
                variables = jax.tree_util.tree_map(
                    lambda v: (v.astype(jnp.bfloat16)
                               if jnp.issubdtype(v.dtype, jnp.floating)
                               else v),
                    variables)
                x = x.astype(jnp.bfloat16)
        with prec(bb_p):
            feats = module.apply(variables, x, train=False,
                                 method=lambda m, im, train: m.backbone(
                                     im, train=train))
            feats = jax.lax.stop_gradient(feats)
        with prec(hd_p):
            patt = module.apply(variables, feats,
                                method=lambda m, f: m.head(f))
        patt = {k: (v.astype(jnp.float32) if hasattr(v, "astype") else v)
                for k, v in patt.items()}
        with prec(sm_p):
            out = vp_regress(smpl, patt, batch_size=1, joint_mode="spin2")[0]
        return {k: out[k] for k in ("kp_3d", "verts", "theta")}

    return jax.jit(fwd)


def write_results(repo, results, spread_mm, dev):
    """Write/merge docs/PRECISION.json (filtered runs update rows in
    place, keeping the rest of the table) + print the markdown table."""
    out_path = osp.join(repo, "docs", "PRECISION.json")
    merged = results
    if osp.isfile(out_path):
        old = json.load(open(out_path)).get("results", [])
        new_modes = {r["mode"] for r in results}
        merged = [r for r in old if r["mode"] not in new_modes] + results
    with open(out_path, "w") as f:
        json.dump({"batch": BATCH, "device": str(dev.device_kind),
                   "oracle": ("torch reference, random weights + BN "
                              "calibration (input-sensitive regime)"),
                   "oracle_joint_spread_mm": round(spread_mm, 2),
                   "results": merged}, f, indent=2)
    log(f"wrote {out_path}")

    print("| mode | MPJPE (mm) | PVE (mm) | ms/iter (b128) | fps/chip | <=0.5mm |")
    print("|---|---|---|---|---|---|")
    for r in merged:
        print(f"| {r['mode']} | {r['mpjpe_mm']} | {r['pve_mm']} | "
              f"{r['ms_per_iter']} | {r['fps_per_chip']} | "
              f"{'yes' if r['within_0.5mm'] else 'no'} |")


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    tmpdir = tempfile.mkdtemp(prefix="precstudy")
    ref, model = build_oracle(tmpdir)

    rng = np.random.default_rng(11)
    images = rng.normal(size=(BATCH, 3, 224, 224)).astype(np.float32)
    # the torch oracle is ~10 min on this 1-core host and is a pure
    # function of (seeds, BATCH) — cache it across study invocations
    ocache = osp.expanduser(
        f"~/.cache/gaitlab/precstudy_oracle_b{BATCH}.npz")
    if osp.isfile(ocache):
        log(f"loading cached torch reference outputs ({ocache})")
        ref_out = dict(np.load(ocache))
    else:
        log("computing torch reference outputs (CPU, f32)...")
        ref_out = torch_reference_outputs(ref, images)
        os.makedirs(osp.dirname(ocache), exist_ok=True)
        np.savez(ocache, **ref_out)

    # degeneracy guard: the study is only meaningful if the output varies
    # with the input (see the BN-calibration note in build_oracle)
    kp = ref_out["kp_3d"]
    spread_mm = float(np.linalg.norm(
        kp - kp.mean(0), axis=-1).mean() * 1000.0)
    log(f"oracle joint spread across frames: {spread_mm:.2f} mm")
    assert spread_mm > 10.0, (
        f"degenerate oracle: output spread {spread_mm} mm — BN calibration "
        f"failed, MPJPE comparisons would be vacuous")

    nhwc = np.transpose(images, (0, 2, 3, 1))
    variables, smpl = jax.device_put((model.variables, model.smpl), dev)
    x = jax.device_put(jnp.asarray(nhwc), dev)

    results = []

    def measure(mode: str) -> dict:
        fwd = make_forward(model, mode)
        t0 = time.perf_counter()
        out = fwd(variables, smpl, x, jnp.zeros(()))
        kp3d = np.asarray(out["kp_3d"][0], np.float32)
        verts = np.asarray(out["verts"][0], np.float32)
        log(f"[{mode}] compile+run {time.perf_counter() - t0:.1f}s")

        mpjpe = float(np.linalg.norm(
            kp3d - ref_out["kp_3d"], axis=-1).mean() * 1000.0)
        pve = float(np.linalg.norm(
            verts - ref_out["verts"], axis=-1).mean() * 1000.0)

        # throughput: chained iterations, one host sync at the end
        def chain(n):
            bias = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(n):
                o = fwd(variables, smpl, x, bias)
                bias = o["theta"][0, 0, 0] * 1e-9
            float(bias)
            return time.perf_counter() - t0

        chain(2)  # warm
        dt = chain(ITERS)
        fps = BATCH * ITERS / dt
        log(f"[{mode}] MPJPE {mpjpe:.4f} mm  PVE {pve:.4f} mm  "
            f"{dt / ITERS * 1e3:.1f} ms/iter  {fps:.0f} fps")
        r = {"mode": mode, "mpjpe_mm": round(mpjpe, 4),
             "pve_mm": round(pve, 4),
             "ms_per_iter": round(dt / ITERS * 1e3, 2),
             "fps_per_chip": round(fps, 1),
             "within_0.5mm": mpjpe <= 0.5}
        results.append(r)
        return r

    # -- phase 1: whole-model + stage-split modes (round-2 set, for
    #    continuity) + the judge-requested additions -----------------------
    modes = ["float32", "high", "backbone_high+rest_f32",
             "backbone_default+rest_f32", "default", "bf16trunk",
             "bf16trunk+high", "bf16trunk+f32stem", "bb_high+head_default",
             "bb_high+head_default+smpl_high"]
    # per-region bf16 sensitivity: backbone "high" with exactly one region
    # at single-pass default (head/SMPL f32 so deltas are attributable)
    modes += [f"A:{r}" for r in REGIONS]
    # $GAITLAB_PRECSTUDY_MODES: comma-separated subset to (re-)measure —
    # with the oracle cache this turns a 45-min full study into a ~2-min
    # single-mode probe. The adaptive phase is skipped when filtering.
    only = [m for m in os.environ.get(
        "GAITLAB_PRECSTUDY_MODES", "").split(",") if m]
    if only:
        for mode in only:
            measure(mode)
    else:
        for mode in modes:
            measure(mode)

    # -- phase 2 (adaptive): candidate production mixes -------------------
    # Rank regions by their measured bf16 sensitivity; try keeping only
    # the top-k sensitive regions at "high" (rest single-pass default)
    # until a candidate fits the 0.5 mm budget, then try shaving one more.
    if only:
        write_results(repo, results, spread_mm, dev)
        return
    base = next(r for r in results if r["mode"] == "backbone_high+rest_f32")
    sens = sorted(
        ((r["mode"][2:], r["mpjpe_mm"] - base["mpjpe_mm"])
         for r in results if r["mode"].startswith("A:")),
        key=lambda t: -t[1])
    log("region sensitivity (mm over all-high backbone): "
        + ", ".join(f"{n}={d:+.3f}" for n, d in sens))
    ranked = [n for n, _ in sens]
    tried = set()
    for k in range(1, len(ranked) + 1):
        regs = sorted(ranked[:k])
        mode = "B:" + "+".join(regs)
        if mode in tried:
            continue
        tried.add(mode)
        r = measure(mode)
        if r["within_0.5mm"]:
            break  # smallest qualifying high-set found

    write_results(repo, results, spread_mm, dev)


if __name__ == "__main__":
    main()
