"""HRNet-W32/W48 pose backbone in Flax (NHWC, XLA convolutions).

Re-design of the reference backbone (/root/reference/lib/models/hrnet.py):
same topology (stem, Bottleneck layer1, 3 multi-resolution stages with fuse
layers, bilinear-upsample heads concatenating branches 2-4 onto branch 1 ->
(N, 56, 56, 480) for the deployed downsample=False/use_conv=True config),
but NHWC tensors, statically-unrolled branch structure, and matmul-based
align_corners=True resizes (see layers.upsample_bilinear_align_corners).

Submodule names mirror the torch module paths for mechanical weight import.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaitlab.nn.layers import (
    batch_norm,
    conv,
    upsample_bilinear_align_corners,
    upsample_nearest,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# config (reference hrnet.py:584-623 get_cfg_defaults)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class StageCfg:
    num_modules: int
    num_branches: int
    num_blocks: tuple
    num_channels: tuple
    block: str  # 'BASIC' | 'BOTTLENECK'


@dataclass(frozen=True)
class HRNetCfg:
    width: int = 32
    downsample: bool = False
    use_conv: bool = True
    stage2: StageCfg = None
    stage3: StageCfg = None
    stage4: StageCfg = None
    final_conv_kernel: int = 1
    num_joints: int = 24
    # Evaluate stage branches with <= this many channels on the
    # space-to-depth packed grid (layers.PackedBasicBlock): exactly the
    # same dot products (tests/test_packed_conv.py). 0 = off. Inference
    # only (train=True always uses the standard blocks); weights are
    # interchangeable either way. NOTE: measured SLOWER on TPU v5e at both
    # "default" and "high" matmul precision (scripts/pack_bench.py) — XLA
    # handles the low-channel convs better than the naive 32-of-128-lanes
    # model predicts. Kept as a documented experiment.
    pack_low_channel: int = 0
    # Per-region matmul-precision overrides: tuple of (region, precision)
    # pairs with region in {"stem","layer1","stage2","stage3","stage4",
    # "heads"} and precision a jax.default_matmul_precision name. Regions
    # trace inside their own precision context, overriding whatever the
    # caller set globally — the mixed-precision frontier knob behind the
    # accuracy-qualified speed modes (scripts/precision_study.py; bf16
    # error concentrates in specific stages, so most of the trunk can run
    # single-pass bf16 while the sensitive stages stay at "high").
    # A tuple (not a dict) so the dataclass stays hashable for Flax.
    region_precision: tuple = ()
    # Activation dtype casts at region boundaries: (region, dtype) pairs —
    # activations cast to `dtype` AFTER the named region completes. Used by
    # the bf16-trunk hybrid modes ("stem at f32, rest of the trunk in
    # bf16"): pair with param trees cast per-subtree outside the module.
    cast_after: tuple = ()
    # Activation STORAGE dtype inside a region: (region, dtype) pairs.
    # Unlike cast_after (a single boundary cast, deletable by XLA's
    # convert-pair simplifier when every consumer upcasts), this stores
    # the region's residual stream as genuine narrow arrays at every
    # block boundary via layers.bf16_store, with the region's convs
    # consuming them natively (pair with region_precision=(region,"w2x")
    # so conv_w2x's bf16 path carries the kernel to ~16 mantissa bits).
    # The MFU-trace-nominated HBM-traffic probe for layer1
    # (docs/MFU_TRACE.json: 10.5 ms streaming 56²x256 f32 activations at
    # 75% of HBM peak); measured in docs/PRECISION.json `+l1act16`.
    # Currently honored for "layer1" only.
    act_store: tuple = ()
    # Evaluate the first stem conv on the space-to-depth packed grid
    # (StemConvS2D): identical math, weights interchangeable. Inference-
    # only experiment for the 3-channel lane-starved stem (scripts/
    # stem_s2d_bench.py) — see docs/PERFORMANCE.md for the measurement.
    stem_s2d: bool = False
    # Matmul precision of the bilinear-resize einsums in the upsample
    # heads ("highest" = bit-faithful default; the MFU trace shows them
    # HBM-bound, so this is a measured knob — docs/PRECISION.json
    # `+resize_high`).
    resize_precision: str = "highest"

    @staticmethod
    def w(width: int = 32, downsample: bool = False, use_conv: bool = True,
          pack_low_channel: int = 0,
          region_precision: tuple = (),
          cast_after: tuple = (),
          act_store: tuple = (),
          stem_s2d: bool = False,
          modules: tuple = (1, 4, 3),
          blocks: int = 4,
          resize_precision: str = "highest") -> "HRNetCfg":
        """`modules`/`blocks` shrink stage depth for dryrun/test models:
        the deployed topology (reference hrnet.py STAGE2/3/4 cfg) is
        modules=(1,4,3), blocks=4; e.g. modules=(1,1,1), blocks=1 keeps
        every branch/transition/fuse path (and thus every parameter
        *shape family*) while cutting the op count ~10x — XLA:CPU compile
        time is op-count-bound, not FLOP-bound."""
        return HRNetCfg(
            width=width,
            downsample=downsample,
            use_conv=use_conv,
            pack_low_channel=pack_low_channel,
            region_precision=tuple(region_precision),
            cast_after=tuple(cast_after),
            act_store=tuple(act_store),
            stem_s2d=stem_s2d,
            resize_precision=resize_precision,
            stage2=StageCfg(modules[0], 2, (blocks,) * 2,
                            (width, width * 2), "BASIC"),
            stage3=StageCfg(modules[1], 3, (blocks,) * 3,
                            (width, width * 2, width * 4), "BASIC"),
            stage4=StageCfg(modules[2], 4, (blocks,) * 4,
                            (width, width * 2, width * 4, width * 8), "BASIC"),
        )


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

class StemConvS2D(nn.Module):
    """3x3 stride-2 stem conv evaluated on the space-to-depth packed grid.

    The deployed stem conv sees (N,224,224,3): 3 channels in the minor
    (lane) dimension is the worst-case TPU layout (3/128 lanes). This
    module computes the SAME dot products as `nn.Conv(F,(3,3),(2,2))` by
    packing 2x2 pixel blocks into channels — (N,112,112,12) — and running
    a 2x2 stride-1 conv with the kernel rearranged (and zero-padded from
    27 to 48 taps): original tap row 2*oy+ky-1 lands in packed row
    oy+py-1, sub-row dy, with ky = 2*py+dy-1 (VERDICT r2 next-step #8 —
    distinct from the measured-negative mid-trunk packing).

    Param name and shape ('kernel', (3,3,Cin,F)) match nn.Conv exactly, so
    torch-weight import and the standard path share variables unchanged.
    """

    features: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from gaitlab.nn.layers import space_to_depth

        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features))
        xp = space_to_depth(x)  # channel index = (dy*2+dx)*cin + c
        parts = []
        for py in (0, 1):
            row = []
            for px in (0, 1):
                # packed-tap kernel slice (4*cin, F) in s2d channel order
                subs = []
                for dy in (0, 1):
                    for dx in (0, 1):
                        ky, kx = 2 * py + dy - 1, 2 * px + dx - 1
                        subs.append(kernel[ky, kx]
                                    if 0 <= ky <= 2 and 0 <= kx <= 2
                                    else jnp.zeros_like(kernel[0, 0]))
                row.append(jnp.concatenate(subs, axis=0))
            parts.append(jnp.stack(row, axis=0))
        wp = jnp.stack(parts, axis=0)  # (2, 2, 4*cin, F)
        return jax.lax.conv_general_dilated(
            xp, wp, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        residual = x
        out = conv(self.planes, 3, self.stride, name="conv1")(x)
        out = batch_norm(train, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, name="conv2")(out)
        out = batch_norm(train, name="bn2")(out)
        if self.has_downsample:
            residual = conv(self.planes, 1, self.stride, padding=0,
                            name="downsample_0")(x)
            residual = batch_norm(train, name="downsample_1")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        residual = x
        out = conv(self.planes, 1, 1, padding=0, name="conv1")(x)
        out = batch_norm(train, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, self.stride, name="conv2")(out)
        out = batch_norm(train, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, 1, 1, padding=0, name="conv3")(out)
        out = batch_norm(train, name="bn3")(out)
        if self.has_downsample:
            residual = conv(self.planes * self.expansion, 1, self.stride,
                            padding=0, name="downsample_0")(x)
            residual = batch_norm(train, name="downsample_1")(residual)
        return nn.relu(out + residual)


class HighResolutionModule(nn.Module):
    """Parallel branches + full cross-resolution fusion (hrnet.py:103-267)."""

    num_branches: int
    num_blocks: tuple
    num_inchannels: tuple  # per-branch channels (BASIC: == num_channels)
    num_channels: tuple
    multi_scale_output: bool = True
    pack_low_channel: int = 0  # see HRNetCfg.pack_low_channel

    @nn.compact
    def __call__(self, xs: list, train: bool = False) -> list:
        from gaitlab.nn.layers import (
            PackedBasicBlock,
            depth_to_space,
            space_to_depth,
        )

        # branches
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            packable = (
                not train
                and self.num_channels[i] <= self.pack_low_channel
                and self.num_inchannels[i] == self.num_channels[i]
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            )
            if packable:
                # whole branch chain on the packed grid: one s2d/d2s pair
                # per module, not per block
                x = space_to_depth(x)
                for b in range(self.num_blocks[i]):
                    x = PackedBasicBlock(self.num_channels[i],
                                         name=f"branches_{i}_{b}")(x)
                x = depth_to_space(x)
                outs.append(x)
                continue
            for b in range(self.num_blocks[i]):
                has_ds = b == 0 and self.num_inchannels[i] != self.num_channels[i]
                x = BasicBlock(
                    self.num_channels[i], 1, has_downsample=has_ds,
                    name=f"branches_{i}_{b}",
                )(x, train)
            outs.append(x)

        if self.num_branches == 1:
            return outs

        # fuse layers
        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(self.num_branches):
                if j == i:
                    z = outs[j]
                elif j > i:
                    z = conv(self.num_channels[i], 1, 1, padding=0,
                             name=f"fuse_layers_{i}_{j}_0")(outs[j])
                    z = batch_norm(train, name=f"fuse_layers_{i}_{j}_1")(z)
                    z = upsample_nearest(z, 2 ** (j - i))
                else:
                    z = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last else self.num_channels[j]
                        z = conv(ch, 3, 2, name=f"fuse_layers_{i}_{j}_{k}_0")(z)
                        z = batch_norm(train, name=f"fuse_layers_{i}_{j}_{k}_1")(z)
                        if not last:
                            z = nn.relu(z)
                y = z if y is None else y + z
            fused.append(nn.relu(y))
        return fused


class PoseHighResolutionNet(nn.Module):
    """Full backbone (hrnet.py:276-536). Input NHWC (N,224,224,3);
    deployed output (N,56,56,480).

    stop_after truncates the forward at a stage boundary ("stem",
    "layer1", "stage2", "stage3", "stage4") — a static profiling knob for
    per-stage timing (scripts/stage_timing.py); parameter names of the
    surviving prefix are unchanged."""

    cfg: HRNetCfg
    stop_after: str = ""

    def _prec(self, region: str):
        """Trace-time matmul-precision context for a named region (see
        HRNetCfg.region_precision); innermost context wins over the
        caller's global default_matmul_precision. The special values
        "w2x"/"a2x" are not XLA precisions — they switch every conv()
        built inside the region to the explicit 2-pass decomposition
        (layers.conv_w2x / conv_a2x) via the trace-time conv_mode
        context; parameter paths are unchanged."""
        for r, p in self.cfg.region_precision:
            if r == region:
                if p in ("w2x", "a2x"):
                    from gaitlab.nn.layers import conv_mode

                    return conv_mode(p)
                return jax.default_matmul_precision(p)
        return contextlib.nullcontext()

    def _cast_after(self, region: str, x):
        """Cast activations at a region boundary (HRNetCfg.cast_after)."""
        for r, dt in self.cfg.cast_after:
            if r == region:
                if isinstance(x, list):
                    return [a.astype(dt) for a in x]
                return x.astype(dt)
        return x

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.cfg
        # stem: two stride-2 3x3 convs (hrnet.py:286-293)
        with self._prec("stem"):
            if (cfg.stem_s2d and not train
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                x = StemConvS2D(64, name="conv1")(x)
            else:
                x = conv(64, 3, 2, name="conv1")(x)
            x = batch_norm(train, name="bn1")(x)
            x = nn.relu(x)
            x = conv(64, 3, 2, name="conv2")(x)
            x = batch_norm(train, name="bn2")(x)
            x = nn.relu(x)
        if self.stop_after == "stem":
            return x
        x = self._cast_after("stem", x)

        # layer1: 4 Bottlenecks 64->256
        in_ch = 64
        l1_store = dict(self.cfg.act_store).get("layer1")
        with self._prec("layer1"):
            for b in range(4):
                if l1_store is not None:
                    # store the residual stream narrow at every block
                    # boundary (incl. the stem->layer1 entry); convs under
                    # the region's w2x mode consume the bf16 natively
                    from gaitlab.nn.layers import bf16_store

                    x = bf16_store(x)
                x = Bottleneck(64, 1, has_downsample=(b == 0),
                               name=f"layer1_{b}")(x, train)
        if l1_store is not None:
            from gaitlab.nn.layers import bf16_store

            x = bf16_store(x)
        if self.stop_after == "layer1":
            return x
        x = self._cast_after("layer1", x)
        # transitions + stages
        def transition(prev: list, prev_ch: tuple, cur_ch: tuple, name: str) -> list:
            outs = []
            n_pre = len(prev_ch)
            for i in range(len(cur_ch)):
                if i < n_pre:
                    if cur_ch[i] != prev_ch[i]:
                        z = conv(cur_ch[i], 3, 1, name=f"{name}_{i}_0")(prev[i])
                        z = batch_norm(train, name=f"{name}_{i}_1")(z)
                        outs.append(nn.relu(z))
                    else:
                        outs.append(prev[i])
                else:
                    z = prev[-1]
                    # hrnet.py:370-385: chain of stride-2 convs for new branches
                    for j in range(i + 1 - n_pre):
                        ch = cur_ch[i] if j == i - n_pre else prev_ch[-1]
                        z = conv(ch, 3, 2, name=f"{name}_{i}_{j}_0")(z)
                        z = batch_norm(train, name=f"{name}_{i}_{j}_1")(z)
                        z = nn.relu(z)
                    outs.append(z)
            return outs

        def stage(xs: list, scfg: StageCfg, name: str) -> list:
            chans = tuple(scfg.num_channels)
            for m in range(scfg.num_modules):
                xs = HighResolutionModule(
                    num_branches=scfg.num_branches,
                    num_blocks=tuple(scfg.num_blocks),
                    num_inchannels=tuple(a.shape[-1] for a in xs),
                    num_channels=chans,
                    pack_low_channel=cfg.pack_low_channel,
                    name=f"{name}_{m}",
                )(xs, train)
            return xs

        with self._prec("stage2"):
            xs = transition([x], (256,), tuple(cfg.stage2.num_channels),
                            "transition1")
            xs = stage(xs, cfg.stage2, "stage2")
        if self.stop_after == "stage2":
            return xs[0]
        xs = self._cast_after("stage2", xs)
        with self._prec("stage3"):
            xs = transition(xs, tuple(cfg.stage2.num_channels),
                            tuple(cfg.stage3.num_channels), "transition2")
            xs = stage(xs, cfg.stage3, "stage3")
        if self.stop_after == "stage3":
            return xs[0]
        xs = self._cast_after("stage3", xs)
        with self._prec("stage4"):
            xs = transition(xs, tuple(cfg.stage3.num_channels),
                            tuple(cfg.stage4.num_channels), "transition3")
            xs = stage(xs, cfg.stage4, "stage4")
        if self.stop_after == "stage4":
            return xs[0]
        xs = self._cast_after("stage4", xs)

        # heads (deployed: downsample=False, use_conv=True -> upsample_stage_k,
        # hrnet.py:341-344, 519-524)
        resize_prec = dict(default=jax.lax.Precision.DEFAULT,
                           high=jax.lax.Precision.HIGH,
                           highest=jax.lax.Precision.HIGHEST,
                           )[cfg.resize_precision]
        if not cfg.downsample and cfg.use_conv:
            h, w = xs[0].shape[1], xs[0].shape[2]

            def up_head(z: Array, reps: int, name: str) -> Array:
                ch = z.shape[-1]
                # torch Sequential per rep: [Upsample, Conv, BN, ReLU]
                for r in range(reps):
                    z = upsample_bilinear_align_corners(
                        z, z.shape[1] * 2, z.shape[2] * 2,
                        precision=resize_prec,
                    )
                    z = conv(ch, 3, 1, name=f"{name}_{4 * r + 1}")(z)
                    z = batch_norm(train, name=f"{name}_{4 * r + 2}")(z)
                    z = nn.relu(z)
                return z

            with self._prec("heads"):
                x1 = up_head(xs[1], 1, "upsample_stage_2")
                x2 = up_head(xs[2], 2, "upsample_stage_3")
                x3 = up_head(xs[3], 3, "upsample_stage_4")
                return jnp.concatenate([xs[0], x1, x2, x3], axis=-1)
        elif cfg.downsample and cfg.use_conv:
            def down_head(z: Array, reps: int, name: str) -> Array:
                ch = z.shape[-1]
                for r in range(reps):
                    z = conv(ch, 3, 2, name=f"{name}_{3 * r}")(z)
                    z = batch_norm(train, name=f"{name}_{3 * r + 1}")(z)
                    z = nn.relu(z)
                return z

            x0 = down_head(xs[0], 3, "downsample_stage_1")
            x1 = down_head(xs[1], 2, "downsample_stage_2")
            x2 = down_head(xs[2], 1, "downsample_stage_3")
            return jnp.concatenate([x0, x1, x2, xs[3]], axis=-1)
        else:
            # interpolation-only heads (hrnet.py:512-517, 526-531)
            if cfg.downsample:
                h, w = xs[3].shape[1], xs[3].shape[2]
                ys = [upsample_bilinear_align_corners(z, h, w,
                                          precision=resize_prec)
                  for z in xs[:3]]
                return jnp.concatenate(ys + [xs[3]], axis=-1)
            h, w = xs[0].shape[1], xs[0].shape[2]
            ys = [upsample_bilinear_align_corners(z, h, w,
                                              precision=resize_prec)
              for z in xs[1:]]
            return jnp.concatenate([xs[0]] + ys, axis=-1)


def hrnet_w32(downsample: bool = False, use_conv: bool = True) -> PoseHighResolutionNet:
    """Deployed hrnet_w32 factory (hrnet.py:626-633): 480-channel output."""
    return PoseHighResolutionNet(HRNetCfg.w(32, downsample, use_conv))


def hrnet_w48(downsample: bool = False, use_conv: bool = True) -> PoseHighResolutionNet:
    return PoseHighResolutionNet(HRNetCfg.w(48, downsample, use_conv))
