"""Shared NN building blocks (Flax linen, NHWC, inference-ready BatchNorm).

Naming convention: submodule names mirror the reference torch module paths
('conv1', 'bn1', sequential indices '0','1',...) so that checkpoint import
(gaitlab/weights/torch_import.py) is a mechanical path translation.
"""

from __future__ import annotations

import contextvars

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

BN_EPS = 1e-5  # torch BatchNorm2d default


def conv(features: int, kernel: int, stride: int = 1, padding: int | None = None,
         use_bias: bool = False, name: str | None = None) -> nn.Module:
    """Conv factory. Under an active `conv_mode("w2x"/"a2x")` context
    (trace-time, set per region by the HRNet backbone) it returns a
    ConvW2X/ConvA2X drop-in with the identical 'kernel' parameter —
    checkpoint import is untouched."""
    if padding is None:
        padding = (kernel - 1) // 2
    mode = _CONV_MODE.get()
    if mode in ("w2x", "a2x") and not use_bias:
        return _Conv2Pass(features=features, kernel=kernel, stride=stride,
                          padding=padding, mode=mode, name=name)
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        name=name,
    )


_CONV_MODE: contextvars.ContextVar = contextvars.ContextVar(
    "gaitlab_conv_mode", default=None)


def conv_mode(mode: str | None):
    """Trace-time context switching conv() to a 2-pass decomposition
    ("w2x"/"a2x", see conv_w2x/conv_a2x) for the enclosed module calls.
    Everything under jit is traced once, so this is a compile-time
    structural choice, not runtime control flow."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        tok = _CONV_MODE.set(mode)
        try:
            yield
        finally:
            _CONV_MODE.reset(tok)

    return _ctx()


class _Conv2Pass(nn.Module):
    """nn.Conv(use_bias=False) drop-in evaluating via conv_w2x/conv_a2x.

    Declares the identical 'kernel' parameter (name, shape, init), so the
    variable tree — and therefore torch weight import — is unchanged."""

    features: int
    kernel: int
    stride: int
    padding: int
    mode: str

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.kernel, self.kernel, x.shape[-1], self.features))
        fn = conv_w2x if self.mode == "w2x" else conv_a2x
        return fn(x, k, stride=self.stride, padding=self.padding)


def batch_norm(train: bool, name: str | None = None) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        epsilon=BN_EPS,
        momentum=0.9,  # torch momentum 0.1 == flax momentum 0.9
        name=name,
    )


def upsample_nearest(x: Array, scale: int) -> Array:
    """NHWC nearest-neighbour x scale (torch nn.Upsample mode='nearest')."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def _align_corners_matrix(n_in: int, n_out: int, dtype) -> Array:
    """(n_out, n_in) bilinear interpolation matrix with align_corners=True.

    Expressing the resize as two small matmuls keeps it on the MXU and gives
    bit-faithful torch `align_corners=True` semantics, which
    jax.image.resize (half-pixel centers) does not. (A static gather+lerp
    variant was measured 45% SLOWER end to end on the chip — TPU gathers
    along non-minor axes lose badly to the MXU — so the matmul form stays.)
    """
    if n_out == 1:
        w = jnp.zeros((1, n_in), dtype).at[0, 0].set(1.0)
        return w
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    frac = pos - lo.astype(jnp.float32)
    w = jnp.zeros((n_out, n_in), jnp.float32)
    w = w.at[jnp.arange(n_out), lo].add(1.0 - frac)
    w = w.at[jnp.arange(n_out), hi].add(frac)
    return w.astype(dtype)


def upsample_bilinear_align_corners(x: Array, out_h: int, out_w: int,
                                    precision=jax.lax.Precision.HIGHEST
                                    ) -> Array:
    """NHWC bilinear resize matching torch align_corners=True.

    `precision` applies to the two resize matmuls: HIGHEST (default) is
    bit-faithful; the MFU trace shows these ops HBM-bound (~600 GB/s at
    18% MXU, docs/MFU_TRACE.json), so cheaper precisions are a measured
    knob (docs/PRECISION.json `+resize_high` probe), not a FLOP saving."""
    n, h, w, c = x.shape
    Wh = _align_corners_matrix(h, out_h, x.dtype)
    Ww = _align_corners_matrix(w, out_w, x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", Wh, x, precision=precision)
    x = jnp.einsum("ow,nhwc->nhoc", Ww, x, precision=precision)
    return x


class LocallyConnected(nn.Module):
    """Per-token unshared 1x1 'conv' (reference LocallyConnected2d,
    lib/models/layers/locallyconnected2d.py:22-49).

    Operates on (B, J, C_in) token-major features; weight (J, C_in, C_out).
    The torch layout is (1, out, in, J, 1, 1) — the importer transposes.
    """

    num_tokens: int
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        j, c = x.shape[-2], x.shape[-1]
        assert j == self.num_tokens, (j, self.num_tokens)
        w = self.param(
            "weight",
            nn.initializers.normal(1.0),
            (self.num_tokens, c, self.features),
        )
        out = jnp.einsum("...jc,jco->...jo", x, w,
                         precision=jax.lax.Precision.HIGHEST)
        if self.use_bias:
            b = self.param("bias", nn.initializers.normal(1.0),
                           (self.num_tokens, self.features))
            out = out + b
        return out


def keypoint_attention(features: Array, heatmaps: Array, act: str = "softmax",
                       use_scale: bool = False) -> Array:
    """Attention pooling (reference keypoint_attention.py:34-56).

    features: (B, H, W, C); heatmaps: (B, H, W, J) raw part logits.
    Returns (B, J, C) pooled per-part features.
    """
    b, h, w, c = features.shape
    j = heatmaps.shape[-1]
    hm = heatmaps.reshape(b, h * w, j)
    if use_scale:
        hm = hm / jnp.sqrt(jnp.asarray(h * w, hm.dtype))
    if act == "softmax":
        attn = jax.nn.softmax(hm, axis=1)
    elif act == "sigmoid":
        attn = jax.nn.sigmoid(hm)
    else:
        raise ValueError(act)
    feat = features.reshape(b, h * w, c)
    return jnp.einsum("bpj,bpc->bjc", attn, feat,
                      precision=jax.lax.Precision.HIGHEST)


def conv_w2x(x: Array, kernel: Array, stride: int = 1,
             padding: int | None = None) -> Array:
    """Two-pass kernel-decomposition convolution ("w2x").

    The TPU MXU offers 1-pass (DEFAULT: both operands rounded to bf16),
    3-pass (HIGH / bf16_3x) and 6-pass (HIGHEST) f32 matmuls — nothing in
    between. This builds the missing 2-pass point: split the kernel into
    k_hi = bf16(k) and k_lo = bf16(k - k_hi) (both exactly representable
    in bf16) and run two DEFAULT-precision passes,

        y = conv(x, k_hi) + conv(x, k_lo) = bf16(x) . k  (f32 accumulate),

    so the kernel is carried to ~16 mantissa bits and only the
    *activation* is rounded once per output — ~sqrt(2) less error than
    DEFAULT (which rounds both operands: two independent error terms), at
    2/3 of HIGH's MACs. Motivated by the MFU trace (docs/MFU_TRACE.json):
    the HR upsample-head convs are compute-bound at 92% MXU under HIGH,
    so pass count is their only lever (docs/PRECISION.json heads_w2x).

    The split uses mantissa-bit masking, NOT a bf16 round-trip cast:
    XLA's algebraic simplifier deletes f32->bf16->f32 convert pairs, which
    silently turns the cast-based split into k_hi = k, k_lo = 0 — i.e.
    plain DEFAULT (measured: identical outputs, bit for bit).

    bfloat16 inputs take a storage-preserving path: x stays bf16 end to
    end (the whole point of bf16 activation STORAGE is halving HBM
    traffic; upcasting back to f32 would re-insert the deletable convert
    pair and a 4-byte buffer) and the kernel halves are fed as true bf16
    arrays with f32 accumulation via preferred_element_type. The math is
    identical to the f32 path — DEFAULT-precision MXU passes round the
    activation to bf16 anyway — so this is the same 2-pass product with
    half the activation bytes. Note "high" (bf16_3x) on a bf16-stored
    activation DEGENERATES to exactly this: x_lo = 0 kills the third
    pass, so w2x-with-bf16-storage is the faithful realization of
    "bf16 activation storage under high matmuls"."""
    if padding is None:
        padding = (kernel.shape[0] - 1) // 2
    dn = ("NHWC", "HWIO", "NHWC")
    args = dict(window_strides=(stride, stride),
                padding=((padding, padding), (padding, padding)),
                dimension_numbers=dn)
    k = kernel.astype(jnp.float32)
    k_hi = _bf16_hi(k)
    k_lo = _bf16_hi(k - k_hi)
    if x.dtype == jnp.bfloat16:
        # masked halves are exactly bf16-representable: the converts are
        # value-preserving (no rounding beyond the split itself)
        return (jax.lax.conv_general_dilated(
                    x, k_hi.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32, **args)
                + jax.lax.conv_general_dilated(
                    x, k_lo.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32, **args))
    x = x.astype(jnp.float32)
    args["precision"] = jax.lax.Precision.DEFAULT
    return (jax.lax.conv_general_dilated(x, k_hi, **args)
            + jax.lax.conv_general_dilated(x, k_lo, **args))


def _bf16_hi(a: Array) -> Array:
    """The bf16-representable high part of f32 values, by masking the low
    16 mantissa bits (truncation toward zero). Equivalent in role to
    a.astype(bf16).astype(f32) but immune to XLA's convert-pair
    simplification, which deletes that round trip outright."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)


def bf16_store(x: Array) -> Array:
    """Round f32 activations to a GENUINE bfloat16 array for storage.

    A plain astype(bf16) is unsafe as a storage cast: every f32 consumer
    re-upcasts, and XLA's simplifier deletes the f32->bf16->f32 pair,
    silently restoring the 4-byte buffer (same failure mode _bf16_hi
    guards against). Masking the mantissa FIRST makes the value exactly
    bf16-representable, so the residual convert pair around any f32
    consumer is value-preserving — the simplifier may collapse it without
    changing numerics, and the bf16 buffer itself survives for the
    consumers that take bf16 natively (conv_w2x's bf16 path). The mask
    applies round-to-nearest-even in integer space (the same rounding a
    hardware f32->bf16 convert uses), so the stored value matches what
    astype(bf16) would have produced."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    bits = bits + jnp.uint32(0x7FFF) + ((bits >> 16) & jnp.uint32(1))
    rounded = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    return rounded.astype(jnp.bfloat16)


def conv_a2x(x: Array, kernel: Array, stride: int = 1,
             padding: int | None = None) -> Array:
    """conv_w2x's mirror: 2-pass ACTIVATION decomposition.

    x_hi/x_lo = masked bf16-representable parts of x (see _bf16_hi) and
    two DEFAULT passes give y = x . bf16(k) — the activation is carried to
    ~16 mantissa bits and only the *kernel* is rounded once. Same 2/3-of-
    HIGH cost as w2x; which of the two compounds less MPJPE through the
    stack is an empirical question (docs/PRECISION.json heads_w2x vs
    heads_a2x rows)."""
    if padding is None:
        padding = (kernel.shape[0] - 1) // 2
    x = x.astype(jnp.float32)
    x_hi = _bf16_hi(x)
    x_lo = _bf16_hi(x - x_hi)
    k = kernel.astype(jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    args = dict(window_strides=(stride, stride),
                padding=((padding, padding), (padding, padding)),
                dimension_numbers=dn,
                precision=jax.lax.Precision.DEFAULT)
    return (jax.lax.conv_general_dilated(x_hi, k, **args)
            + jax.lax.conv_general_dilated(x_lo, k, **args))


# ---------------------------------------------------------------------------
# Space-to-depth channel packing for low-channel convolutions
# ---------------------------------------------------------------------------
# The TPU MXU is a 128x128 systolic array: a conv with 32 output channels
# nominally uses 32 of 128 result lanes. HRNet's highest-resolution branch
# is exactly that shape (56x56x32, reference hrnet.py:595-607). Packing
# 2x2 spatial phases into the channel dim turns conv3x3@56²x32 into
# conv3x3@28²x128 — the SAME dot products (the packed kernel is
# zero-structured, so every nonzero multiply-add is one of the original
# ones and numerics are preserved up to f32 accumulation order) at 4x lane
# utilization for 2x the nominal MACs. MEASURED RESULT (scripts/
# pack_bench.py, TPU v5e, batch 128): SLOWER at both "default" (55->64 ms)
# and "high" (103->122 ms) — XLA's conv lowering already handles the
# low-channel case better than the naive lane model predicts. Kept as a
# tested, documented experiment (tests/test_packed_conv.py).

def space_to_depth(x: Array, f: int = 2) -> Array:
    """NHWC (N,H,W,C) -> (N,H/f,W/f,f²C); channel index = (qy*f+qx)*C + c."""
    n, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    x = x.reshape(n, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // f, w // f, f * f * c)


def depth_to_space(x: Array, f: int = 2) -> Array:
    """Inverse of space_to_depth (same phase-major channel convention)."""
    n, h, w, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(n, h, w, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * f, w * f, c)


def packed_conv3x3_kernel(w: Array) -> Array:
    """(3,3,C,K) stride-1 pad-1 conv kernel -> its space-to-depth
    equivalent (3,3,4C,4K) on the f=2 packed grid (pad-1 there too).

    Derivation: output pixel (2i+py, 2j+px) reads input (2i+py+dy, …) for
    dy ∈ {-1,0,1}; on the packed grid that is row i+di with phase qy where
    dy = 2·di + qy - py, so tap (di,dj,q→p) carries w[dy,dx] iff
    |2·di+qy-py| <= 1 (and likewise for x). Zero-padding the packed grid by
    one reproduces the original one-pixel zero pad exactly (taps that would
    reach two original pixels out of bounds have zero weight).
    """
    c, k = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * c, 4 * k), w.dtype)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    for qy in (0, 1):
                        for qx in (0, 1):
                            dy = 2 * di + qy - py
                            dx = 2 * dj + qx - px
                            if abs(dy) > 1 or abs(dx) > 1:
                                continue
                            qi = (qy * 2 + qx) * c
                            pi = (py * 2 + px) * k
                            out = out.at[
                                di + 1, dj + 1, qi : qi + c, pi : pi + k
                            ].set(w[dy + 1, dx + 1])
    return out


class _ConvKernel(nn.Module):
    """Param-only stand-in for `conv(features, 3)`: declares the identical
    'kernel' parameter (name, shape, init) and returns it raw, so a caller
    can apply it in packed form. Variable paths match nn.Conv exactly."""

    features: int
    in_features: int
    kernel: int = 3

    @nn.compact
    def __call__(self) -> Array:
        return self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.kernel, self.kernel, self.in_features, self.features))


class _BNParams(nn.Module):
    """Param-only stand-in for `batch_norm(train=False)`: identical
    'scale'/'bias' params and 'mean'/'var' batch_stats as nn.BatchNorm."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class PackedBasicBlock(nn.Module):
    """BasicBlock evaluated on the space-to-depth packed grid.

    Declares the SAME variables (paths, shapes, inits) as the standard
    BasicBlock — torch weight import is untouched — and packs kernels/BN
    params in-graph (a sub-MB scatter per call, negligible next to the
    conv). Inference only (running-stats BN); stride 1, no downsample
    branch (the eligible HRNet branches have neither).
    """

    planes: int
    f: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ff = self.f * self.f
        assert x.shape[-1] == ff * self.planes, (x.shape, self.planes)
        p = self.planes

        def packed_conv(z, w):
            return jax.lax.conv_general_dilated(
                z, packed_conv3x3_kernel(w.astype(z.dtype)),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def packed_bn(z, bn):
            scale, bias, mean, var = bn
            inv = (jax.lax.rsqrt(var + BN_EPS) * scale).astype(z.dtype)
            return (z - jnp.tile(mean.astype(z.dtype), ff)) \
                * jnp.tile(inv, ff) + jnp.tile(bias.astype(z.dtype), ff)

        w1 = _ConvKernel(p, p, name="conv1")()
        bn1 = _BNParams(p, name="bn1")()
        w2 = _ConvKernel(p, p, name="conv2")()
        bn2 = _BNParams(p, name="bn2")()
        out = packed_conv(x, w1)
        out = packed_bn(out, bn1)
        out = nn.relu(out)
        out = packed_conv(out, w2)
        out = packed_bn(out, bn2)
        return nn.relu(out + x)
