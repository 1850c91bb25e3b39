"""YOLOv3 person detectors (tiny + full) in Flax + darknet `.weights` importer.

The reference's tracking front-end is the external `multi_person_tracker`
package's full YOLOv3 (CUDA torch; installed + weights downloaded at setup
— /root/reference/demo.py:13,89-97, requirements.txt:27-28). Zero-egress
TPU rebuild: the detector is an in-repo Flax module (NHWC, XLA-friendly
static shapes) and the weight importer reads the *standard public* darknet
binary layout, so a stock `yolov3.weights` or `yolov3-tiny.weights` file
drops in unchanged.

The network is TABLE-driven: `tiny_layers()` / `v3_layers()` emit a layer
list mirroring the public cfg block order (conv / maxpool / shortcut
(residual add) / route (concat) / upsample / yolo), and one generic
`YoloNet` module executes any such table. Convs are named `conv{i}` by
their darknet layer index, so the weight importer is a single linear walk
of the table in file order — exactly darknet's own load loop.

Decode follows the darknet yolo-layer convention: box center =
(sigmoid(t_xy) + grid) * stride, box size = anchor * exp(t_wh),
objectness/class scores sigmoid'd, confidence = obj * cls.
"""

from __future__ import annotations

import io
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NUM_CLASSES = 80
PERSON_CLASS = 0

# yolov3-tiny.cfg anchors
ANCHORS_COARSE = ((81, 82), (135, 169), (344, 319))   # stride-32 head
ANCHORS_FINE = ((10, 14), (23, 27), (37, 58))         # stride-16 head
# yolov3.cfg anchors (masks 6-8 / 3-5 / 0-2)
V3_ANCHORS_32 = ((116, 90), (156, 198), (373, 326))
V3_ANCHORS_16 = ((30, 61), (62, 45), (59, 119))
V3_ANCHORS_8 = ((10, 13), (16, 30), (33, 23))


# ---------------------------------------------------------------------------
# layer tables (mirror the public cfg block order; one entry per darknet
# layer index, so route/shortcut offsets read exactly like the cfg)
# ---------------------------------------------------------------------------
#   ("conv", filters, size, stride)     convolutional + BN + leaky(0.1)
#   ("convlin", filters, size, stride)  linear conv with bias (det heads)
#   ("maxpool", size, stride)
#   ("shortcut", offset)                x = x + out[i + offset]
#   ("route", (ref, ...))               concat referenced outputs (<0 =
#                                       relative to this layer, else abs)
#   ("upsample",)                       2x nearest
#   ("yolo", anchors)                   emit raw prediction map


def tiny_layers(num_classes: int = NUM_CLASSES) -> tuple:
    """yolov3-tiny.cfg: 13 convs, 6 maxpools, 2 scales."""
    c = 3 * (5 + num_classes)
    return (
        ("conv", 16, 3, 1), ("maxpool", 2, 2),
        ("conv", 32, 3, 1), ("maxpool", 2, 2),
        ("conv", 64, 3, 1), ("maxpool", 2, 2),
        ("conv", 128, 3, 1), ("maxpool", 2, 2),
        ("conv", 256, 3, 1), ("maxpool", 2, 2),          # idx 8: route src
        ("conv", 512, 3, 1), ("maxpool", 2, 1),          # size2/stride1
        ("conv", 1024, 3, 1),
        ("conv", 256, 1, 1),                              # idx 13
        ("conv", 512, 3, 1),
        ("convlin", c, 1, 1),
        ("yolo", ANCHORS_COARSE),                         # idx 16
        ("route", (-4,)),                                 # -> 13
        ("conv", 128, 1, 1),
        ("upsample",),
        ("route", (-1, 8)),
        ("conv", 256, 3, 1),
        ("convlin", c, 1, 1),
        ("yolo", ANCHORS_FINE),
    )


def v3_layers(num_classes: int = NUM_CLASSES) -> tuple:
    """yolov3.cfg: Darknet-53 backbone (23 residual blocks) + 3 scales."""
    c = 3 * (5 + num_classes)
    t = [("conv", 32, 3, 1)]

    def res_stage(filters: int, blocks: int):
        t.append(("conv", filters, 3, 2))  # downsample
        for _ in range(blocks):
            t.append(("conv", filters // 2, 1, 1))
            t.append(("conv", filters, 3, 1))
            t.append(("shortcut", -3))

    res_stage(64, 1)
    res_stage(128, 2)
    res_stage(256, 8)       # ends at idx 36: stride-8 route source
    res_stage(512, 8)       # ends at idx 61: stride-16 route source
    res_stage(1024, 4)      # ends at idx 74
    t += [
        ("conv", 512, 1, 1), ("conv", 1024, 3, 1),
        ("conv", 512, 1, 1), ("conv", 1024, 3, 1),
        ("conv", 512, 1, 1),                              # idx 79
        ("conv", 1024, 3, 1),
        ("convlin", c, 1, 1),
        ("yolo", V3_ANCHORS_32),                          # idx 82
        ("route", (-4,)),                                 # -> 79
        ("conv", 256, 1, 1),
        ("upsample",),
        ("route", (-1, 61)),
        ("conv", 256, 1, 1), ("conv", 512, 3, 1),
        ("conv", 256, 1, 1), ("conv", 512, 3, 1),
        ("conv", 256, 1, 1),                              # idx 91
        ("conv", 512, 3, 1),
        ("convlin", c, 1, 1),
        ("yolo", V3_ANCHORS_16),                          # idx 94
        ("route", (-4,)),                                 # -> 91
        ("conv", 128, 1, 1),
        ("upsample",),
        ("route", (-1, 36)),
        ("conv", 128, 1, 1), ("conv", 256, 3, 1),
        ("conv", 128, 1, 1), ("conv", 256, 3, 1),
        ("conv", 128, 1, 1), ("conv", 256, 3, 1),
        ("convlin", c, 1, 1),
        ("yolo", V3_ANCHORS_8),                           # idx 106
    ]
    assert len(t) == 107
    return tuple(t)


class ConvBN(nn.Module):
    """conv + batchnorm + leaky(0.1) — the darknet `convolutional` block
    with batch_normalize=1."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.stride > 1:
            # darknet pads (k-1)//2 on each side; with stride 2 that is
            # asymmetric top/left-heavy relative to SAME — match exactly
            p = (self.kernel - 1) // 2
            pad = [(p, p), (p, p)]
        else:
            pad = "SAME"
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class YoloNet(nn.Module):
    """Generic darknet-graph executor over a layer table.

    apply() returns the raw prediction maps, one per ("yolo", ...) entry,
    in table order (coarse -> fine)."""

    layers: tuple
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x: Array) -> tuple:
        outs: list = []       # per-layer outputs for route/shortcut refs
        maps: list = []
        for i, entry in enumerate(self.layers):
            kind = entry[0]
            if kind == "conv":
                _, f, k, s = entry
                x = ConvBN(f, kernel=k, stride=s, name=f"conv{i}")(x)
            elif kind == "convlin":
                _, f, k, s = entry
                x = nn.Conv(f, (k, k), strides=(s, s), padding="SAME",
                            use_bias=True, name=f"conv{i}")(x)
            elif kind == "maxpool":
                _, size, stride = entry
                if stride == 1:
                    # darknet maxpool size=2 stride=1: pad right/bottom
                    x = nn.max_pool(
                        jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                                mode="edge"),
                        (size, size), strides=(1, 1))
                else:
                    x = nn.max_pool(x, (size, size),
                                    strides=(stride, stride))
            elif kind == "shortcut":
                x = x + outs[i + entry[1]]
            elif kind == "route":
                refs = [outs[r if r >= 0 else i + r] for r in entry[1]]
                x = refs[0] if len(refs) == 1 else jnp.concatenate(refs, -1)
            elif kind == "upsample":
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            elif kind == "yolo":
                maps.append(x)
                # darknet: the layer after a yolo block restarts from the
                # yolo layer's input; outs[i] = x keeps refs consistent
            else:
                raise ValueError(kind)
            outs.append(x)
        return tuple(maps)


def YoloV3Tiny(num_classes: int = NUM_CLASSES) -> YoloNet:
    """yolov3-tiny factory (the reference operating point's cheap variant)."""
    return YoloNet(layers=tiny_layers(num_classes), num_classes=num_classes)


def YoloV3(num_classes: int = NUM_CLASSES) -> YoloNet:
    """Full yolov3 factory — the reference's ACTUAL detector
    (/root/reference/demo.py:89-97 via multi_person_tracker)."""
    return YoloNet(layers=v3_layers(num_classes), num_classes=num_classes)


def decode_predictions(raw: Array, anchors: Sequence[tuple], stride: int,
                       num_classes: int = NUM_CLASSES) -> Array:
    """Raw map (N,G,G,3*(5+C)) -> (N, G*G*3, 5+C) [cx,cy,w,h,obj,cls...]
    in input-pixel units (darknet yolo-layer decode)."""
    n, g, _, _ = raw.shape
    a = len(anchors)
    raw = raw.reshape(n, g, g, a, 5 + num_classes)
    grid = jnp.stack(jnp.meshgrid(jnp.arange(g), jnp.arange(g),
                                  indexing="xy"), axis=-1)  # (G,G,2) x,y
    xy = (jax.nn.sigmoid(raw[..., :2]) + grid[None, :, :, None, :]) * stride
    wh = jnp.asarray(anchors, jnp.float32) * jnp.exp(raw[..., 2:4])
    obj = jax.nn.sigmoid(raw[..., 4:5])
    cls = jax.nn.sigmoid(raw[..., 5:])
    return jnp.concatenate([xy, wh, obj, cls], -1).reshape(n, g * g * a, -1)


def detect(module: YoloNet, variables, images: Array) -> Array:
    """images (N,S,S,3) in [0,1] -> (N, K, 5+C) decoded predictions,
    all scales concatenated in table (coarse->fine) order."""
    maps = module.apply(variables, images)
    s = images.shape[1]
    anchor_sets = [e[1] for e in module.layers if e[0] == "yolo"]
    ds = [decode_predictions(m, a, s // m.shape[1], module.num_classes)
          for m, a in zip(maps, anchor_sets)]
    return jnp.concatenate(ds, axis=1)


# ---------------------------------------------------------------------------
# darknet .weights importer
# ---------------------------------------------------------------------------

def _conv_entries(layers: tuple):
    """(darknet index, name, filters, kernel, has_bn) for each conv, in
    weight-file order (= table order; darknet saves convs as it walks the
    cfg)."""
    for i, entry in enumerate(layers):
        if entry[0] == "conv":
            yield i, f"conv{i}", entry[1], entry[2], True
        elif entry[0] == "convlin":
            yield i, f"conv{i}", entry[1], entry[2], False


def expected_float_count(layers: tuple, in_channels: int = 3) -> int:
    """Number of float32 payload values a darknet file for this table
    holds — used to auto-detect the variant from the file size."""
    # track input channels through the graph to size each kernel
    chans: list = []
    cur = in_channels
    n = 0
    for i, entry in enumerate(layers):
        kind = entry[0]
        if kind in ("conv", "convlin"):
            f, k = entry[1], entry[2]
            n += f * (4 if kind == "conv" else 1)  # bn stats or bias
            n += f * cur * k * k
            cur = f
        elif kind == "route":
            cur = sum(chans[r if r >= 0 else i + r] for r in entry[1])
        elif kind == "shortcut":
            pass  # channel count unchanged
        chans.append(cur)
    return n


def infer_variant(path_or_bytes) -> str:
    """'tiny' | 'v3' from the weight-file payload size."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        size = len(path_or_bytes)
    else:
        import os

        size = os.path.getsize(path_or_bytes)
    # header: 3*int32 + `seen` (int64 on darknet >= 0.2, int32 before —
    # load_darknet_weights handles both, so variant detection must too)
    counts = {(size - hdr) // 4 for hdr in (20, 16) if (size - hdr) % 4 == 0}
    if expected_float_count(tiny_layers()) in counts:
        return "tiny"
    if expected_float_count(v3_layers()) in counts:
        return "v3"
    raise ValueError(
        f"unrecognized darknet file: {sorted(counts)} payload floats "
        f"(expected {expected_float_count(tiny_layers())} for yolov3-tiny "
        f"or {expected_float_count(v3_layers())} for yolov3)")


def load_darknet_weights(path_or_bytes, variables,
                         layers: Optional[tuple] = None) -> dict:
    """Read a standard darknet `.weights` file into the flax variables.

    Binary layout (darknet save_weights): header of 3 int32 (major, minor,
    revision) + int64 `seen` (int32 when major*10+minor < 2), then per conv
    layer in cfg order: [bn_beta, bn_gamma, bn_mean, bn_var] when
    batch_normalize else [conv_bias], followed by conv weights in
    (out, in, kh, kw) order. Flax kernels are (kh, kw, in, out).
    """
    if layers is None:
        layers = tiny_layers()
    if isinstance(path_or_bytes, (bytes, bytearray)):
        f = io.BytesIO(path_or_bytes)
    else:
        f = open(path_or_bytes, "rb")
    with f:
        major, minor, _rev = np.frombuffer(f.read(12), np.int32)
        f.read(8 if major * 10 + minor >= 2 else 4)  # `seen` counter
        buf = np.frombuffer(f.read(), np.float32)

    params = jax.tree_util.tree_map(np.asarray, variables)
    import flax

    params = flax.core.unfreeze(params)
    pos = 0

    def take(n):
        nonlocal pos
        out = buf[pos : pos + n]
        if out.size != n:
            raise ValueError(
                f"darknet file too short: wanted {n} floats at {pos}, "
                f"file has {buf.size}")
        pos += n
        return out

    for _i, name, features, k, has_bn in _conv_entries(layers):
        if has_bn:
            scope_p = params["params"][name]
            scope_s = params["batch_stats"][name]
            beta = take(features)
            gamma = take(features)
            mean = take(features)
            var = take(features)
            scope_p["bn"]["bias"] = beta
            scope_p["bn"]["scale"] = gamma
            scope_s["bn"]["mean"] = mean
            scope_s["bn"]["var"] = var
            kern_scope = scope_p["conv"]
        else:
            kern_scope = params["params"][name]
            kern_scope["bias"] = take(features)
        kh, kw, cin, cout = kern_scope["kernel"].shape
        assert cout == features and kh == k, (name, kern_scope["kernel"].shape)
        w = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
        kern_scope["kernel"] = np.transpose(w, (2, 3, 1, 0))
    if pos != buf.size:
        raise ValueError(f"{buf.size - pos} unread floats: wrong variant?")
    return flax.core.freeze(params) if hasattr(variables, "unfreeze") else params


def save_darknet_weights(path: str, variables,
                         layers: Optional[tuple] = None) -> None:
    """Write flax variables back out in the darknet layout (test fixture
    generator + interchange)."""
    if layers is None:
        layers = tiny_layers()
    parts = [np.array([0, 2, 0], np.int32).tobytes(),
             np.array([0], np.int64).tobytes()]
    params = jax.tree_util.tree_map(np.asarray, variables)
    for _i, name, features, _k, has_bn in _conv_entries(layers):
        if has_bn:
            p = params["params"][name]
            s = params["batch_stats"][name]
            parts += [np.asarray(p["bn"]["bias"], np.float32).tobytes(),
                      np.asarray(p["bn"]["scale"], np.float32).tobytes(),
                      np.asarray(s["bn"]["mean"], np.float32).tobytes(),
                      np.asarray(s["bn"]["var"], np.float32).tobytes()]
            kern = p["conv"]["kernel"]
        else:
            p = params["params"][name]
            parts.append(np.asarray(p["bias"], np.float32).tobytes())
            kern = p["kernel"]
        w = np.transpose(np.asarray(kern, np.float32), (3, 2, 0, 1))
        parts.append(np.ascontiguousarray(w).tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(parts))
