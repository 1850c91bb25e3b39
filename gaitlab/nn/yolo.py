"""YOLOv3-tiny person detector in Flax + darknet `.weights` importer.

The reference's tracking front-end is the external `multi_person_tracker`
package's YOLOv3 (CUDA torch; installed + weights downloaded at setup —
/root/reference/demo.py:13,89-97, requirements.txt:27-28). Zero-egress
TPU rebuild: the detector is an in-repo Flax module (NHWC, XLA-friendly
static shapes) and the weight importer reads the *standard public* darknet
binary layout (`yolov3-tiny.weights`), so any stock YOLOv3-tiny file drops
in. The tiny variant matches the reference's operating point (416x416
input, demo.py:412-413) at a fraction of the full YOLOv3 cost — detection
here only seeds bounding boxes for SORT; the mesh model never sees these
pixels.

Architecture (public yolov3-tiny.cfg):
  13 conv layers + 6 maxpools, two detection scales (stride 32 and 16,
  3 anchors each over an 85-channel output: 4 box + 1 obj + 80 COCO
  classes), route/upsample feature fusion for the second scale.

Decode follows the darknet convention: box center = (sigmoid(t_xy) +
grid) * stride, box size = anchor * exp(t_wh), objectness/class scores
sigmoid'd, confidence = obj * cls.
"""

from __future__ import annotations

import io
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (filters, size, stride) for the backbone trunk, public yolov3-tiny.cfg
ANCHORS_COARSE = ((81, 82), (135, 169), (344, 319))   # stride-32 head
ANCHORS_FINE = ((10, 14), (23, 27), (37, 58))         # stride-16 head
NUM_CLASSES = 80
PERSON_CLASS = 0


class ConvBN(nn.Module):
    """conv + batchnorm + leaky(0.1) — the darknet `convolutional` block
    with batch_normalize=1."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class YoloV3Tiny(nn.Module):
    """Raw two-scale prediction maps; decode separately (pure function)."""

    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        """x (N, S, S, 3) in [0,1]; S % 32 == 0.

        Returns (coarse (N,S/32,S/32,255), fine (N,S/16,S/16,255))."""
        pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))
        c = 3 * (5 + self.num_classes)

        x = ConvBN(16, name="l0")(x)
        x = pool(x)
        x = ConvBN(32, name="l1")(x)
        x = pool(x)
        x = ConvBN(64, name="l2")(x)
        x = pool(x)
        x = ConvBN(128, name="l3")(x)
        x = pool(x)
        x = ConvBN(256, name="l4")(x)
        route8 = x                      # stride-16 features for the fusion
        x = pool(x)
        x = ConvBN(512, name="l5")(x)
        # darknet maxpool size=2 stride=1: pad right/bottom, keep size
        x = nn.max_pool(jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                                mode="edge"), (2, 2), strides=(1, 1))
        x = ConvBN(1024, name="l6")(x)
        x = ConvBN(256, kernel=1, name="l7")(x)
        route13 = x
        y1 = ConvBN(512, name="l8")(x)
        y1 = nn.Conv(c, (1, 1), use_bias=True, name="head_coarse")(y1)

        x = ConvBN(128, kernel=1, name="l9")(route13)
        # nearest-neighbour 2x upsample (darknet `upsample`)
        n, h, w, ch = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = jnp.concatenate([x, route8], axis=-1)
        y2 = ConvBN(256, name="l10")(x)
        y2 = nn.Conv(c, (1, 1), use_bias=True, name="head_fine")(y2)
        return y1, y2


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


def detect(module: YoloV3Tiny, variables, images: Array) -> Array:
    """images (N,S,S,3) in [0,1] -> (N, K, 5+C) decoded predictions."""
    y1, y2 = module.apply(variables, images)
    s = images.shape[1]
    d1 = decode_predictions(y1, ANCHORS_COARSE, s // y1.shape[1],
                            module.num_classes)
    d2 = decode_predictions(y2, ANCHORS_FINE, s // y2.shape[1],
                            module.num_classes)
    return jnp.concatenate([d1, d2], axis=1)


# ---------------------------------------------------------------------------
# darknet .weights importer
# ---------------------------------------------------------------------------

# conv layers in darknet file order: (flax name, features, kernel, has_bn)
_DARKNET_ORDER = [
    ("l0", 16, 3, True), ("l1", 32, 3, True), ("l2", 64, 3, True),
    ("l3", 128, 3, True), ("l4", 256, 3, True), ("l5", 512, 3, True),
    ("l6", 1024, 3, True), ("l7", 256, 1, True), ("l8", 512, 3, True),
    ("head_coarse", 255, 1, False),
    ("l9", 128, 1, True), ("l10", 256, 3, True),
    ("head_fine", 255, 1, False),
]


def load_darknet_weights(path_or_bytes, variables) -> dict:
    """Read a standard `yolov3-tiny.weights` file into the flax variables.

    Binary layout (darknet save_weights): header of 3 int32 (major, minor,
    revision) + int64 `seen` (int32 when major*10+minor < 2), then per conv
    layer in cfg order: [bn_beta, bn_gamma, bn_mean, bn_var] when
    batch_normalize else [conv_bias], followed by conv weights in
    (out, in, kh, kw) order. Flax kernels are (kh, kw, in, out).
    """
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

    for name, features, k, has_bn in _DARKNET_ORDER:
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


def save_darknet_weights(path: str, variables) -> None:
    """Write flax variables back out in the darknet layout (test fixture
    generator + interchange)."""
    parts = [np.array([0, 2, 0], np.int32).tobytes(),
             np.array([0], np.int64).tobytes()]
    params = jax.tree_util.tree_map(np.asarray, variables)
    for name, features, _k, has_bn in _DARKNET_ORDER:
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
