"""Z-buffered mesh rasterizer in JAX — rendering as a TPU program.

Upgrade over the host painter's-algorithm renderer (gaitlab.render.raster):
correct hidden-surface removal via a two-pass scatter-min z-buffer, fully
vectorized (vmap over faces, no Python loops), so overlay rendering can run
on the same device as the model. Replaces the reference's pyrender/EGL
renderer (/root/reference/lib/utils/renderer.py:50-126) with the same
weak-perspective camera convention.

Algorithm (classic deferred z-test, race-free under jnp scatter-min):
  1. project vertices; per face, rasterize a KxK window anchored at the
     face's bbox corner: barycentric coverage + interpolated depth;
  2. scatter-min all fragment depths into the z-buffer (z pass);
  3. a fragment whose depth equals the z-buffer value owns its pixel;
     scatter its shaded color (color pass).
The z and color passes are separate jitted programs so faces can be
rasterized in extent classes — a small window for the bulk of the mesh
and a large one for the few silhouette-stretched outliers — against ONE
shared z-buffer (fragment count F*K^2 follows each class's K instead of
the global max).

Depth convention (reference renderer.py:40-47 + the 180-deg x flip at
:82-83): project_weak_perspective returns z in the render frame, where
the GL camera looks along -z, i.e. NEARER = LARGER depth value. The
z-buffer stores -depth and scatter-mins, so the nearest fragment wins —
pyrender's GL_LESS test on P[2,2] = -1 projected depth does the same.
(Round 5 fix: this wrapper used to re-negate depth, which inverted the
z-test and rendered the BACK surface; the silhouette-only parity test
missed it — tests/test_raster_jax.py now asserts occlusion shading
against the painter.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

AMBIENT = 0.35
LIGHT_DIR = np.array([0.2, 0.3, 1.0])
LIGHT_DIR = LIGHT_DIR / np.linalg.norm(LIGHT_DIR)
FAR = 1e9


def _fragments(verts_pix, depth, faces, height, width, window):
    """Per-face KxK fragment grid: (flat pixel index, z key, barycentric
    validity). key = -depth where valid (scatter-MIN keeps the nearest =
    largest depth), FAR elsewhere."""
    tri = verts_pix[faces]          # (F,3,2)
    tri_z = depth[faces]            # (F,3)

    x0 = jnp.clip(jnp.floor(tri[..., 0].min(1)).astype(jnp.int32),
                  0, width - 1)
    y0 = jnp.clip(jnp.floor(tri[..., 1].min(1)).astype(jnp.int32),
                  0, height - 1)

    dx = jnp.arange(window, dtype=jnp.float32)
    gx = x0[:, None].astype(jnp.float32) + dx[None, :]        # (F,K)
    gy = y0[:, None].astype(jnp.float32) + dx[None, :]        # (F,K)
    px = gx[:, None, :]                                        # (F,1,K)
    py = gy[:, :, None]                                        # (F,K,1)

    ax, ay = tri[:, 0, 0], tri[:, 0, 1]
    bx, by = tri[:, 1, 0], tri[:, 1, 1]
    cx, cy = tri[:, 2, 0], tri[:, 2, 1]
    area = ((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))
    inv_area = jnp.where(jnp.abs(area) < 1e-9, 0.0, 1.0 / area)

    def edge(x1, y1, x2, y2):
        return ((x2 - x1)[:, None, None] * (py - y1[:, None, None])
                - (y2 - y1)[:, None, None] * (px - x1[:, None, None]))

    w0 = edge(bx, by, cx, cy) * inv_area[:, None, None]
    w1 = edge(cx, cy, ax, ay) * inv_area[:, None, None]
    w2 = 1.0 - w0 - w1
    inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
              & (jnp.abs(area)[:, None, None] > 1e-9))

    frag_z = (w0 * tri_z[:, 0, None, None] + w1 * tri_z[:, 1, None, None]
              + w2 * tri_z[:, 2, None, None])
    ix = jnp.clip(px.astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(py.astype(jnp.int32), 0, height - 1)
    on_screen = ((px >= 0) & (px < width) & (py >= 0) & (py < height))
    valid = inside & jnp.broadcast_to(on_screen, inside.shape)

    flat_idx = (iy * width + ix).reshape(-1)
    key = jnp.where(valid, -frag_z, FAR).reshape(-1)
    return flat_idx, key, valid


@partial(jax.jit, static_argnames=("height", "width", "window"))
def zbuffer_pass(verts_pix, depth, faces, zbuf, *, height, width, window):
    """Scatter-min this face group's fragment depths into zbuf (H*W,)."""
    flat_idx, key, _ = _fragments(verts_pix, depth, faces,
                                  height, width, window)
    return zbuf.at[flat_idx].min(key)


@partial(jax.jit, static_argnames=("height", "width", "window"))
def color_pass(verts_pix, depth, faces, shade, color, zbuf, canvas, *,
               height, width, window):
    """Scatter shaded color for fragments that own their pixel under the
    FINAL zbuf. canvas is (H*W+1, 3) f32 — the last row is the dummy slot
    non-owning fragments write to."""
    flat_idx, key, valid = _fragments(verts_pix, depth, faces,
                                      height, width, window)
    owns = valid.reshape(-1) & (key <= zbuf[flat_idx] + 1e-7)
    frag_color = (shade[:, None, None]
                  * jnp.ones((1, window, window))).reshape(-1)[:, None] \
        * color[None]
    idx_or_dummy = jnp.where(owns, flat_idx, height * width)
    return canvas.at[idx_or_dummy].set(frag_color)


@partial(jax.jit, static_argnames=("height", "width", "window"))
def rasterize_zbuffer(
    verts_pix: jax.Array,   # (V, 2) pixel coords
    depth: jax.Array,       # (V,) camera depth (larger = nearer)
    faces: jax.Array,       # (F, 3) int
    shade: jax.Array,       # (F,) per-face lambert factor
    color: jax.Array,       # (3,) base color 0..255
    background: jax.Array,  # (H, W, 3) image
    height: int, width: int, window: int = 32,
):
    """Single-group rasterization (z pass + color pass in one program)."""
    zbuf = jnp.full((height * width,), FAR, jnp.float32)
    zbuf = zbuffer_pass(verts_pix, depth, faces, zbuf,
                        height=height, width=width, window=window)
    canvas = jnp.concatenate(
        [background.astype(jnp.float32).reshape(-1, 3),
         jnp.zeros((1, 3), jnp.float32)], axis=0)
    canvas = color_pass(verts_pix, depth, faces, shade, color, zbuf,
                        canvas, height=height, width=width, window=window)
    return (canvas[:-1].reshape(height, width, 3),
            zbuf.reshape(height, width))


def _cpu_device():
    """Host CPU jax device, or None when the CPU platform is unavailable
    (e.g. a platform-restricted build)."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _window_classes(extents: np.ndarray, cap: int = 128):
    """Split faces into (small, large) window classes.

    One global window pays max-extent cost for every face; silhouette-
    stretched outliers would force K=64+ on a mesh whose typical face is
    <=16 px (F*K^2 fragments). Classing the bulk at the p97 extent and
    only the tail at the max cuts fragments ~10x on SMPL-scale meshes
    (docs/RENDER_BENCH.json).
    """
    def rnd(e):
        return int(np.clip(8 * np.ceil((e + 2.0) / 8.0), 8, cap))

    if extents.size == 0:
        return [(np.zeros(0, np.int64), 8)]
    k_small = rnd(np.percentile(extents, 97.0))
    k_big = rnd(extents.max())
    small = extents <= (k_small - 2.0)
    if k_big <= k_small or small.all():
        return [(np.arange(extents.size), rnd(extents.max()))]
    return [(np.nonzero(small)[0], k_small),
            (np.nonzero(~small)[0], k_big)]


def render_mesh_jax(img: np.ndarray, verts: np.ndarray, cam,
                    faces: np.ndarray, color=(1.0, 1.0, 0.9),
                    window: int = 0, angle=None, axis=None,
                    device=None) -> np.ndarray:
    """Drop-in z-buffered equivalent of raster.render_mesh.

    window=0 auto-sizes per-face raster windows in two extent classes
    (rounded to multiples of 8 — one compile per video, not per frame).
    angle/axis apply the reference's extra view rotation
    (renderer.py:89-91) for --sideview. `device` pins execution (e.g. the
    host CPU device to keep rendering off a tunneled accelerator —
    docs/RENDER_BENCH.json has the measured tradeoff); None uses the
    default backend.
    """
    from gaitlab.render.raster import _rotation_matrix, project_weak_perspective

    h, w = img.shape[:2]
    verts = np.asarray(verts, np.float64)
    if angle and axis is not None:
        # extra view rotation in the same flipped frame the painter uses
        flip = np.diag([1.0, -1.0, -1.0])
        R = _rotation_matrix(angle, axis)
        verts = (flip @ R @ flip @ verts.T).T
    pix, depth = project_weak_perspective(verts, cam, w, h)
    # nearer = larger render-frame z (see module docstring): pass as-is

    tri = np.asarray(faces, np.int64)
    v0, v1, v2 = (verts[tri[:, i]] for i in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    n = n / np.clip(np.linalg.norm(n, axis=1, keepdims=True), 1e-9, None)
    n_cam = n * np.array([1.0, -1.0, -1.0])
    shade = AMBIENT + (1 - AMBIENT) * np.clip(n_cam @ LIGHT_DIR, 0, None)

    tp = np.clip(np.nan_to_num(pix[tri]), [0, 0], [w - 1, h - 1])
    extents = (tp.max(axis=1) - tp.min(axis=1)).max(axis=1)
    if window:
        groups = [(np.arange(tri.shape[0]), int(window))]
    else:
        groups = _window_classes(extents)

    put = (lambda x: jax.device_put(x, device)) if device is not None \
        else jnp.asarray
    pix_j = put(jnp.asarray(pix, jnp.float32))
    dep_j = put(jnp.asarray(depth, jnp.float32))
    col_j = put(jnp.asarray(np.asarray(color, np.float32) * 255.0))

    zbuf = put(jnp.full((h * w,), FAR, jnp.float32))
    g_faces, g_shade = [], []
    for idx, k in groups:
        g_faces.append(put(jnp.asarray(tri[idx], jnp.int32)))
        g_shade.append(put(jnp.asarray(shade[idx], jnp.float32)))
        zbuf = zbuffer_pass(pix_j, dep_j, g_faces[-1], zbuf,
                            height=h, width=w, window=k)
    canvas = put(jnp.concatenate(
        [jnp.asarray(img, jnp.float32).reshape(-1, 3),
         jnp.zeros((1, 3), jnp.float32)], axis=0))
    for (idx, k), fc, sh in zip(groups, g_faces, g_shade):
        canvas = color_pass(pix_j, dep_j, fc, sh, col_j, zbuf, canvas,
                            height=h, width=w, window=k)
    out = np.asarray(canvas[:-1]).reshape(h, w, 3)
    return np.clip(out, 0, 255).astype(np.uint8)
