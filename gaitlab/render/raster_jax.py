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
  2. scatter-min all fragment depths into the z-buffer;
  3. a fragment whose depth equals the z-buffer value owns its pixel;
     scatter its shaded color.
K is the face-window size; faces larger than K px are truncated (harmless
at gait-video scales; bump `window` for close-ups).
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
    # z-test key: larger depth = nearer camera -> scatter-max via min(-z)
    key = jnp.where(valid, -frag_z, FAR).reshape(-1)

    zbuf = jnp.full((height * width,), FAR, jnp.float32)
    zbuf = zbuf.at[flat_idx].min(key)

    owns = valid.reshape(-1) & (key <= zbuf[flat_idx] + 1e-7)
    frag_color = (shade[:, None, None]
                  * jnp.ones_like(frag_z)).reshape(-1)[:, None] * color[None]
    # non-owning fragments scatter to a dummy slot so they can never clobber
    # a winner's pixel (scatter order between duplicates is unspecified)
    idx_or_dummy = jnp.where(owns, flat_idx, height * width)
    canvas = jnp.concatenate(
        [background.astype(jnp.float32).reshape(-1, 3),
         jnp.zeros((1, 3), jnp.float32)], axis=0)
    canvas = canvas.at[idx_or_dummy].set(frag_color)
    return (canvas[:-1].reshape(height, width, 3),
            zbuf.reshape(height, width))


def render_mesh_jax(img: np.ndarray, verts: np.ndarray, cam,
                    faces: np.ndarray, color=(1.0, 1.0, 0.9),
                    window: int = 32) -> np.ndarray:
    """Drop-in z-buffered equivalent of raster.render_mesh."""
    from gaitlab.render.raster import project_weak_perspective

    h, w = img.shape[:2]
    verts = np.asarray(verts, np.float64)
    pix, depth = project_weak_perspective(verts, cam, w, h)
    # camera looks along -z after the flip: nearer = larger -depth
    near = -np.asarray(depth, np.float32)

    tri = np.asarray(faces, np.int64)
    v0, v1, v2 = (verts[tri[:, i]] for i in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    n = n / np.clip(np.linalg.norm(n, axis=1, keepdims=True), 1e-9, None)
    n_cam = n * np.array([1.0, -1.0, -1.0])
    shade = AMBIENT + (1 - AMBIENT) * np.clip(n_cam @ LIGHT_DIR, 0, None)

    out, _ = rasterize_zbuffer(
        jnp.asarray(pix, jnp.float32), jnp.asarray(near),
        jnp.asarray(tri, jnp.int32), jnp.asarray(shade, jnp.float32),
        jnp.asarray(np.asarray(color, np.float32) * 255.0),
        jnp.asarray(img), height=h, width=w, window=window)
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)
