"""Z-buffer rasterizer: coverage, occlusion ordering, screen clipping."""

import numpy as np
import pytest

from gaitlab.render import raster_jax


def _render_tris(tris_pix, tris_z, shades, h=64, w=64, window=32):
    import jax.numpy as jnp

    verts = np.array(tris_pix, np.float32).reshape(-1, 2)
    depth = np.array(tris_z, np.float32).repeat(3)
    faces = np.arange(verts.shape[0]).reshape(-1, 3)
    bg = np.zeros((h, w, 3), np.uint8)
    out, zbuf = raster_jax.rasterize_zbuffer(
        jnp.asarray(verts), jnp.asarray(depth), jnp.asarray(faces, jnp.int32),
        jnp.asarray(np.asarray(shades, np.float32)),
        jnp.asarray(np.array([255.0, 0.0, 0.0], np.float32)),
        jnp.asarray(bg), height=h, width=w, window=window)
    return np.asarray(out), np.asarray(zbuf)


def test_single_triangle_coverage():
    out, _ = _render_tris([[(10, 10), (30, 10), (10, 30)]], [1.0], [1.0])
    assert out[12, 12, 0] > 200      # inside: red
    assert out[12, 12, 1] == 0
    assert out[50, 50].sum() == 0    # outside: background
    # vertex-adjacent interior pixel covered
    assert out[11, 11, 0] > 200


def test_occlusion_near_wins():
    # two overlapping triangles; the NEARER one (larger depth) must win
    tris = [[(10, 10), (40, 10), (10, 40)],
            [(10, 10), (40, 10), (10, 40)]]
    out_near_second, _ = _render_tris(tris, [1.0, 2.0], [0.2, 1.0])
    # winner has shade 1.0 -> bright red
    assert out_near_second[15, 15, 0] > 200
    out_near_first, _ = _render_tris(tris, [2.0, 1.0], [1.0, 0.2])
    assert out_near_first[15, 15, 0] > 200
    out_dim, _ = _render_tris(tris, [2.0, 1.0], [0.2, 1.0])
    assert out_dim[15, 15, 0] < 100  # occluder is dim


def test_offscreen_clipping():
    out, _ = _render_tris([[(-20, -20), (5, -20), (-20, 5)]], [1.0], [1.0],
                          h=32, w=32)
    assert np.isfinite(out).all()  # nothing crashes; corner pixel may shade
    out2, _ = _render_tris([[(100, 100), (120, 100), (100, 120)]], [1.0],
                           [1.0], h=32, w=32)
    # fully offscreen bbox clamps to the border; the triangle interior is
    # off-canvas so nothing but possibly border pixels changes
    assert out2[:31, :31].sum() == 0


def test_render_mesh_jax_matches_painter_roughly(rng):
    """Convex single blob: z-buffer and painter agree on silhouette."""
    from gaitlab.render import raster

    # a small sphere-ish mesh
    phi = np.linspace(0, np.pi, 8)
    theta = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    P, T = np.meshgrid(phi, theta, indexing="ij")
    verts = 0.3 * np.stack([np.sin(P) * np.cos(T), np.cos(P),
                            np.sin(P) * np.sin(T)], -1).reshape(-1, 3)
    faces = []
    for i in range(7):
        for j in range(12):
            a = i * 12 + j
            b = i * 12 + (j + 1) % 12
            c = (i + 1) * 12 + j
            d = (i + 1) * 12 + (j + 1) % 12
            faces += [[a, b, c], [b, d, c]]
    faces = np.array(faces)
    img = np.zeros((120, 160, 3), np.uint8)
    cam = [1.0, 1.0, 0.0, 0.0]
    zb = raster_jax.render_mesh_jax(img, verts, cam, faces, window=64)
    pt = raster.render_mesh(img, verts, cam, faces)
    sil_z = (zb.sum(-1) > 0)
    sil_p = (pt.sum(-1) > 0)
    inter = (sil_z & sil_p).sum()
    union = (sil_z | sil_p).sum()
    assert union > 100
    assert inter / union > 0.9  # same silhouette


def _sphere(rings=30, segs=40, r=0.3):
    phi = np.linspace(0, np.pi, rings)
    theta = np.linspace(0, 2 * np.pi, segs, endpoint=False)
    P, T = np.meshgrid(phi, theta, indexing="ij")
    verts = r * np.stack([np.sin(P) * np.cos(T), np.cos(P),
                          np.sin(P) * np.sin(T)], -1).reshape(-1, 3)
    faces = []
    for i in range(rings - 1):
        for j in range(segs):
            a = i * segs + j
            b = i * segs + (j + 1) % segs
            c = (i + 1) * segs + j
            d = (i + 1) * segs + (j + 1) % segs
            faces += [[a, b, c], [b, d, c]]
    return verts, np.array(faces)


def test_zbuffer_shows_front_surface_like_painter():
    """Golden-frame occlusion parity (VERDICT r4 #5): the z-buffer and the
    painter must agree on SHADING, not just silhouette — the round-5 fix
    caught a depth-sign inversion that rendered the back surface (4%
    pixel agreement) while the silhouette-IoU test stayed green."""
    from gaitlab.render import raster

    verts, faces = _sphere()
    img = np.zeros((240, 320, 3), np.uint8)
    cam = [1.0, 1.0, 0.0, 0.0]
    zb = raster_jax.render_mesh_jax(img, verts, cam, faces)
    pt = raster.render_mesh(img, verts, cam, faces)
    changed = (pt.sum(-1) > 0) | (zb.sum(-1) > 0)
    assert changed.sum() > 3000
    agree = (np.abs(pt.astype(int) - zb.astype(int)).max(-1)[changed]
             <= 8).mean()
    # residual disagreement is painter overdraw at shared face edges
    # (flat shading steps); an occlusion inversion scores ~0.04
    assert agree > 0.75, agree
    assert np.abs(pt.astype(int) - zb.astype(int))[changed].mean() < 10

    # the lit hemisphere (light from +x,+y,+z in camera space) must be
    # brighter than ambient in BOTH renderers: back-surface normals would
    # leave the whole disk at the ambient floor
    cy, cx = 120, 160
    for out in (pt, zb):
        center = out[cy - 20:cy + 20, cx - 20:cx + 20].mean()
        assert center > 0.45 * 255, center  # ambient floor is 0.35


def test_zbuffer_sideview_rotation_matches_painter():
    """angle/axis (the --sideview path) rotates the mesh identically in
    both renderers — render_mesh_jax ignored the kwargs before round 5."""
    from gaitlab.render import raster

    verts, faces = _sphere()
    verts = verts * np.array([1.0, 1.0, 0.3])  # flattened: views differ
    img = np.zeros((240, 320, 3), np.uint8)
    cam = [1.0, 1.0, 0.0, 0.0]
    kw = dict(angle=270, axis=[0, 1, 0])
    zb = raster_jax.render_mesh_jax(img, verts, cam, faces, **kw)
    pt = raster.render_mesh(img, verts, cam, faces, **kw)
    sil_z = zb.sum(-1) > 0
    sil_p = pt.sum(-1) > 0
    inter = (sil_z & sil_p).sum()
    union = (sil_z | sil_p).sum()
    assert union > 500
    assert inter / union > 0.9
    # rotation actually applied: silhouette must differ from the frontal
    front = raster_jax.render_mesh_jax(img, verts, cam, faces).sum(-1) > 0
    assert (sil_z ^ front).sum() > 0.2 * front.sum()
