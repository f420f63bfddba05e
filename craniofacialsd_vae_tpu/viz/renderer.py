"""Mesh renderer — pure JAX z-buffer rasterizer.

The reference renders with pytorch3d's C++/CUDA rasterizer + Gouraud/
shadeless shaders (model_manager.py:616-658, 779-788). There is no JAX
analog, so this module implements one natively: a perspective camera on the
reference's viewpoint convention (dist 2.5, elev 0, azim 15°, point light at
(0,0,3)), per-vertex Gouraud lighting, and a tiled edge-function rasterizer
that z-buffers pixel×triangle tiles with a lax.scan over triangle chunks —
all dense regular compute that runs happily on TPU (and acceptably on CPU
for small images). Rendering is an offline artifact path, not part of the
training step.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["look_at_camera", "vertex_normals", "render_mesh",
           "render_batch", "make_image_grid"]

_PALLAS_STATE = {"ok": None}      # tri-state: None = not yet probed
_NATIVE_STATE = {"ok": None}


def _native_raster_active() -> bool:
    """Use the native C++ scanline rasterizer (geometry/native.py
    rasterize_native) whenever the Pallas TPU kernel is not active: the
    portable XLA rasterizer tests every pixel against every triangle
    (~30-40 s per 256² frame of the 17k-vertex template on CPU — the
    demo's wall-clock sink, VERDICT r4), while the scanline path bounds
    work to triangle bboxes and renders the same frame in ~10 ms.
    Opt out: CFSDVAE_NATIVE_RASTER=0."""
    if os.environ.get("CFSDVAE_NATIVE_RASTER", "1") == "0":
        return False
    if _NATIVE_STATE["ok"] is None:
        try:
            from ..geometry.native import rasterize_available
            _NATIVE_STATE["ok"] = rasterize_available()
        except Exception:
            _NATIVE_STATE["ok"] = False
    return _NATIVE_STATE["ok"]


def _project_screen_np(verts_cam: np.ndarray, image_size: int,
                       fov_deg: float = 60.0) -> np.ndarray:
    """Camera-frame [V,3] → screen-space (px, py, depth) — the same
    projection _rasterize applies, in numpy for the native path."""
    verts_cam = np.asarray(verts_cam, np.float32)
    f = np.float32(1.0 / np.tan(np.deg2rad(fov_deg) / 2))
    z = -verts_cam[:, 2]
    zc = np.maximum(z, np.float32(1e-6))
    px = (f * verts_cam[:, 0] / zc * 0.5 + 0.5) * image_size
    py = (0.5 - f * verts_cam[:, 1] / zc * 0.5) * image_size
    return np.stack([px, py, z], axis=1)


def _shade_np(verts: np.ndarray, faces: np.ndarray, colors: np.ndarray,
              light_pos) -> np.ndarray:
    """Gouraud diffuse shading in numpy — mirrors the jnp math in
    render_mesh/_render_batch_jit for the host-side native path."""
    verts = np.asarray(verts, np.float32)
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)
    n = np.zeros_like(verts)
    for i in range(3):
        np.add.at(n, faces[:, i], fn)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
    light = np.asarray(light_pos, np.float32) - verts
    light /= np.linalg.norm(light, axis=-1, keepdims=True) + 1e-12
    diffuse = np.clip(np.sum(n * light, axis=-1), 0.0, 1.0)
    return np.asarray(colors, np.float32) * \
        (0.25 + 0.75 * diffuse)[:, None]


def _render_one_native(v, faces_np, c, eye, rot, light_pos,
                       image_size: int, shadeless: bool,
                       background: float) -> np.ndarray:
    from ..geometry.native import rasterize_native

    if not shadeless:
        c = _shade_np(v, faces_np, c, light_pos)
    v_cam = (np.asarray(v, np.float32) - eye) @ rot.T
    pts = _project_screen_np(v_cam, image_size)
    return rasterize_native(pts, faces_np, c, image_size, background)


def _pallas_raster_active() -> bool:
    """Use the Pallas z-buffer kernel (viz/raster_pallas.py) on TPU —
    measured ~11× over the portable XLA rasterizer on the flagship
    template. Probed once with a tiny compile; any Mosaic rejection
    falls back to the portable path. Opt out: CFSDVAE_PALLAS_RASTER=0."""
    if os.environ.get("CFSDVAE_PALLAS_RASTER", "1") == "0":
        return False
    if _PALLAS_STATE["ok"] is None:
        ok = False
        try:
            if jax.devices()[0].platform == "tpu":
                from .raster_pallas import (pallas_raster_supported,
                                            rasterize_pallas)
                if pallas_raster_supported():
                    v = jnp.asarray([[0., 0., -1.], [1., 0., -1.],
                                     [0., 1., -1.]])
                    f = jnp.asarray([[0, 1, 2]], jnp.int32)
                    np.asarray(rasterize_pallas(v, f, jnp.ones((3, 3)),
                                                image_size=8))
                    ok = True
        except Exception:
            ok = False
        _PALLAS_STATE["ok"] = ok
    return _PALLAS_STATE["ok"]


def look_at_camera(dist: float = 2.5, elev_deg: float = 0.0,
                   azim_deg: float = 15.0):
    """(eye [3], R [3,3]) world→camera rotation for a camera orbiting the
    origin (reference viewpoint: look_at_view_transform(2.5, 0, 15))."""
    elev = np.deg2rad(elev_deg)
    azim = np.deg2rad(azim_deg)
    eye = np.array([dist * np.cos(elev) * np.sin(azim),
                    dist * np.sin(elev),
                    dist * np.cos(elev) * np.cos(azim)])
    forward = -eye / np.linalg.norm(eye)            # toward origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    rot = np.stack([right, true_up, -forward])       # rows: cam axes
    return eye.astype(np.float32), rot.astype(np.float32)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted per-vertex normals, scatter-free would need transpose
    tables; this is host/offline code so segment_sum is fine."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = jnp.cross(v1 - v0, v2 - v0)                 # [F, 3], area-weighted
    n = jnp.zeros_like(verts)
    for i in range(3):
        n = n.at[faces[:, i]].add(fn)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


@partial(jax.jit, static_argnames=("image_size", "tri_chunk"))
def _rasterize(verts_cam, faces, colors, image_size: int = 256,
               fov_deg: float = 60.0, tri_chunk: int = 4096,
               background: float = 0.0):
    """verts_cam [V,3] (camera frame, -z forward), faces [F,3],
    colors [V,3] → [H,W,3] image."""
    f = 1.0 / jnp.tan(jnp.deg2rad(fov_deg) / 2)
    z = -verts_cam[:, 2]                             # positive depth
    x_ndc = f * verts_cam[:, 0] / jnp.maximum(z, 1e-6)
    y_ndc = f * verts_cam[:, 1] / jnp.maximum(z, 1e-6)
    px = (x_ndc * 0.5 + 0.5) * image_size
    py = (0.5 - y_ndc * 0.5) * image_size
    pts = jnp.stack([px, py, z], axis=1)             # [V, 3]

    n_faces = faces.shape[0]
    # shape-static chunk sizing: padding triangles are rasterized like
    # real ones, so a small mesh padded to the full 4096 chunk pays up to
    # ~13× phantom [pixels × triangles] work (measured 107 → 14 s for a
    # 10-frame 256² batch of a 320-face mesh on CPU)
    tri_chunk = min(tri_chunk, max(-(-n_faces // 256) * 256, 256))
    pad = (-n_faces) % tri_chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    # degenerate padding (zero-index) handled by the valid mask
    valid = jnp.concatenate(
        [jnp.ones(n_faces, bool), jnp.zeros(pad, bool)])

    tri = pts[faces_p]                               # [Fp, 3, 3]
    tri_col = colors[faces_p]                        # [Fp, 3, 3]
    n_chunks = tri.shape[0] // tri_chunk
    tri = tri.reshape(n_chunks, tri_chunk, 3, 3)
    tri_col = tri_col.reshape(n_chunks, tri_chunk, 3, 3)
    valid = valid.reshape(n_chunks, tri_chunk)

    ys = jnp.arange(image_size) + 0.5
    xs = jnp.arange(image_size) + 0.5
    pxg, pyg = jnp.meshgrid(xs, ys)                  # [H, W]
    pix = jnp.stack([pxg.ravel(), pyg.ravel()], axis=1)   # [P, 2]

    def chunk_body(carry, inputs):
        best_z, best_rgb = carry
        t, c, v = inputs                             # [Tc,3,3],[Tc,3,3],[Tc]
        x0, y0 = t[:, 0, 0], t[:, 0, 1]
        x1, y1 = t[:, 1, 0], t[:, 1, 1]
        x2, y2 = t[:, 2, 0], t[:, 2, 1]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)   # [Tc]

        pxv = pix[:, 0][:, None]                     # [P, 1]
        pyv = pix[:, 1][:, None]
        w0 = (x2 - x1) * (pyv - y1) - (y2 - y1) * (pxv - x1)
        w1 = (x0 - x2) * (pyv - y2) - (y0 - y2) * (pxv - x2)
        w2 = (x1 - x0) * (pyv - y0) - (y1 - y0) * (pxv - x0)
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        b0 = w0 * inv_area
        b1 = w1 * inv_area
        b2 = w2 * inv_area
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & \
            (jnp.abs(area) > 1e-12) & v[None, :]
        depth = b0 * t[:, 0, 2] + b1 * t[:, 1, 2] + b2 * t[:, 2, 2]
        depth = jnp.where(inside & (depth > 1e-6), depth, jnp.inf)

        hit = jnp.argmin(depth, axis=1)              # [P]
        zmin = jnp.take_along_axis(depth, hit[:, None], axis=1)[:, 0]
        bsel = jnp.stack([
            jnp.take_along_axis(b0, hit[:, None], axis=1)[:, 0],
            jnp.take_along_axis(b1, hit[:, None], axis=1)[:, 0],
            jnp.take_along_axis(b2, hit[:, None], axis=1)[:, 0]], axis=1)
        rgb = jnp.einsum("pk,pkc->pc", bsel, c[hit])

        better = zmin < best_z
        best_rgb = jnp.where(better[:, None], rgb, best_rgb)
        best_z = jnp.where(better, zmin, best_z)
        return (best_z, best_rgb), None

    n_pix = image_size * image_size
    init = (jnp.full(n_pix, jnp.inf),
            jnp.full((n_pix, 3), background))
    (zbuf, rgb), _ = jax.lax.scan(chunk_body, init, (tri, tri_col, valid))
    return rgb.reshape(image_size, image_size, 3)


def render_mesh(verts, faces, vertex_colors=None, image_size: int = 256,
                dist: float = 2.5, elev: float = 0.0, azim: float = 15.0,
                shadeless: bool = False,
                light_pos=(0.0, 0.0, 3.0)) -> np.ndarray:
    """Render one mesh → [H, W, 3] float image in [0, 1].

    shadeless=True reproduces the reference's ShadelessShader (textures
    sampled directly, used for error colormaps)."""
    if vertex_colors is None:
        vertex_colors = np.full(np.shape(verts), 0.5, np.float32)
    if not _pallas_raster_active() and _native_raster_active():
        eye, rot = look_at_camera(dist, elev, azim)
        return np.clip(_render_one_native(
            np.asarray(verts, np.float32), np.asarray(faces, np.int64),
            np.asarray(vertex_colors, np.float32), eye, rot, light_pos,
            image_size, shadeless, 0.0), 0.0, 1.0)

    verts = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(np.asarray(faces), jnp.int32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)

    if not shadeless:
        normals = vertex_normals(verts, faces_j)
        light = jnp.asarray(light_pos) - verts
        light = light / (jnp.linalg.norm(light, axis=-1, keepdims=True)
                         + 1e-12)
        diffuse = jnp.clip(jnp.sum(normals * light, axis=-1), 0.0, 1.0)
        shade = 0.25 + 0.75 * diffuse
        vertex_colors = vertex_colors * shade[:, None]

    eye, rot = look_at_camera(dist, elev, azim)
    verts_cam = (verts - eye) @ rot.T
    if _pallas_raster_active():
        from .raster_pallas import rasterize_pallas
        img = rasterize_pallas(verts_cam, faces_j, vertex_colors,
                               image_size=image_size)
    else:
        img = _rasterize(verts_cam, faces_j, vertex_colors,
                         image_size=image_size)
    return np.clip(np.asarray(img), 0.0, 1.0)


# background is a traced scalar operand (only used in a jnp.where), so a
# new background value does NOT recompile the rasterizer program
@partial(jax.jit, static_argnames=("image_size", "shadeless"))
def _render_batch_jit(verts, faces, colors, eye, rot, light_pos,
                      image_size: int, shadeless: bool,
                      background: float = 0.0):
    """[B, N, 3] → [B, H, W, 3], fully vmapped on device."""

    def one(v, c):
        if not shadeless:
            normals = vertex_normals(v, faces)
            light = light_pos - v
            light = light / (jnp.linalg.norm(light, axis=-1, keepdims=True)
                             + 1e-12)
            diffuse = jnp.clip(jnp.sum(normals * light, axis=-1), 0.0, 1.0)
            c = c * (0.25 + 0.75 * diffuse)[:, None]
        v_cam = (v - eye) @ rot.T
        return _rasterize(v_cam, faces, c, image_size=image_size,
                          background=background)

    return jax.vmap(one)(verts, colors)


@partial(jax.jit, static_argnames=("image_size", "shadeless"))
def _render_one_pallas(v, faces, c, eye, rot, light_pos, image_size: int,
                       shadeless: bool, background: float = 0.0):
    """Single shaded mesh through the Pallas rasterizer (the kernel's
    SMEM specs don't batch under vmap; at ~18 ms/render a host loop over
    the batch is already ~9× the vmapped portable path)."""
    from .raster_pallas import rasterize_pallas

    if not shadeless:
        normals = vertex_normals(v, faces)
        light = light_pos - v
        light = light / (jnp.linalg.norm(light, axis=-1, keepdims=True)
                         + 1e-12)
        diffuse = jnp.clip(jnp.sum(normals * light, axis=-1), 0.0, 1.0)
        c = c * (0.25 + 0.75 * diffuse)[:, None]
    v_cam = (v - eye) @ rot.T
    return rasterize_pallas(v_cam, faces, c, image_size=image_size,
                            background=background)


def render_batch(batched_verts, faces, vertex_colors=None,
                 image_size: int = 256, dist: float = 2.5,
                 elev: float = 0.0, azim: float = 15.0,
                 shadeless: bool = False, light_pos=(0.0, 0.0, 3.0),
                 max_vmap: int = 4, background: float = 0.0,
                 quantize_transfer: bool = True) -> np.ndarray:
    """[B, N, 3] → [B, H, W, 3].

    vmapped on device in sub-batches of max_vmap — the rasterizer's
    pixel-tile × triangle-chunk working set scales with the vmap width, so
    wider batches exhaust HBM on big templates.

    quantize_transfer: on the Pallas path, fetch frames as uint8 (4× less
    over the slow tunnel; free for PNG/GIF/MP4 consumers, which quantize
    anyway). Set False for bitwise backend-independent float output (any
    numeric consumer of pixels should pass False — quantization shifts
    values by up to ~1/510 vs the portable path)."""
    verts = np.asarray(batched_verts, np.float32)
    faces_j = jnp.asarray(np.asarray(faces), jnp.int32)
    if vertex_colors is None:
        colors = np.full(verts.shape, 0.5, np.float32)
    else:
        colors = np.asarray(vertex_colors, np.float32)
        if colors.ndim == 2:
            colors = np.broadcast_to(colors[None], verts.shape)
    eye, rot = look_at_camera(dist, elev, azim)

    if _pallas_raster_active():
        # queue every render asynchronously, stack ON DEVICE, quantize to
        # uint8 on device, fetch once: per-image np.asarray would pay a
        # host↔device round-trip per mesh, and the tunnel moves float32
        # frames at ~10 MB/s — every consumer of these images quantizes to
        # PNG/GIF anyway, so uint8 transfer (4× less) is semantically free
        imgs = [_render_one_pallas(
            jnp.asarray(v), faces_j, jnp.asarray(c), jnp.asarray(eye),
            jnp.asarray(rot), jnp.asarray(light_pos), image_size,
            shadeless, background)
            for v, c in zip(verts, colors)]
        packed = jnp.clip(jnp.stack(imgs), 0.0, 1.0)
        if quantize_transfer:
            packed = jnp.round(packed * 255.0).astype(jnp.uint8)
            return np.asarray(packed).astype(np.float32) / 255.0
        return np.asarray(packed)

    if _native_raster_active():
        imgs = [_render_one_native(v, np.asarray(faces, np.int64), c,
                                   eye, rot, light_pos, image_size,
                                   shadeless, background)
                for v, c in zip(verts, colors)]
        return np.clip(np.stack(imgs), 0.0, 1.0)

    out = []
    for s in range(0, len(verts), max_vmap):
        sub_v = verts[s:s + max_vmap]
        sub_c = colors[s:s + max_vmap]
        pad = max_vmap - len(sub_v)          # pad to a single compiled shape
        if pad:
            sub_v = np.concatenate([sub_v, sub_v[-1:].repeat(pad, 0)])
            sub_c = np.concatenate([sub_c, sub_c[-1:].repeat(pad, 0)])
        img = _render_batch_jit(jnp.asarray(sub_v), faces_j,
                                jnp.asarray(sub_c), jnp.asarray(eye),
                                jnp.asarray(rot), jnp.asarray(light_pos),
                                image_size, shadeless, background)
        out.append(np.asarray(img)[:max_vmap - pad if pad else max_vmap])
    return np.clip(np.concatenate(out), 0.0, 1.0)


def make_image_grid(images: np.ndarray, nrow: int = 4, padding: int = 10,
                    pad_value: float = 1.0) -> np.ndarray:
    """[B, H, W, 3] → single grid image (torchvision make_grid analog)."""
    b, h, w, c = images.shape
    ncol = nrow
    nrows = -(-b // ncol)
    grid = np.full((nrows * (h + padding) + padding,
                    ncol * (w + padding) + padding, c), pad_value,
                   np.float32)
    for i in range(b):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = images[i]
    return grid
