"""Pallas TPU rasterizer kernel — tiled edge-function z-buffering in VMEM.

The portable rasterizer (renderer._rasterize) materializes [pixels ×
tri_chunk] barycentric/depth intermediates through HBM on every triangle
chunk — ~tens of GB of HBM traffic per 256² image of the 33k-face template,
i.e. seconds per render on a bandwidth-bound chip. But the three edge
functions and the screen-space depth of a triangle are *affine in pixel
coordinates*, so rasterization factors into: (1) a per-triangle coefficient
build, O(F); (2) a dense triangle-block × pixel-tile sweep evaluating four
affine forms, masking, and min-reducing — VPU work whose [TB, TP] tiles
never leave VMEM; and (3) a winner-indexed color resolve, O(P). This module
implements (2) as a Pallas kernel: triangles ride the sublane dimension,
pixels the lane dimension (so the per-pixel min-reduce is a sublane
reduction landing in a natural [1, TP] row), and the z/winner buffers stay
VMEM-resident across the whole grid as full-array revisited outputs. No
dynamic gathers appear inside the kernel (the Mosaic limitation documented
in docs/PERFORMANCE.md does not apply); the only gathers are the O(P)
winner lookups in XLA.

Semantics are bit-compatible with renderer._rasterize: same inside test
(all screen-space barycentrics ≥ 0, either triangle orientation), same
near-plane cut (z > 1e-6), same linear screen-space depth interpolation,
and the same lowest-index tie-break.

Reference equivalent: pytorch3d's C++/CUDA rasterizer used at
model_manager.py:616-658.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rasterize_pallas", "pallas_raster_supported"]

try:  # pallas import kept soft: CPU-only wheels may lack Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:                                   # pragma: no cover
    _PALLAS_OK = False

_PIX_TILE = 1024       # pixels per grid column (lane dim of the sweep tile)
_TRI_BLOCK = 256       # triangles per grid row (sublane dim)
# tile sweep on the flagship scene (33,737 faces, 256²): (TB, TP) of
# (256, 1024) 14.0 ms · (256, 512) 15.2 · (512, 512) 17.5 · (512, 256)
# 20.6 · (1024, 256) 21.7 — smaller triangle blocks tighten the y-bbox
# cull; wider pixel tiles amortize the per-grid-step overhead
_NEAR = 1e-6
_FAR = 3.4e38          # "no hit" depth (finite float literal: Mosaic-safe)
_COEF_COLS = 16        # 4 affine forms × 3 coefficients, padded to 16


def pallas_raster_supported() -> bool:
    return _PALLAS_OK


def _triangle_coefficients(pts: jnp.ndarray, faces: jnp.ndarray,
                           n_blocks: int) -> jnp.ndarray:
    """[V, 3] projected verts (px, py, z) + [F, 3] faces → [Fp, 16]
    affine coefficients, Fp = n_blocks · _TRI_BLOCK.

    Cols 0-2/3-5/6-8: (A, B, C) of the three *normalized* edge functions
    (b_i(p) = A·px + B·py + C, barycentric after division by signed area);
    cols 9-11: (A, B, C) of depth(p) = Σ b_i·z_i; cols 12-15 zero.
    Degenerate and padding triangles get b0 ≡ -1 so they never rasterize.
    """
    x = pts[faces, 0]                     # [F, 3]
    y = pts[faces, 1]
    z = pts[faces, 2]
    x0, x1, x2 = x[:, 0], x[:, 1], x[:, 2]
    y0, y1, y2 = y[:, 0], y[:, 1], y[:, 2]

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    ok = jnp.abs(area) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, area, 1.0), 0.0)

    # edge function of vertex i is built from the opposite edge (j, k)
    def edge(xj, yj, xk, yk):
        a = -(yk - yj) * inv
        b = (xk - xj) * inv
        c = ((yk - yj) * xj - (xk - xj) * yj) * inv
        return a, b, c

    a0, b0, c0 = edge(x1, y1, x2, y2)
    a1, b1, c1 = edge(x2, y2, x0, y0)
    a2, b2, c2 = edge(x0, y0, x1, y1)
    ad = a0 * z[:, 0] + a1 * z[:, 1] + a2 * z[:, 2]
    bd = b0 * z[:, 0] + b1 * z[:, 1] + b2 * z[:, 2]
    cd = c0 * z[:, 0] + c1 * z[:, 1] + c2 * z[:, 2]

    # degenerate → b0 constant -1: never inside
    a0 = jnp.where(ok, a0, 0.0)
    b0 = jnp.where(ok, b0, 0.0)
    c0 = jnp.where(ok, c0, -1.0)

    coef = jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2, ad, bd, cd],
                     axis=1)                               # [F, 12]
    coef = jnp.concatenate(
        [coef, jnp.zeros((coef.shape[0], _COEF_COLS - 12), coef.dtype)],
        axis=1)
    f_pad = n_blocks * _TRI_BLOCK - coef.shape[0]
    pad_block = jnp.zeros((f_pad, _COEF_COLS), coef.dtype)
    pad_block = pad_block.at[:, 2].set(-1.0)       # padding never inside
    return jnp.concatenate([coef, pad_block], axis=0)


def _sweep_kernel(ymin_ref, ymax_ref, coef_ref, z_ref, idx_ref, *,
                  width: int, pix_tile: int, tri_block: int):
    """One (pixel tile, triangle block) step of the z-buffer sweep.

    coef block: [TB, 16] (triangles × affine coefficients); z/idx outputs
    are full [n_ptiles, TP] arrays resident in VMEM for the whole grid.
    ymin/ymax [n_tblocks] (SMEM): per-triangle-block y-bbox — when it
    misses this pixel tile's rows entirely, skip the sweep (the dominant
    case: a _TRI_BLOCK-triangle block of a registered mesh spans few
    image rows)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        z_ref[pl.ds(i, 1), :] = jnp.full((1, pix_tile), _FAR, jnp.float32)
        idx_ref[pl.ds(i, 1), :] = jnp.full((1, pix_tile), 2147483647,
                                           jnp.int32)

    row_lo = (i * pix_tile) // width                 # first covered row
    row_hi = ((i + 1) * pix_tile - 1) // width + 1
    hit = (ymin_ref[j] <= row_hi.astype(jnp.float32)) & \
        (ymax_ref[j] >= row_lo.astype(jnp.float32))

    @pl.when(hit)
    def _():
        gid = i * pix_tile + jax.lax.broadcasted_iota(
            jnp.int32, (1, pix_tile), 1)
        px = (gid % width).astype(jnp.float32) + 0.5    # [1, TP]
        py = (gid // width).astype(jnp.float32) + 0.5

        c = coef_ref[:]                                 # [TB, 16]

        def affine(k):
            return (c[:, k:k + 1] * px + c[:, k + 1:k + 2] * py
                    + c[:, k + 2:k + 3])                # [TB, TP]

        e0 = affine(0)
        e1 = affine(3)
        e2 = affine(6)
        zv = affine(9)
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (zv > _NEAR)
        depth = jnp.where(inside, zv, _FAR)             # [TB, TP]

        zmin = jnp.min(depth, axis=0, keepdims=True)    # [1, TP]
        tri_ids = j * tri_block + jax.lax.broadcasted_iota(
            jnp.int32, (tri_block, pix_tile), 0)
        winner = jnp.min(jnp.where(depth == zmin, tri_ids,
                                   jnp.int32(2147483647)),
                         axis=0, keepdims=True)         # [1, TP]

        prev = z_ref[pl.ds(i, 1), :]
        better = zmin < prev                # strict: first block wins ties
        z_ref[pl.ds(i, 1), :] = jnp.where(better, zmin, prev)
        idx_ref[pl.ds(i, 1), :] = jnp.where(
            better, winner, idx_ref[pl.ds(i, 1), :])


def _block_y_ranges(tri_y: jnp.ndarray, n_tblocks: int):
    """[F, 3] triangle vertex y pixel coords → per-_TRI_BLOCK-block
    (ymin [n_tblocks], ymax [n_tblocks]). Conservative (wild coords from
    near-plane-clamped projections only widen bboxes); padding blocks get
    an empty range."""
    tymin = tri_y.min(axis=1)
    tymax = tri_y.max(axis=1)
    f_pad = n_tblocks * _TRI_BLOCK - tymin.shape[0]
    tymin = jnp.concatenate([tymin, jnp.full(f_pad, _FAR)])
    tymax = jnp.concatenate([tymax, jnp.full(f_pad, -_FAR)])
    return (tymin.reshape(n_tblocks, _TRI_BLOCK).min(axis=1),
            tymax.reshape(n_tblocks, _TRI_BLOCK).max(axis=1))


@partial(jax.jit, static_argnames=("image_size", "interpret"))
def _zbuffer_sweep(coef: jnp.ndarray, tri_y: jnp.ndarray, image_size: int,
                   interpret: bool = False):
    """[Fp, 16] coefficients + [F, 3] triangle y coords → (zbuf [P],
    winner [P]) via the Pallas kernel; P = image_size²."""
    n_pix = image_size * image_size
    pix_tile = min(_PIX_TILE, n_pix)
    n_ptiles = -(-n_pix // pix_tile)
    n_tblocks = coef.shape[0] // _TRI_BLOCK
    b_ymin, b_ymax = _block_y_ranges(tri_y, n_tblocks)

    kern = partial(_sweep_kernel, width=image_size, pix_tile=pix_tile,
                   tri_block=_TRI_BLOCK)
    zout, iout = pl.pallas_call(
        kern,
        grid=(n_ptiles, n_tblocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((_TRI_BLOCK, _COEF_COLS),
                               lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((n_ptiles, pix_tile), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((n_ptiles, pix_tile), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((n_ptiles, pix_tile), jnp.float32),
            jax.ShapeDtypeStruct((n_ptiles, pix_tile), jnp.int32)],
        interpret=interpret,
    )(b_ymin, b_ymax, coef)
    return zout.reshape(-1)[:n_pix], iout.reshape(-1)[:n_pix]


@partial(jax.jit, static_argnames=("image_size", "interpret"))
def rasterize_pallas(verts_cam, faces, colors, image_size: int = 256,
                     fov_deg: float = 60.0, background: float = 0.0,
                     interpret: bool = False):
    """Drop-in replacement for renderer._rasterize: verts_cam [V, 3]
    (camera frame, -z forward), faces [F, 3], colors [V, 3] →
    [H, W, 3] image."""
    f = 1.0 / jnp.tan(jnp.deg2rad(fov_deg) / 2)
    z = -verts_cam[:, 2]
    x_ndc = f * verts_cam[:, 0] / jnp.maximum(z, _NEAR)
    y_ndc = f * verts_cam[:, 1] / jnp.maximum(z, _NEAR)
    px = (x_ndc * 0.5 + 0.5) * image_size
    py = (0.5 - y_ndc * 0.5) * image_size
    pts = jnp.stack([px, py, z], axis=1)

    n_faces = faces.shape[0]
    n_tblocks = -(-n_faces // _TRI_BLOCK)
    coef = _triangle_coefficients(pts, faces, n_tblocks)

    zbuf, winner = _zbuffer_sweep(coef, pts[faces, 1], image_size,
                                  interpret=interpret)
    miss = zbuf >= _FAR

    # color resolve: O(P) gathers + the same barycentric blend as the
    # portable path (winner coefficients re-evaluated at the pixel)
    idx = jnp.clip(winner, 0, n_faces - 1)
    cw = coef[idx]                                  # [P, 16]
    pid = jnp.arange(image_size * image_size)
    ppx = (pid % image_size).astype(jnp.float32) + 0.5
    ppy = (pid // image_size).astype(jnp.float32) + 0.5

    def baries(k):
        return ppx * cw[:, k] + ppy * cw[:, k + 1] + cw[:, k + 2]

    b0, b1, b2 = baries(0), baries(3), baries(6)
    tri = faces[idx]                                # [P, 3]
    rgb = (b0[:, None] * colors[tri[:, 0]]
           + b1[:, None] * colors[tri[:, 1]]
           + b2[:, None] * colors[tri[:, 2]])
    rgb = jnp.where(miss[:, None], background, rgb)
    return rgb.reshape(image_size, image_size, 3)
