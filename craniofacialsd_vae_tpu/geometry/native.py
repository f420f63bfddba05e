"""ctypes bindings for the native geometry engine (native/geometry_kernels.cpp).

The C++ library accelerates the one-time preprocessing (QEM simplification,
spiral extraction, closest-face queries). Pure-Python implementations remain
the reference behavior; the native paths are cross-checked against them in
tests and used automatically when the library is built
(`make -C native`)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["is_available", "qem_simplify_native", "extract_spirals_native",
           "closest_faces_native", "rasterize_native", "build_library"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libgeometry_kernels.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise FileNotFoundError(
            f"{_LIB_PATH} not built — run `make -C native`")
    lib = ctypes.CDLL(_LIB_PATH)
    i64 = ctypes.c_int64
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.qem_simplify.restype = i64
    lib.qem_simplify.argtypes = [p_f64, i64, p_i64, i64, p_i64, i64,
                                 ctypes.c_void_p, i64, ctypes.c_int,
                                 p_i64, p_i64]
    lib.extract_spirals.restype = ctypes.c_int
    lib.extract_spirals.argtypes = [p_i64, i64, i64, p_f64, i64, i64, p_i64]
    lib.closest_faces.restype = None
    lib.closest_faces.argtypes = [p_f64, i64, p_f64, i64, p_i64]
    # rasterize was added in round 5 — an older built .so may lack it
    if hasattr(lib, "rasterize"):
        lib.rasterize.restype = None
        lib.rasterize.argtypes = [p_f64, i64, p_i64, i64, p_f64, i64,
                                  ctypes.c_double, p_f64]
    _lib = lib
    return lib


def build_library() -> bool:
    """Compile the native library in place (uses make)."""
    import subprocess

    native_dir = os.path.dirname(_LIB_PATH)
    result = subprocess.run(["make", "-C", native_dir],
                            capture_output=True, text=True)
    if result.returncode != 0:
        print(result.stdout, result.stderr)
        return False
    return True


def is_available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


def qem_simplify_native(pos, faces, edges, sampling_factor,
                        region_weights=None, edge_length_weighted=False):
    """Native QEM collapse; same return contract as simplify.simplify_mesh:
    (new_faces reindexed, down SparseCOO)."""
    import math

    from .simplify import SparseCOO

    lib = _load()
    pos = np.ascontiguousarray(pos, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    edges = np.ascontiguousarray(edges, np.int64)
    n = len(pos)
    target = math.ceil(n / sampling_factor)
    out_faces = np.empty_like(faces)
    roots = np.empty(n, np.int64)
    rw_ptr = None
    if region_weights is not None:
        region_weights = np.ascontiguousarray(region_weights, np.float64)
        rw_ptr = region_weights.ctypes.data_as(ctypes.c_void_p)
    kept_faces = lib.qem_simplify(
        pos, n, faces, len(faces), edges, len(edges), rw_ptr, target,
        int(edge_length_weighted), out_faces, roots)
    collapsed = out_faces[:kept_faces]
    verts_kept = np.unique(collapsed)
    remap = np.zeros(n, np.int64)
    remap[verts_kept] = np.arange(len(verts_kept))
    new_faces = remap[collapsed]
    down = SparseCOO(rows=np.arange(len(verts_kept), dtype=np.int32),
                     cols=verts_kept.astype(np.int32),
                     vals=np.ones(len(verts_kept), np.float32),
                     shape=(len(verts_kept), n))
    return new_faces, down


def extract_spirals_native(faces, vertices, seq_length, dilation=1):
    lib = _load()
    faces = np.ascontiguousarray(faces, np.int64)
    vertices = np.ascontiguousarray(vertices, np.float64)
    n = len(vertices)
    out = np.empty((n, seq_length), np.int64)
    rc = lib.extract_spirals(faces, len(faces), n, vertices,
                             seq_length, dilation, out)
    if rc != 0:
        raise RuntimeError("extract_spirals failed")
    return out


def closest_faces_native(points, tri_verts):
    lib = _load()
    points = np.ascontiguousarray(points, np.float64)
    tri = np.ascontiguousarray(tri_verts, np.float64)
    out = np.empty(len(points), np.int64)
    lib.closest_faces(points, len(points), tri, len(tri), out)
    return out


def rasterize_available() -> bool:
    """True when the built library carries the round-5 rasterize entry
    (an older .so may predate it)."""
    try:
        return hasattr(_load(), "rasterize")
    except (FileNotFoundError, OSError):
        return False


def rasterize_native(pts, faces, colors, image_size: int,
                     background: float = 0.0) -> np.ndarray:
    """Scanline z-buffer rasterization on the host — same semantics as
    viz/renderer.py::_rasterize (pixel centers at +0.5, inside = all
    barycentrics >= 0, nearest positive depth wins) at ~Σ-triangle-bbox
    cost instead of all-pixels × all-triangles. ``pts`` [V,3] is
    screen-space (px, py, depth); returns [S, S, 3] float32 in the same
    layout as the XLA path."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    colors = np.ascontiguousarray(colors, np.float64)
    out = np.empty((image_size, image_size, 3), np.float64)
    lib.rasterize(pts, len(pts), faces, len(faces), colors,
                  image_size, float(background), out)
    return out.astype(np.float32)
