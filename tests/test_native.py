"""Native C++ geometry engine vs the pure-Python reference implementations."""

import numpy as np
import pytest

from craniofacialsd_vae_tpu.geometry.native import build_library, is_available


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not is_available():
        if not build_library():
            pytest.skip("native toolchain unavailable")


@pytest.fixture(scope="module")
def sphere():
    from craniofacialsd_vae_tpu.geometry.synthetic import octasphere
    return octasphere(3)


def test_spirals_bit_identical(sphere):
    from craniofacialsd_vae_tpu.geometry.native import extract_spirals_native
    from craniofacialsd_vae_tpu.geometry.spirals import extract_spirals

    verts, faces = sphere
    py = extract_spirals(faces, verts, 9, 1, use_native="off")
    cc = extract_spirals_native(faces, verts, 9, 1)
    np.testing.assert_array_equal(py, cc)


def test_spirals_dilation(sphere):
    from craniofacialsd_vae_tpu.geometry.native import extract_spirals_native
    from craniofacialsd_vae_tpu.geometry.spirals import extract_spirals

    verts, faces = sphere
    py = extract_spirals(faces, verts, 5, 2, use_native="off")
    cc = extract_spirals_native(faces, verts, 5, 2)
    np.testing.assert_array_equal(py, cc)


def test_qem_equivalent(sphere):
    from craniofacialsd_vae_tpu.geometry.native import qem_simplify_native
    from craniofacialsd_vae_tpu.geometry.simplify import simplify_mesh
    from craniofacialsd_vae_tpu.geometry.template import unique_edges

    verts, faces = sphere
    # break the octasphere's symmetry — on perfectly symmetric meshes the
    # collapse order is all ties and any fp difference reshuffles it
    rng = np.random.default_rng(5)
    verts = verts * (1.0 + 0.1 * rng.random((len(verts), 1)))
    edges = unique_edges(faces)
    f_n, d_n = qem_simplify_native(verts, faces, edges, 2.0)
    f_p, d_p = simplify_mesh(verts, faces, edges, 2.0)
    assert d_n.shape == d_p.shape
    # cross-product vs SVD plane quadrics may flip rare fp ties
    overlap = len(np.intersect1d(d_n.cols, d_p.cols)) / len(d_p.cols)
    assert overlap > 0.98
    assert f_n.min() >= 0 and f_n.max() < d_n.shape[0]


def test_closest_faces_exact(sphere):
    from craniofacialsd_vae_tpu.geometry.native import closest_faces_native
    from craniofacialsd_vae_tpu.geometry.simplify import (
        _point_triangle_closest)

    verts, faces = sphere
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    tri = verts[faces]
    d2 = _point_triangle_closest(pts, tri)
    ref = np.argmin(d2, axis=1)
    out = closest_faces_native(pts, tri)
    # compare achieved distances (ties may pick different argmin)
    np.testing.assert_allclose(d2[np.arange(50), out],
                               d2[np.arange(50), ref], rtol=1e-9)
