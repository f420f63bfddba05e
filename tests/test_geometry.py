"""Geometry preprocessing tests: mesh IO, template regions, QEM hierarchy,
spiral extraction — including bit-parity checks against the reference's
precomputed demo_files artifacts."""

import os

import numpy as np
import pytest

from tests.conftest import DEMO_FILES, requires_demo


def test_obj_roundtrip(tmp_path):
    from craniofacialsd_vae_tpu.geometry import read_obj, write_obj

    verts = np.random.default_rng(0).normal(size=(10, 3))
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
    path = str(tmp_path / "m.obj")
    write_obj(path, verts, faces)
    mesh = read_obj(path)
    np.testing.assert_allclose(mesh.vertices, verts, atol=1e-7)
    np.testing.assert_array_equal(mesh.faces, faces)


def test_ply_roundtrip(tmp_path):
    from craniofacialsd_vae_tpu.geometry import read_ply, write_ply

    rng = np.random.default_rng(1)
    verts = rng.normal(size=(8, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    colors = rng.integers(0, 255, size=(8, 4)).astype(np.uint8)
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, faces, colors)
    mesh = read_ply(path)
    np.testing.assert_allclose(mesh.vertices, verts, atol=1e-7)
    np.testing.assert_array_equal(mesh.faces, faces)
    np.testing.assert_array_equal(mesh.vertex_colors, colors)


@requires_demo
def test_template_regions(template):
    # 15 anatomical regions in the reference's dict-insertion order
    # (must match: latent slices + region classifier keys depend on it).
    from craniofacialsd_vae_tpu.geometry.template import COLOUR2ATTRIBUTE

    assert len(template.region_names) == 15
    assert set(template.region_names) == set(COLOUR2ATTRIBUTE.keys())
    expected_first = ["[232 129 166 255]", "[194 109  97 255]",
                      "[133 169 172 255]", "[237 109  93 255]"]
    assert template.region_names[:4] == expected_first
    # every region mask is non-empty and masks are disjoint-ish (island
    # merging can duplicate a handful of vertices)
    masks = template.region_masks()
    assert masks.shape == (15, template.num_vertices)
    assert (masks.sum(axis=1) > 0).all()


@requires_demo
def test_rw_laplacian(template):
    rows, cols, vals = template.laplacian
    n = template.num_vertices
    row_sums = np.zeros(n)
    np.add.at(row_sums, rows, vals)
    np.testing.assert_allclose(row_sums, 0.0, atol=1e-6)
    diag = vals[rows == cols]
    np.testing.assert_allclose(diag, 1.0)


@requires_demo
def test_spiral_bit_parity_with_reference(template):
    """Our pure-Python halfedge walk reproduces the OpenMesh-based reference
    spiral table exactly (demo_files/spirals.pkl, level 0)."""
    from craniofacialsd_vae_tpu.geometry import (extract_spirals,
                                                 import_reference_spirals)

    ref = import_reference_spirals(os.path.join(DEMO_FILES, "spirals.pkl"))
    mine = extract_spirals(template.face, template.pos, 9, 1)
    np.testing.assert_array_equal(mine, ref[0])


@requires_demo
def test_hierarchy_parity_with_reference(geometry_bundle):
    """QEM hierarchy matches the reference transforms.pkl: identical kept
    vertices / faces at all levels; up-transforms functionally equivalent."""
    from craniofacialsd_vae_tpu.geometry import import_reference_transforms

    ref_templates, ref_downs, ref_ups = import_reference_transforms(
        os.path.join(DEMO_FILES, "transforms.pkl"))

    assert geometry_bundle.vertex_counts == [17039, 4260, 1065, 267, 67]
    for l in range(4):
        np.testing.assert_array_equal(
            np.sort(geometry_bundle.down_transforms[l].cols),
            np.sort(ref_downs[l].cols))
        np.testing.assert_array_equal(
            geometry_bundle.low_res_templates[l].face,
            ref_templates[l].face)
        # up rows are barycentric → sum to 1
        row_sums = np.zeros(geometry_bundle.up_transforms[l].shape[0])
        np.add.at(row_sums, geometry_bundle.up_transforms[l].rows,
                  geometry_bundle.up_transforms[l].vals)
        np.testing.assert_allclose(row_sums, 1.0, atol=1e-5)
        # functional equivalence (differs only on closest-face ties)
        coarse = geometry_bundle.low_res_templates[l].pos.astype(np.float64)
        mine = geometry_bundle.up_transforms[l].matmul(coarse)
        ref = ref_ups[l].matmul(coarse)
        assert np.abs(mine - ref).mean() < 1e-3


@requires_demo
def test_spiral_parity_all_levels(geometry_bundle):
    from craniofacialsd_vae_tpu.geometry import import_reference_spirals

    ref = import_reference_spirals(os.path.join(DEMO_FILES, "spirals.pkl"))
    for l in range(4):
        np.testing.assert_array_equal(geometry_bundle.spirals[l], ref[l])


def test_simplify_small_mesh():
    """QEM on a synthetic sphere-ish mesh: right vertex count, valid faces."""
    from craniofacialsd_vae_tpu.geometry import (simplify_mesh,
                                                 upsampling_transform)
    from craniofacialsd_vae_tpu.geometry.template import unique_edges

    # icosphere-like: subdivide an octahedron once
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], dtype=np.float64)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    # midpoint subdivision
    edge_mid = {}
    new_verts = list(verts)

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in edge_mid:
            m = (verts[a] + verts[b]) / 2
            m /= np.linalg.norm(m)
            edge_mid[key] = len(new_verts)
            new_verts.append(m)
        return edge_mid[key]

    new_faces = []
    for a, b, c in faces:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    verts = np.asarray(new_verts)
    faces = np.asarray(new_faces)

    edges = unique_edges(faces)
    new_f, down = simplify_mesh(verts, faces, edges, 2.0)
    assert down.shape[0] <= int(np.ceil(len(verts) / 2.0)) + 2
    assert new_f.min() >= 0 and new_f.max() < down.shape[0]

    coarse = down.matmul(verts)
    up = upsampling_transform(verts, coarse, new_f)
    recon = up.matmul(coarse)
    # upsampled positions approximate the originals
    assert np.abs(recon - verts).mean() < 0.3

    # weighted-cost variants (reference mesh_simplification.py:143-167):
    # collapse cost is MULTIPLIED by the mean vertex weight, so
    # high-weight vertices' edges collapse last — they must survive a
    # 2× simplification — and edge-length weighting must still produce a
    # valid hierarchy
    w = np.full(len(verts), 1.0)
    w[:3] = 1e6                     # expensive to collapse → kept
    new_fw, down_w = simplify_mesh(verts, faces, edges, 2.0,
                                   region_weights=w)
    assert set(range(3)) <= set(down_w.cols.tolist())
    new_fe, down_e = simplify_mesh(verts, faces, edges, 2.0,
                                   edge_length_weighted=True)
    assert new_fe.min() >= 0 and new_fe.max() < down_e.shape[0]


@requires_demo
def test_pickle_backed_storage_dir_is_never_written(template, tmp_path):
    """A storage dir carrying the reference's transforms.pkl/spirals.pkl
    (e.g. a reference installation used as precomputed_storage_path) must
    be treated as read-only: the pickles are imported, and our npz cache
    must NOT be written next to them (regression: demo runs once polluted
    /root/reference/demo_files with geometry.npz)."""
    import shutil

    from craniofacialsd_vae_tpu.geometry import load_or_compute_geometry

    for name in ("transforms.pkl", "spirals.pkl"):
        shutil.copy(os.path.join(DEMO_FILES, name), tmp_path / name)
    before = set(os.listdir(tmp_path))
    bundle = load_or_compute_geometry(str(tmp_path), template,
                                      [4, 4, 4, 4], [9, 9, 9, 9],
                                      [1, 1, 1, 1])
    assert len(bundle.spirals) == 4
    assert set(os.listdir(tmp_path)) == before, "storage dir was written"
