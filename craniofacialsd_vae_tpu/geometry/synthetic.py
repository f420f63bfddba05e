"""Synthetic colored templates for tests, dry runs, and demos without the
clinical dataset: a subdivided octahedron sphere whose vertices are colored
by octant with real region colors, so the full pipeline — region extraction,
region-weighted QEM, swap augmentation, per-region classifiers — runs
end-to-end on machines that have no mesh data at all."""

from __future__ import annotations

import numpy as np

from .mesh_io import MeshData
from .template import COLOUR2ATTRIBUTE, Template, template_from_mesh

__all__ = ["octasphere", "synthetic_template"]


def octasphere(subdivisions: int = 2):
    """(vertices [N,3], faces [F,3]) unit sphere from octahedron midpoint
    subdivision."""
    verts = [np.array(v, dtype=np.float64) for v in
             [[1, 0, 0], [-1, 0, 0], [0, 1, 0],
              [0, -1, 0], [0, 0, 1], [0, 0, -1]]]
    faces = [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
             [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]

    for _ in range(subdivisions):
        edge_mid = {}

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (verts[a] + verts[b]) / 2
                m /= np.linalg.norm(m)
                edge_mid[key] = len(verts)
                verts.append(m)
            return edge_mid[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c],
                          [ab, bc, ca]]
        faces = new_faces
    return np.asarray(verts), np.asarray(faces, dtype=np.int64)


def synthetic_template(subdivisions: int = 2,
                       n_regions: int = 5) -> Template:
    """A colored octasphere Template with n_regions region colors drawn from
    the real anatomical palette, partitioned by z-slabs (guaranteeing each
    region is a connected band with ≥3 interior vertices)."""
    verts, faces = octasphere(subdivisions)
    palette = [np.array([int(t) for t in key.strip("[]").split()],
                        dtype=np.uint8)
               for key in list(COLOUR2ATTRIBUTE.keys())[:n_regions]]
    z = verts[:, 2]
    # slab boundaries at quantiles so regions are balanced
    qs = np.quantile(z, np.linspace(0, 1, n_regions + 1)[1:-1])
    region = np.searchsorted(qs, z)
    colors = np.stack([palette[r] for r in region])
    return template_from_mesh(
        MeshData(vertices=verts, faces=faces, vertex_colors=colors))
