"""Vertex reordering of a geometry hierarchy for gather locality.

The train step is bound by HBM row-gather throughput (docs/
PERFORMANCE.md), and the template's native vertex numbering is the one
locality lever the ops cannot control: spiral neighbourhoods that are
near-contiguous in memory turn scattered row reads into near-streaming
ones. Reverse Cuthill-McKee on the mesh adjacency minimizes index
bandwidth (measured on the flagship level-0 spiral table: mean
|index − row| 337 → 194, and 1.13-1.26× on isolated wide-bf16 row
gathers — benchmarks/reorder_ab.py).

``permute_bundle`` relabels every level of a GeometryBundle with
per-level permutations — spirals, down/up transforms, faces, colors,
region structure all follow, so the model's math is IDENTICAL up to the
relabeling (tests/test_reorder.py pins forward equivalence). The
COARSEST level keeps its native order: the encoder flattens it into the
latent Linear, so permuting it would re-wire the latent layout (and it
is far too small for gather locality to matter).

Boundary contract: activations entering the model must be permuted with
``perm[0]`` (x_new = x[perm0]) and outputs inverse-permuted — callers
that adopt a reordered bundle own that IO relabeling.
"""

from __future__ import annotations

import numpy as np

from .precompute import GeometryBundle
from .simplify import SparseCOO
from .template import Template, template_from_mesh

__all__ = ["rcm_order", "hierarchy_rcm_permutations", "permute_bundle"]


def rcm_order(n_verts: int, edges: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee order of the undirected mesh adjacency:
    ``perm[new_index] = old_index``."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    adj = sp.coo_matrix((np.ones(len(src), np.int8), (src, dst)),
                        shape=(n_verts, n_verts)).tocsr()
    return np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True),
                      dtype=np.int64)


def hierarchy_rcm_permutations(bundle: GeometryBundle) -> list:
    """One permutation per hierarchy level (finest first). The coarsest
    level gets the identity (see module docstring)."""
    meshes = [bundle.template] + list(bundle.low_res_templates)
    perms = [rcm_order(m.num_vertices, np.asarray(m.edges))
             for m in meshes[:-1]]
    perms.append(np.arange(meshes[-1].num_vertices, dtype=np.int64))
    return perms


def _permute_template(tpl: Template, perm: np.ndarray,
                      inv: np.ndarray) -> Template:
    from .mesh_io import MeshData

    colors = None if tpl.colors is None else np.asarray(tpl.colors)[perm]
    return template_from_mesh(
        MeshData(vertices=np.asarray(tpl.pos)[perm],
                 faces=inv[np.asarray(tpl.face)],
                 vertex_colors=colors),
        with_regions=colors is not None)


def permute_bundle(bundle: GeometryBundle, perms: list) -> GeometryBundle:
    """Relabel every level: row ``new_i`` of level ``l`` is old vertex
    ``perms[l][new_i]``. Transforms between levels map both index
    spaces; spiral tables are gathered by the new row order and their
    entries renumbered."""
    meshes = [bundle.template] + list(bundle.low_res_templates)
    assert len(perms) == len(meshes), (len(perms), len(meshes))
    invs = []
    for p in perms:
        inv = np.empty_like(p)
        inv[p] = np.arange(len(p))
        invs.append(inv)

    new_meshes = [_permute_template(m, p, i)
                  for m, p, i in zip(meshes, perms, invs)]
    new_spirals = [invs[l][np.asarray(s)[perms[l]]]
                   for l, s in enumerate(bundle.spirals)]

    def remap(coo: SparseCOO, row_inv, col_inv) -> SparseCOO:
        return SparseCOO(row_inv[np.asarray(coo.rows)],
                         col_inv[np.asarray(coo.cols)],
                         np.asarray(coo.vals), coo.shape)

    new_downs = [remap(d, invs[l + 1], invs[l])
                 for l, d in enumerate(bundle.down_transforms)]
    new_ups = [remap(u, invs[l], invs[l + 1])
               for l, u in enumerate(bundle.up_transforms)]
    return GeometryBundle(template=new_meshes[0],
                          low_res_templates=new_meshes[1:],
                          down_transforms=new_downs,
                          up_transforms=new_ups,
                          spirals=new_spirals)
