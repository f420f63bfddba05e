"""Cached geometry precomputation (transforms + spirals).

Analog of the reference's lazy pickle caches (model_manager.py:176-230):
the pooling hierarchy and spiral tables are computed once per template and
cached. Cache format is a single .npz of flat numpy arrays (no pickled
objects — robust across versions and loadable from any framework).

Also provides importers for the reference's own transforms.pkl/spirals.pkl
(requires torch; a shim stands in for torch_geometric) so users migrating
from the PyTorch implementation can reuse their precomputed artifacts
bit-for-bit.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .mesh_io import MeshData
from .simplify import SparseCOO, simplification_hierarchy
from .spirals import extract_spirals
from .template import Template, template_from_mesh

__all__ = ["GeometryBundle", "precompute_geometry", "load_or_compute_geometry",
           "import_reference_transforms", "import_reference_spirals"]


@dataclass
class GeometryBundle:
    """Everything the model needs about the template hierarchy, as static
    numpy arrays ready to become device constants."""
    template: Template
    low_res_templates: list          # list[Template]
    down_transforms: list            # list[SparseCOO], level l: [N_{l+1}, N_l]
    up_transforms: list              # list[SparseCOO], level l: [N_l, N_{l+1}]
    spirals: list                    # list[np.ndarray [N_l, L]]

    @property
    def vertex_counts(self) -> list:
        return [self.template.num_vertices] + \
            [t.num_vertices for t in self.low_res_templates]


def precompute_geometry(template: Template, sampling_factors,
                        spiral_lengths, spiral_dilations,
                        region_weighted: bool = False) -> GeometryBundle:
    low_res, downs, ups = simplification_hierarchy(
        template, sampling_factors, region_weighted=region_weighted)
    meshes = [template] + low_res
    spirals = [
        extract_spirals(meshes[i].face, meshes[i].pos,
                        spiral_lengths[i], spiral_dilations[i])
        for i in range(len(meshes) - 1)
    ]
    return GeometryBundle(template=template, low_res_templates=low_res,
                          down_transforms=downs, up_transforms=ups,
                          spirals=spirals)


def _save_bundle(path: str, bundle: GeometryBundle) -> None:
    arrays = {"n_levels": np.asarray(len(bundle.down_transforms))}
    for l, t in enumerate(bundle.low_res_templates):
        arrays[f"lr{l}_pos"] = t.pos
        arrays[f"lr{l}_face"] = t.face
        if t.colors is not None:
            arrays[f"lr{l}_colors"] = t.colors
    for l, (d, u, s) in enumerate(zip(bundle.down_transforms,
                                      bundle.up_transforms, bundle.spirals)):
        for name, m in (("down", d), ("up", u)):
            arrays[f"{name}{l}_rows"] = m.rows
            arrays[f"{name}{l}_cols"] = m.cols
            arrays[f"{name}{l}_vals"] = m.vals
            arrays[f"{name}{l}_shape"] = np.asarray(m.shape)
        arrays[f"spiral{l}"] = s
    np.savez_compressed(path, **arrays)


def _load_bundle(path: str, template: Template) -> GeometryBundle:
    z = np.load(path)
    n_levels = int(z["n_levels"])
    low_res, downs, ups, spirals = [], [], [], []
    for l in range(n_levels):
        colors = z[f"lr{l}_colors"] if f"lr{l}_colors" in z else None
        low_res.append(template_from_mesh(
            MeshData(vertices=z[f"lr{l}_pos"], faces=z[f"lr{l}_face"],
                     vertex_colors=colors),
            with_regions=colors is not None))
        downs.append(SparseCOO(z[f"down{l}_rows"], z[f"down{l}_cols"],
                               z[f"down{l}_vals"],
                               tuple(z[f"down{l}_shape"])))
        ups.append(SparseCOO(z[f"up{l}_rows"], z[f"up{l}_cols"],
                             z[f"up{l}_vals"], tuple(z[f"up{l}_shape"])))
        spirals.append(z[f"spiral{l}"])
    return GeometryBundle(template=template, low_res_templates=low_res,
                          down_transforms=downs, up_transforms=ups,
                          spirals=spirals)


def load_or_compute_geometry(storage_dir: str, template: Template,
                             sampling_factors, spiral_lengths,
                             spiral_dilations,
                             region_weighted: bool = False,
                             cache_name: str = "geometry.npz"
                             ) -> GeometryBundle:
    """Lazy cached precompute, like the reference's transforms.pkl/spirals.pkl
    pattern. If the reference's own pickles are present in storage_dir they
    are imported instead (bit-compatible interop path)."""
    os.makedirs(storage_dir, exist_ok=True)
    cache_path = os.path.join(storage_dir, cache_name)
    if os.path.exists(cache_path):
        return _load_bundle(cache_path, template)

    ref_transforms = os.path.join(storage_dir, "transforms.pkl")
    ref_spirals = os.path.join(storage_dir, "spirals.pkl")
    if os.path.exists(ref_transforms) and os.path.exists(ref_spirals):
        low_res, downs, ups = import_reference_transforms(ref_transforms)
        spirals = import_reference_spirals(ref_spirals)
        # the pickles ARE the cache here — do NOT write our npz next to
        # them: storage_dir may be a reference installation (read-only in
        # spirit even when the mount allows writes), and importing the
        # pickles is fast
        return GeometryBundle(template=template,
                              low_res_templates=low_res,
                              down_transforms=downs, up_transforms=ups,
                              spirals=spirals)
    bundle = precompute_geometry(template, sampling_factors,
                                 spiral_lengths, spiral_dilations,
                                 region_weighted=region_weighted)
    _save_bundle(cache_path, bundle)
    return bundle


def _install_torch_geometric_shim():
    """Allow unpickling the reference's torch_geometric Data objects without
    torch_geometric installed."""
    import sys
    import types

    if "torch_geometric" in sys.modules:
        return

    class Data:
        def __init__(self, **kwargs):
            self.__dict__.update(kwargs)

    tg = types.ModuleType("torch_geometric")
    tgd = types.ModuleType("torch_geometric.data")
    tgdd = types.ModuleType("torch_geometric.data.data")
    tgd.Data = Data
    tgdd.Data = Data
    tg.data = tgd
    tgd.data = tgdd
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.data"] = tgd
    sys.modules["torch_geometric.data.data"] = tgdd


def _torch_sparse_to_coo(t) -> SparseCOO:
    t = t.coalesce()
    idx = t.indices().numpy()
    return SparseCOO(rows=idx[0].astype(np.int32),
                     cols=idx[1].astype(np.int32),
                     vals=t.values().numpy().astype(np.float32),
                     shape=tuple(t.shape))


def import_reference_transforms(path: str):
    """Read the reference's transforms.pkl → (templates, downs, ups)."""
    import pickle

    _install_torch_geometric_shim()
    with open(path, "rb") as f:
        low_res, downs, ups = pickle.load(f)
    templates = []
    for t in low_res:
        colors = getattr(t, "colors", None)
        colors_np = colors.numpy().astype(np.uint8) \
            if colors is not None else None
        templates.append(template_from_mesh(
            MeshData(vertices=t.pos.numpy().astype(np.float64),
                     faces=t.face.numpy().T.astype(np.int64),
                     vertex_colors=colors_np),
            with_regions=colors_np is not None))
    return (templates,
            [_torch_sparse_to_coo(d) for d in downs],
            [_torch_sparse_to_coo(u) for u in ups])


def import_reference_spirals(path: str) -> list:
    """Read the reference's spirals.pkl → list of [N_l, L] int arrays."""
    import pickle

    _install_torch_geometric_shim()
    with open(path, "rb") as f:
        spirals = pickle.load(f)
    return [s.numpy().astype(np.int64) for s in spirals]
