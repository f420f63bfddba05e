"""Mesh pooling operators (vertex-major).

The reference pools with torch_scatter-backed sparse matmuls
(model.py:50-55). On TPU the two cases have exact, cheaper forms:

  * down-sampling matrices are pure row selections (1 nnz per row, value 1,
    verified against the reference transforms) → a single row gather;
  * up-sampling matrices have exactly 3 nnz per row (barycentric)
    → padded gather + weighted sum (ELL matmul).

Both carry precomputed transposes so forward AND backward are static
gathers (no XLA scatter anywhere in the train step). Activations are
vertex-major [N, B, C]: gathered rows are contiguous B·C-float vectors,
~3× faster on v5e than batch-major gathers.
"""

from __future__ import annotations

import numpy as np

from .sparse import (GatherRows, PaddedRowSparse, from_coo,
                     gather_op_from_idx, gather_rows, ell_matmul)

__all__ = ["pool", "selection_indices", "build_pool_operator"]


def selection_indices(coo) -> np.ndarray | None:
    """If the COO matrix is a pure selection (1 nnz/row, all values 1),
    return the [M] source indices, else None."""
    rows = np.asarray(coo.rows)
    vals = np.asarray(coo.vals)
    m = coo.shape[0]
    if len(rows) == m and np.array_equal(np.sort(rows), np.arange(m)) \
            and np.allclose(vals, 1.0):
        order = np.argsort(rows)
        return np.asarray(coo.cols)[order].astype(np.int32)
    return None


def build_pool_operator(coo):
    """Host-side: choose the cheapest static representation of a pooling
    matrix: GatherRows (selection) or PaddedRowSparse (general)."""
    sel = selection_indices(coo)
    if sel is not None:
        return gather_op_from_idx(sel, coo.shape[1])
    return from_coo(coo.rows, coo.cols, coo.vals, coo.shape)


def pool(x, operator):
    """Apply a pooling operator to vertex-major [N, ...] features."""
    if isinstance(operator, GatherRows):
        return gather_rows(operator, x)
    return ell_matmul(operator, x)
