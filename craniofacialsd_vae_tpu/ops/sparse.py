"""Static sparse formats for TPU.

Generic COO/CSR sparse algebra maps poorly onto XLA (dynamic nnz, dynamic
shapes). Every sparse operator in this framework — pooling selection
matrices, barycentric up-samplers, graph Laplacians — has *fixed* structure
known at trace time and a small bounded number of nonzeros per row. We use a
padded row-sparse ("ELL") layout: dense [M, K] index and value arrays,
K = max nnz/row, padded entries pointing at row 0 with weight 0.

Two TPU-specific design decisions, both measured on v5e:

  * **Vertex-major operands.** All operators contract over axis 0 of
    [N, B, C] activations, so each gathered row is a contiguous B·C-float
    vector (KBs, not bytes) — ~3× faster than gathering thin rows from
    batch-major [B, N, C] layouts.
  * **No scatters, ever.** Each operator carries its precomputed transpose;
    a custom VJP turns the backward pass into another static gather.
    XLA's native scatter lowering for the gather transpose is 3-10× slower.

This replaces torch_scatter.scatter_add / torch.sparse.mm in the reference
(model.py:50-55, utils.py:153-165).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PaddedRowSparse", "GatherRows", "from_coo", "gather_op_from_idx",
           "transpose_coo", "ell_matmul", "ell_matmul_raw", "gather_rows"]


@jax.tree_util.register_pytree_node_class
@dataclass
class PaddedRowSparse:
    """ELL-format sparse matrix with its transpose:
    out[m] = Σ_k vals[m, k] · x[cols[m, k]]."""
    cols: jnp.ndarray          # [M, K] int32
    vals: jnp.ndarray          # [M, K] float32
    n_cols: int                # logical source dimension
    t_cols: jnp.ndarray = None   # [n_cols, K'] transpose structure
    t_vals: jnp.ndarray = None

    @property
    def shape(self):
        return (self.cols.shape[0], self.n_cols)

    def tree_flatten(self):
        return (self.cols, self.vals, self.t_cols, self.t_vals), \
            (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2],
                   children[3])


def _pad_rows(rows, cols, vals, m):
    counts = np.bincount(rows, minlength=m)
    k = max(int(counts.max()) if len(counts) else 1, 1)
    pad_cols = np.zeros((m, k), dtype=np.int32)
    pad_vals = np.zeros((m, k), dtype=np.float32)
    slot = np.zeros(m, dtype=np.int64)
    order = np.argsort(rows, kind="stable")
    for r, c, v in zip(rows[order], cols[order], vals[order]):
        pad_cols[r, slot[r]] = c
        pad_vals[r, slot[r]] = v
        slot[r] += 1
    return pad_cols, pad_vals


def from_coo(rows, cols, vals, shape, with_transpose: bool = True
             ) -> PaddedRowSparse:
    """Convert COO arrays (host-side numpy) to padded layout, including the
    transpose structure used by the gather-only backward pass."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    m, n = shape
    pad_cols, pad_vals = _pad_rows(rows, cols, vals, m)
    t_cols = t_vals = None
    if with_transpose:
        t_cols, t_vals = _pad_rows(cols, rows, vals, n)
    return PaddedRowSparse(
        cols=jnp.asarray(pad_cols), vals=jnp.asarray(pad_vals), n_cols=n,
        t_cols=None if t_cols is None else jnp.asarray(t_cols),
        t_vals=None if t_vals is None else jnp.asarray(t_vals))


def transpose_coo(coo):
    """Transposed SparseCOO view (host-side)."""
    from ..geometry.simplify import SparseCOO

    return SparseCOO(rows=coo.cols, cols=coo.rows, vals=coo.vals,
                     shape=(coo.shape[1], coo.shape[0]))


def ell_matmul_raw(cols: jnp.ndarray, vals: jnp.ndarray,
                   x: jnp.ndarray) -> jnp.ndarray:
    """out[m] = Σ_k vals[m,k] · x[cols[m,k]] for vertex-major x [N, ...].

    Trailing dims are flattened to one packed minor axis around the gather:
    XLA pads the minor dimension to 128 lanes, so gathering [N, B, C] rows
    with C < 128 moves up to 4× phantom bytes (measured 3× slower than the
    packed [N, B·C] form on v5e)."""
    m, k = cols.shape
    trailing = x.shape[1:]
    x2 = x.reshape(x.shape[0], -1)
    g = jnp.take(x2, cols.reshape(-1), axis=0)          # [M*K, BC]
    g = g.reshape(m, k, x2.shape[1])
    out = jnp.einsum("mkc,mk->mc", g, vals.astype(x.dtype))
    return out.reshape(m, *trailing)


@jax.custom_vjp
def ell_matmul(mat: PaddedRowSparse, x: jnp.ndarray) -> jnp.ndarray:
    """Sparse @ dense over axis 0: x [N, ...] → [M, ...].

    custom VJP: dx = matᵀ @ dy via the precomputed transpose — a static
    gather, never an XLA scatter.
    """
    return ell_matmul_raw(mat.cols, mat.vals, x)


def _ell_fwd(mat, x):
    return ell_matmul_raw(mat.cols, mat.vals, x), mat


def _ell_bwd(mat, dy):
    if mat.t_cols is None:
        raise ValueError("ell_matmul backward requires transpose structure "
                         "(from_coo(with_transpose=True))")
    dx = ell_matmul_raw(mat.t_cols, mat.t_vals, dy)
    return None, dx


ell_matmul.defvjp(_ell_fwd, _ell_bwd)


@jax.tree_util.register_pytree_node_class
@dataclass
class GatherRows:
    """Pure row-gather operator out = x[idx] with precomputed transpose so
    the backward pass is a masked gather-sum instead of an XLA scatter."""
    idx: jnp.ndarray        # [M] int32
    t_cols: jnp.ndarray     # [N, K] int32 — positions in idx hitting row n
    t_vals: jnp.ndarray     # [N, K] float32 {0,1} mask
    n_rows: int             # N (source dimension)

    @property
    def shape(self):
        return (self.idx.shape[0], self.n_rows)

    def tree_flatten(self):
        return (self.idx, self.t_cols, self.t_vals), (self.n_rows,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])


def gather_op_from_idx(idx: np.ndarray, n_rows: int) -> GatherRows:
    """Host-side: build a GatherRows op (and its transpose) from indices."""
    idx = np.asarray(idx, dtype=np.int64)
    m = len(idx)
    t_cols, t_vals = _pad_rows(idx, np.arange(m), np.ones(m), n_rows)
    return GatherRows(idx=jnp.asarray(idx.astype(np.int32)),
                      t_cols=jnp.asarray(t_cols),
                      t_vals=jnp.asarray(t_vals), n_rows=n_rows)


def _take_rows_packed(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather on the lane-packed 2D view (see ell_matmul_raw)."""
    trailing = x.shape[1:]
    g = jnp.take(x.reshape(x.shape[0], -1), idx, axis=0)
    return g.reshape(idx.shape[0], *trailing)


@jax.custom_vjp
def gather_rows(op: GatherRows, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, ...] → x[idx] [M, ...] with gather-only backward."""
    return _take_rows_packed(x, op.idx)


def _gather_rows_fwd(op, x):
    return _take_rows_packed(x, op.idx), op


def _gather_rows_bwd(op, dy):
    return None, ell_matmul_raw(op.t_cols, op.t_vals, dy)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
