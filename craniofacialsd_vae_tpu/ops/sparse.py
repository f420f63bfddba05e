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
    """ELL-format sparse matrix with its (capped) transpose:
    out[m] = Σ_k vals[m, k] · x[cols[m, k]]."""
    cols: jnp.ndarray          # [M, K] int32
    vals: jnp.ndarray          # [M, K] float32
    n_cols: int                # logical source dimension
    transpose: "CappedEll | None" = None

    @property
    def shape(self):
        return (self.cols.shape[0], self.n_cols)

    def tree_flatten(self):
        return (self.cols, self.vals, self.transpose), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2])


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


@jax.tree_util.register_pytree_node_class
@dataclass
class CappedEll:
    """ELL matrix with the per-row nnz capped; the tail of high-degree rows
    lives in small secondary ELL tiers applied with sparse row updates.

    Real mesh transposes have skewed in-degrees (the craniofacial
    up-transform transpose: mean 10, max 92; the conv combined transpose:
    mean 8, max 15) — a plain ELL pads every row to the max and the padded
    entries are *gathered* like real ones, so padding is pure row-traffic
    waste in a gather-rate-bound step (docs/PERFORMANCE.md "Roofline
    accounting"). The cap K is chosen per table by minimizing
    modeled gathered rows: main M·K plus each overflow tier's padded rows
    plus a scatter penalty per overflow row (the tier lands with an R-row
    scatter-add, measured ~4× a gathered row). Tiers recurse over the
    still-overflowing tail (≤3 deep). On the craniofacial template this
    cuts combined-transpose traffic ~1.5× vs the previous 2×-mean cap
    (level-0 conv table K 15→9) and up-transpose traffic ~1.3×."""
    cols: jnp.ndarray            # [M, K_cap]
    vals: jnp.ndarray
    tiers: tuple = ()            # ((o_rows [R], o_cols [R, K_t], o_vals),…)

    def tree_flatten(self):
        return (self.cols, self.vals, self.tiers), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ell_matmul_raw(self.cols, self.vals, x)
        for o_rows, o_cols, o_vals in self.tiers:
            out = out.at[o_rows].add(ell_matmul_raw(o_cols, o_vals, x))
        return out


_SCATTER_PENALTY_ROWS = 4        # one scattered row ≈ 4 gathered rows


def _optimal_cap(counts: np.ndarray, m: int, k_max: int) -> int:
    """K minimizing modeled gathered-row traffic: m·K main rows plus a
    single-tier overflow model (R rows padded to k_max−K, each landing via
    scatter-add). The recursion in capped_ell only shrinks the overflow
    term, so this K is near-optimal for the tiered layout too."""
    best_cost, best_k = m * k_max, k_max
    for k in range(1, k_max):
        r = int((counts > k).sum())
        cost = m * k + r * (k_max - k + _SCATTER_PENALTY_ROWS)
        if cost < best_cost:
            best_cost, best_k = cost, k
    return best_k


def capped_ell(rows, cols, vals, m, max_tiers: int = 3) -> CappedEll:
    """Host-side: COO → CappedEll with traffic-optimal cap + overflow
    tiers (see CappedEll docstring for the cost model)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=m)
    if len(rows) == 0:
        pc, pv = _pad_rows(rows, cols, vals, m)
        return CappedEll(jnp.asarray(pc), jnp.asarray(pv), ())
    # ordinal of each entry within its (sorted) row
    start = np.cumsum(counts) - counts
    rank = np.arange(len(rows)) - start[rows]

    k_max = int(counts.max())
    k = _optimal_cap(counts, m, k_max)
    main = rank < k
    pc, pv = _pad_rows(rows[main], cols[main], vals[main], m)

    tiers = []
    rem = ~main
    rem_rows, rem_cols = rows[rem], cols[rem]
    rem_vals, rem_rank = vals[rem], rank[rem] - k
    while len(rem_rows):
        u, inv = np.unique(rem_rows, return_inverse=True)
        t_counts = np.bincount(inv)
        t_kmax = int(t_counts.max())
        tk = (_optimal_cap(t_counts, len(u), t_kmax)
              if len(tiers) < max_tiers - 1 else t_kmax)
        tm = rem_rank < tk
        # every overflow row has ≥1 entry in the current tier (its
        # remaining rank restarts at 0), so the tier has no empty rows
        tc, tv = _pad_rows(inv[tm], rem_cols[tm], rem_vals[tm], len(u))
        tiers.append((jnp.asarray(u.astype(np.int32)),
                      jnp.asarray(tc), jnp.asarray(tv)))
        keep = ~tm
        rem_rows, rem_cols = rem_rows[keep], rem_cols[keep]
        rem_vals, rem_rank = rem_vals[keep], rem_rank[keep] - tk
    return CappedEll(jnp.asarray(pc), jnp.asarray(pv), tuple(tiers))


def from_coo(rows, cols, vals, shape, with_transpose: bool = True
             ) -> PaddedRowSparse:
    """Convert COO arrays (host-side numpy) to padded layout, including the
    capped transpose structure used by the gather-only backward pass."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    m, n = shape
    pad_cols, pad_vals = _pad_rows(rows, cols, vals, m)
    transpose = capped_ell(cols, rows, vals, n) if with_transpose else None
    return PaddedRowSparse(
        cols=jnp.asarray(pad_cols), vals=jnp.asarray(pad_vals), n_cols=n,
        transpose=transpose)


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
    if mat.transpose is None:
        raise ValueError("ell_matmul backward requires transpose structure "
                         "(from_coo(with_transpose=True))")
    return None, mat.transpose.apply(dy)


ell_matmul.defvjp(_ell_fwd, _ell_bwd)


@jax.tree_util.register_pytree_node_class
@dataclass
class GatherRows:
    """Pure row-gather operator out = x[idx] with precomputed (capped)
    transpose so the backward pass is a masked gather-sum instead of an
    XLA scatter."""
    idx: jnp.ndarray            # [M] int32
    transpose: CappedEll        # over the source row space
    n_rows: int                 # N (source dimension)

    @property
    def shape(self):
        return (self.idx.shape[0], self.n_rows)

    def tree_flatten(self):
        return (self.idx, self.transpose), (self.n_rows,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


def gather_op_from_idx(idx: np.ndarray, n_rows: int) -> GatherRows:
    """Host-side: build a GatherRows op (and its transpose) from indices."""
    idx = np.asarray(idx, dtype=np.int64)
    m = len(idx)
    transpose = capped_ell(idx, np.arange(m), np.ones(m), n_rows)
    return GatherRows(idx=jnp.asarray(idx.astype(np.int32)),
                      transpose=transpose, n_rows=n_rows)


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
    return None, op.transpose.apply(dy)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
