"""Spiral convolution: the core learned op (vertex-major).

For each vertex, features of its precomputed spiral neighborhood (L=9
indices, geometry/spirals.py) are concatenated and pushed through one dense
projection: out[n] = W @ concat_l x[spiral[n, l]] + b — the TPU analog of
the reference's index_select + nn.Linear (model.py:27-41).

TPU lowering (measured on v5e): activations are vertex-major [N, B, C], the
conv decomposes as out = b + Σ_l gather_l(x) @ W_l where each gather_l is a
row gather with a precomputed transpose (gather-only backward, no scatter),
and each W_l is the [C_in, C_out] slice of the packed weight. The [N, L·C]
concatenation is never materialized — the dominant HBM cost of the naive
lowering. Weight layout stays [L·C_in, C_out] row-compatible with the
reference for checkpoint parity.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import GatherRows, gather_op_from_idx, gather_rows

__all__ = ["SpiralOp", "build_spiral_op", "spiral_conv", "init_spiral_conv",
           "spiral_gather", "spiral_conv_out_gather"]


@jax.tree_util.register_pytree_node_class
@dataclass
class SpiralOp:
    """Per-level spiral structure: one GatherRows per spiral position, plus
    a combined transpose over the flat (l, n) index space for the backward.

    The combined table matters: per-position transposes pad to K_l each
    (Σ K_l ≈ 44 rows/vertex on the craniofacial template) while one table
    over all positions pads to the true in-degree (K ≈ 16) — ~2.5× less
    transpose gather traffic.

    Spiral sequences start at the center vertex itself (SpiralNet++
    convention, reference compute_spirals.py:34-61), so for non-composed
    tables position 0 is the identity permutation: its gather entry is
    None, the forward uses x directly, and the backward adds dy·W₀ᵀ
    without a transpose table — one ninth less gather traffic in both
    directions of the largest (full-resolution decoder) convs."""
    gathers: list               # L × (GatherRows | None for identity)
    inv_tables: list            # per column-group: CappedEll over vertices
    group_cols: tuple           # per group: tuple of spiral positions
    identity_cols: tuple        # spiral positions that are the identity
    seq_length: int

    def tree_flatten(self):
        return (self.gathers, self.inv_tables), \
            (self.group_cols, self.identity_cols, self.seq_length)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1], aux[2])

    @property
    def num_vertices(self):
        for g in self.gathers:
            if g is not None:
                return g.idx.shape[0]
        raise ValueError("degenerate spiral op")


def build_spiral_op(spirals: np.ndarray,
                    bwd_group_size: int | None = None,
                    n_src: int | None = None) -> SpiralOp:
    """Host-side: [N, L] spiral table → L gather operators + combined
    transpose tables for the backward.

    bwd_group_size controls the dx-backward chunking: transpose tables are
    built per group of spiral columns, bounding the materialized dy·Wᵀ
    tensor to [group, N, B, C] at the cost of slightly more padded rows
    (per-group in-degrees don't share padding). Default: one group (lowest
    traffic) — pick 3 for very large batch×channel products.
    """
    from .sparse import capped_ell

    spirals = np.asarray(spirals)
    m, l = spirals.shape
    # source vertex space; differs from the row count for composed tables
    # (e.g. conv fused with a down-selection gathers N rows into M < N)
    n = m if n_src is None else n_src
    if bwd_group_size is None:
        bwd_group_size = l

    arange = np.arange(m)
    identity_cols = tuple(
        i for i in range(l)
        if n == m and np.array_equal(spirals[:, i], arange))
    other_cols = [i for i in range(l) if i not in identity_cols]

    inv_tables = []
    group_cols = []
    for s in range(0, len(other_cols), bwd_group_size):
        cols = other_cols[s:s + bwd_group_size]
        # vertex m ← flat positions p = (l_local)·N + n over this group
        targets = spirals[:, cols].T.reshape(-1)
        positions = np.arange(len(cols) * m)
        inv_tables.append(capped_ell(targets, positions,
                                     np.ones(len(cols) * m), n))
        group_cols.append(tuple(cols))
    return SpiralOp(
        gathers=[None if i in identity_cols
                 else gather_op_from_idx(spirals[:, i], n)
                 for i in range(l)],
        inv_tables=inv_tables, group_cols=tuple(group_cols),
        identity_cols=identity_cols, seq_length=l)


def init_spiral_conv(key, in_channels: int, out_channels: int,
                     seq_length: int, dtype=jnp.float32) -> dict:
    """Xavier-uniform weight [L*C_in, C_out], zero bias (reference
    model.py:23-25 init)."""
    fan_in = in_channels * seq_length
    limit = float(np.sqrt(6.0 / (fan_in + out_channels)))
    w = jax.random.uniform(key, (fan_in, out_channels), dtype,
                           minval=-limit, maxval=limit)
    return {"w": w, "b": jnp.zeros((out_channels,), dtype)}


def spiral_gather(x: jnp.ndarray, op: SpiralOp) -> jnp.ndarray:
    """[N, ..., C] → [N, ..., L*C] gathered spiral neighborhoods."""
    return jnp.concatenate(
        [x if g is None else gather_rows(g, x) for g in op.gathers],
        axis=-1)


def spiral_conv(params: dict, x: jnp.ndarray, op: SpiralOp,
                out_dtype=None) -> jnp.ndarray:
    """Vertex-major spiral conv: [N, B, C_in] → [N, B, C_out].

    Computes in x.dtype (params are cast), so bfloat16 activations keep the
    whole gather+matmul chain in half precision. Custom VJP: dx flows
    through the combined transpose table (one K≈16 gather instead of nine
    K_l gathers), dW recomputes the forward gathers.

    out_dtype=float32 with bf16 x returns the fp32 MXU accumulator
    UNROUNDED — for the final decoder conv, whose output feeds the losses
    and mm-scale eval metrics (a trailing bf16 round would quantize every
    reconstructed coordinate at ~2^-8 relative). The backward is
    unchanged: the incoming fp32 cotangent is rounded to bf16 on entry, so
    the dy·Wᵀ materialization and its transpose gathers keep half-width
    rows."""
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    w_l = w.reshape(op.seq_length, x.shape[-1], w.shape[-1])
    if out_dtype == jnp.float32 and x.dtype == jnp.bfloat16:
        return _spiral_conv_core_f32out(w_l, b, x, op)
    return _spiral_conv_core(w_l, b, x, op)


@jax.custom_vjp
def _spiral_conv_core(w_l, b, x, op: SpiralOp):
    if x.dtype == jnp.bfloat16:
        # accumulate the L position products in fp32 (MXU accumulates fp32
        # natively for bf16 operands — one final rounding instead of L, and
        # the trailing cast fuses into the last matmul's epilogue)
        out = b.astype(jnp.float32)
        for i, g in enumerate(op.gathers):
            xi = x if g is None else gather_rows(g, x)
            out = out + jnp.einsum("...c,co->...o", xi, w_l[i],
                                   preferred_element_type=jnp.float32)
        return out.astype(x.dtype)
    out = b
    for i, g in enumerate(op.gathers):
        xi = x if g is None else gather_rows(g, x)
        out = out + xi @ w_l[i]
    return out


def _score_fwd(w_l, b, x, op):
    return _spiral_conv_core(w_l, b, x, op), (w_l, x, op)


def _score_bwd(res, dy):
    w_l, x, op = res
    m = dy.shape[0]
    # dx: scatter of dy @ W_lᵀ over the spiral structure = combined gathers,
    # one per column group (bounds the materialized dg tensor). dg is laid
    # out l-major within each group to match the tables' flat positions.
    # Identity positions skip the table entirely: dx += dy @ W_lᵀ.
    dx = None
    # jnp.take (not w_l[...]): w_l may be a closure-constant Literal (e.g.
    # numpy params resumed from a checkpoint), whose __getitem__ cannot
    # accept a traced index array
    for table, cols in zip(op.inv_tables, op.group_cols):
        dg = jnp.einsum("nbo,lco->lnbc", dy,
                        jnp.take(jnp.asarray(w_l), jnp.asarray(cols),
                                 axis=0))                # [g, M, B, C]
        part = table.apply(dg.reshape(len(cols) * m, *dg.shape[2:]))
        dx = part if dx is None else dx + part
    for i in op.identity_cols:
        part = jnp.einsum("nbo,co->nbc", dy, w_l[i])
        dx = part if dx is None else dx + part
    # dW: recompute the cheap forward gathers instead of saving residuals.
    # For bf16 activations the N·B contraction accumulates in fp32
    # (preferred_element_type); the cotangent is rounded to the primal's
    # dtype once at the end — the fp32 master params see one bf16 rounding,
    # not an accumulated one (the outer param cast restores fp32 leaves).
    bf16 = x.dtype == jnp.bfloat16
    acc = {"preferred_element_type": jnp.float32} if bf16 else {}
    dw_l = jnp.stack([
        jnp.einsum("nbc,nbo->co", x if g is None else gather_rows(g, x), dy,
                   **acc)
        for g in op.gathers])
    if bf16:
        dw_l = dw_l.astype(x.dtype)
        db = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)),
                     dtype=jnp.float32).astype(dy.dtype)
    else:
        db = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)))
    return dw_l, db, dx, None


_spiral_conv_core.defvjp(_score_fwd, _score_bwd)


def spiral_conv_out_gather(params: dict, x: jnp.ndarray,
                           op: SpiralOp) -> jnp.ndarray:
    """Matmul-first ("out-gather") spiral conv: [N, B, C_in] → [N, B, C_out].

    Reassociates the conv as out = b + Σ_l (x @ W_l)[spiral[:, l]]: the
    per-position projections are computed before the gathers, so every
    gathered row has width C_out instead of C_in. The step is gather-ROW-
    throughput-bound (docs/PERFORMANCE.md "Roofline accounting"), so this
    formulation wins exactly when C_out ≪ C_in — the final decoder conv
    (32 → 3 channels, reference model.py:135-136), whose gathers drop from
    the bandwidth-limited G·32 width class to the fast G·3 class in BOTH
    directions: the backward gathers the raw dy cotangent through each
    position's capped transpose instead of materializing the [L, N, B, C_in]
    dy·Wᵀ tensor. For square or widening convs the gather-first form is
    better (its combined transpose table is denser than L per-position
    tables), which is why `spiral_conv` stays the default everywhere else.

    No custom VJP is needed: gather_rows already carries its scatter-free
    capped transpose, and the matmuls differentiate natively (dW = xᵀ·du
    with no gathered operand at all). With bf16 inputs the projection
    accumulates fp32 on the MXU and the output is the UNROUNDED fp32
    accumulator (same contract as spiral_conv(out_dtype=float32)); the
    gathers move fp32 G·C_out rows — at C_out=3 the 48-float fp32 row class
    is also the fastest measured gather class on v5e. A gather never rounds
    values, so the result matches the gather-first bf16 form up to fp32
    summation order. Used only under the bf16/mixed policies so the fp32
    formulation keeps bit-parity with the oracles and the golden fixture.
    """
    w = params["w"]
    b = params["b"]
    c_in = x.shape[-1]
    acc = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    w_l = w.reshape(op.seq_length, c_in, -1).astype(x.dtype)
    # u[l] = x @ W_l for all positions in one MXU matmul, fp32 accumulated;
    # position-major layout so each gather source u[i] is contiguous
    u = jnp.einsum("...c,lco->l...o", x, w_l, preferred_element_type=acc)
    out = b.astype(acc)
    for i, g in enumerate(op.gathers):
        out = out + (u[i] if g is None else gather_rows(g, u[i]))
    return out


@jax.custom_vjp
def _spiral_conv_core_f32out(w_l, b, x, op: SpiralOp):
    """bf16 gathers/matmuls, fp32 output: the fp32 accumulator is returned
    without the trailing bf16 round (final decoder conv only)."""
    out = b.astype(jnp.float32)
    for i, g in enumerate(op.gathers):
        xi = x if g is None else gather_rows(g, x)
        out = out + jnp.einsum("...c,co->...o", xi, w_l[i],
                               preferred_element_type=jnp.float32)
    return out


def _score_f32out_fwd(w_l, b, x, op):
    return _spiral_conv_core_f32out(w_l, b, x, op), (w_l, x, op)


def _score_f32out_bwd(res, dy):
    # round the fp32 cotangent to the primal dtype once, then reuse the
    # bf16 backward — dg stays half-width, and dw/db accumulate in fp32
    # there anyway; only db's dtype differs (b is bf16 here too)
    return _score_bwd(res, dy.astype(res[1].dtype))


_spiral_conv_core_f32out.defvjp(_score_f32out_fwd, _score_f32out_bwd)
