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
           "spiral_gather"]


@jax.tree_util.register_pytree_node_class
@dataclass
class SpiralOp:
    """Per-level spiral structure: one GatherRows per spiral position."""
    gathers: list               # L × GatherRows
    seq_length: int

    def tree_flatten(self):
        return (self.gathers,), (self.seq_length,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def num_vertices(self):
        return self.gathers[0].idx.shape[0]


def build_spiral_op(spirals: np.ndarray) -> SpiralOp:
    """Host-side: [N, L] spiral table → L gather operators w/ transposes."""
    spirals = np.asarray(spirals)
    n, l = spirals.shape
    return SpiralOp(
        gathers=[gather_op_from_idx(spirals[:, i], n) for i in range(l)],
        seq_length=l)


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
    return jnp.concatenate([gather_rows(g, x) for g in op.gathers], axis=-1)


def spiral_conv(params: dict, x: jnp.ndarray, op: SpiralOp) -> jnp.ndarray:
    """Vertex-major spiral conv: [N, ..., C_in] → [N, ..., C_out].

    Computes in x.dtype (params are cast), so bfloat16 activations keep the
    whole gather+matmul chain in half precision."""
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    l = op.seq_length
    c_in = x.shape[-1]
    w_l = w.reshape(l, c_in, w.shape[-1])
    out = b
    for i, g in enumerate(op.gathers):
        out = out + gather_rows(g, x) @ w_l[i]
    return out
