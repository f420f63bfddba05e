"""Vertex-dimension sharding — the mesh analog of sequence/context
parallelism.

The reference caps out at meshes that fit one device (SURVEY §2C). Here the
vertex axis itself is sharded over the device mesh: each device owns a
contiguous block of vertices at every hierarchy level, and every sparse
operator (spiral gather, down-selection, barycentric up-pool) becomes

    halo exchange (all_to_all of exactly the boundary rows each peer needs)
    → local gather on [own shard ‖ received halo]

with all index tables precomputed host-side from the static mesh topology —
the spiral-mesh equivalent of ring attention's halo pattern, but with exact
static plans instead of ring steps, because mesh adjacency is known at trace
time. all_to_all and take both have exact transposes, so the sharded
forward differentiates; training and inference scale past single-chip HBM
for very large templates.

Halo volume is proportional to shard-boundary cut size; vertex orderings
that cluster neighborhoods (BFS/RCM) keep it small. Plans make no locality
assumption — they are exact for any ordering.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["GatherPlan", "VertexShardedModel", "VERTEX_AXIS"]

VERTEX_AXIS = "vertex"


def _ceil_div(a, b):
    return -(-a // b)


def _pad_rows_np(x, rows):
    pad = rows - x.shape[0]
    if pad <= 0:
        return x
    return np.concatenate(
        [x, np.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)


@dataclass
class GatherPlan:
    """Static halo-exchange plan for out[m] = x[idx[m]] with both x and out
    vertex-sharded in contiguous blocks.

    Tables carry a leading device axis and enter shard_map with spec
    P(VERTEX_AXIS) so each device sees its own [1, ...] slice:
      send_idx [D, D, K]   my local rows to ship to each peer
      local_idx [D, S_out] gather positions into [my shard ‖ halo buffer]
    """
    send_idx: np.ndarray
    local_idx: np.ndarray
    shard_in: int
    shard_out: int

    def tables(self):
        return {"send": jnp.asarray(self.send_idx),
                "local": jnp.asarray(self.local_idx)}

    @classmethod
    def build(cls, idx: np.ndarray, n_src: int, n_devices: int
              ) -> "GatherPlan":
        """idx [M] global source rows, M a multiple of n_devices (pad
        first); output row m lives on device m // (M // D)."""
        idx = np.asarray(idx, np.int64)
        m = len(idx)
        assert m % n_devices == 0, "pad idx to a device multiple first"
        shard_out = m // n_devices
        shard_in = _ceil_div(n_src, n_devices)
        owner = idx // shard_in

        need = {}
        for d in range(n_devices):
            lo, hi = d * shard_out, (d + 1) * shard_out
            my_idx, my_owner = idx[lo:hi], owner[lo:hi]
            for p in range(n_devices):
                if p != d:
                    rows = np.unique(my_idx[my_owner == p])
                    if len(rows):
                        need[(p, d)] = rows
        k = max((len(r) for r in need.values()), default=1)

        send_idx = np.zeros((n_devices, n_devices, k), np.int32)
        halo_pos = [dict() for _ in range(n_devices)]
        for (p, d), rows in need.items():
            send_idx[p, d, :len(rows)] = rows - p * shard_in
            for j, r in enumerate(rows):
                halo_pos[d][int(r)] = p * k + j

        local_idx = np.zeros((n_devices, shard_out), np.int32)
        for d in range(n_devices):
            for j in range(shard_out):
                src = int(idx[d * shard_out + j])
                if src // shard_in == d:
                    local_idx[d, j] = src - d * shard_in
                else:
                    local_idx[d, j] = shard_in + halo_pos[d][src]
        return cls(send_idx, local_idx, shard_in, shard_out)


def apply_gather(tables: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Inside shard_map: tables have a leading [1] device slice; x is this
    device's [S_in, ...] block. Returns [S_out, ...].

    Gathers run on the lane-packed 2D view (trailing dims flattened) — XLA
    pads the minor dim to 128 lanes, so thin-channel rows would otherwise
    move up to 4× phantom bytes (see ops/sparse.py)."""
    send_idx = tables["send"][0]                     # [D, K]
    local_idx = tables["local"][0]                   # [S_out]
    trailing = x.shape[1:]
    x2 = x.reshape(x.shape[0], -1)
    to_send = jnp.take(x2, send_idx.reshape(-1), axis=0)
    to_send = to_send.reshape(*send_idx.shape, x2.shape[1])
    recv = jax.lax.all_to_all(to_send, VERTEX_AXIS, split_axis=0,
                              concat_axis=0, tiled=False)
    halo = recv.reshape(-1, x2.shape[1])
    x_ext = jnp.concatenate([x2, halo], axis=0)
    return jnp.take(x_ext, local_idx, axis=0).reshape(
        local_idx.shape[0], *trailing)


class VertexShardedModel:
    """SD-VAE forward with every hierarchy level sharded over the vertex
    axis. Built from the same GeometryBundle as the unsharded model; the
    dense latent heads run replicated (the deepest level is tiny)."""

    def __init__(self, bundle, config, mesh: Mesh):
        from ..ops.pool import selection_indices

        self.config = config
        self.mesh = mesh
        d = mesh.devices.size
        self.n_devices = d

        counts = bundle.vertex_counts
        self.counts = counts
        self.shards = [_ceil_div(n, d) for n in counts]

        def arrange_per_vertex(table_2d, level):
            """[N_l, K] per-vertex index table → device-aligned flat index
            list [D * K * S_l], layout [D][K][S]."""
            n, k = table_2d.shape
            padded = _pad_rows_np(np.asarray(table_2d, np.int64),
                                  self.shards[level] * d)
            return padded.reshape(d, self.shards[level], k) \
                .transpose(0, 2, 1).reshape(-1)

        self.conv_tables, self.conv_l = [], []
        for level, s in enumerate(bundle.spirals):
            self.conv_l.append(s.shape[1])
            self.conv_tables.append(GatherPlan.build(
                arrange_per_vertex(s, level), counts[level], d).tables())

        self.down_tables = []
        for i, dn in enumerate(bundle.down_transforms):
            sel = selection_indices(dn)
            assert sel is not None, "down transforms are selections"
            sel = _pad_rows_np(np.asarray(sel, np.int64),
                               self.shards[i + 1] * d)
            self.down_tables.append(
                GatherPlan.build(sel, counts[i], d).tables())

        self.up_tables, self.up_vals = [], []
        for i, up in enumerate(bundle.up_transforms):
            order = np.argsort(up.rows, kind="stable")
            cols = np.asarray(up.cols)[order].reshape(counts[i], 3)
            vals = np.asarray(up.vals)[order].reshape(counts[i], 3)
            self.up_tables.append(GatherPlan.build(
                arrange_per_vertex(cols, i), counts[i + 1], d).tables())
            padded = _pad_rows_np(vals.astype(np.float32),
                                  self.shards[i] * d)
            self.up_vals.append(jnp.asarray(
                padded.reshape(d, self.shards[i], 3)))

        self.all_tables = {"conv": self.conv_tables,
                           "down": self.down_tables,
                           "up": self.up_tables,
                           "up_vals": self.up_vals}

    # ------------------------------------------------------------------
    def shard_vertices(self, x: np.ndarray) -> np.ndarray:
        """[N, B, C] host array → padded [D*S_0, B, C] for P(vertex)."""
        return _pad_rows_np(np.asarray(x), self.shards[0] * self.n_devices)

    def _conv(self, tables, l, params, h):
        g = apply_gather(tables, h)                   # [L*S, B, C]
        g = g.reshape(l, -1, *h.shape[1:])            # [L, S, B, C]
        w_l = params["w"].reshape(l, h.shape[-1], -1)
        return params["b"] + jnp.einsum("lsbc,lco->sbo", g, w_l)

    def _encode(self, params, tables, h):
        cfg = self.config
        for i, conv_p in enumerate(params["en_convs"]):
            h = self._conv(tables["conv"][i], self.conv_l[i], conv_p, h)
            h = jax.nn.elu(h)
            h = apply_gather(tables["down"][i], h)
        h_full = jax.lax.all_gather(h, VERTEX_AXIS, axis=0, tiled=True)
        h_full = h_full[:self.counts[-1]]
        flat = jnp.swapaxes(h_full, 0, 1).reshape(h_full.shape[1], -1)
        mu = flat @ params["mu"]["w"] + params["mu"]["b"]
        logvar = None
        if cfg.is_vae:
            logvar = flat @ params["logvar"]["w"] + params["logvar"]["b"]
        return mu, logvar

    def _decode(self, params, tables, z):
        n_levels = len(params["de_convs"])
        num_vert = self.counts[-1]
        h = z @ params["de_dense"]["w"] + params["de_dense"]["b"]
        h = h.reshape(z.shape[0], num_vert, -1)
        h = jnp.swapaxes(h, 0, 1)                     # [N_L, B, C]
        pad = self.shards[-1] * self.n_devices - num_vert
        h = jnp.concatenate(
            [h, jnp.zeros((pad, *h.shape[1:]), h.dtype)], axis=0)
        idx = jax.lax.axis_index(VERTEX_AXIS)
        h = jax.lax.dynamic_slice_in_dim(
            h, idx * self.shards[-1], self.shards[-1], axis=0)
        for j, conv_p in enumerate(params["de_convs"]):
            level = n_levels - 1 - j
            up = apply_gather(tables["up"][level], h)   # [3*S_l, B, C]
            up = up.reshape(3, -1, *h.shape[1:])
            h = jnp.einsum("ksbc,sk->sbc", up, tables["up_vals_l"][level][0])
            h = self._conv(tables["conv"][level], self.conv_l[level],
                           conv_p, h)
            h = jax.nn.elu(h)
        return self._conv(tables["conv"][0], self.conv_l[0],
                          params["final_conv"], h)

    # ------------------------------------------------------------------
    def make_forward(self):
        """Jitted sharded forward: (params, x [D*S_0, B, 3]) →
        (out [D*S_0, B, 3], mu, logvar); x/out sharded, params replicated."""

        tables = {"conv": self.conv_tables, "down": self.down_tables,
                  "up": self.up_tables, "up_vals_l": self.up_vals}

        def device_fn(params, tables, x):
            mu, logvar = self._encode(params, tables, x)
            z = mu
            out = self._decode(params, tables, z)
            lv = logvar if logvar is not None else jnp.zeros_like(mu)
            return out, mu, lv

        fwd = shard_map(
            device_fn, mesh=self.mesh,
            in_specs=(P(), P(VERTEX_AXIS), P(VERTEX_AXIS)),
            out_specs=(P(VERTEX_AXIS), P(), P()),
            check_vma=False)

        @jax.jit
        def run(params, x_sharded):
            return fwd(params, tables, x_sharded)

        return run
