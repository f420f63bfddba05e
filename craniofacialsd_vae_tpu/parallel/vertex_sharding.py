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
        self._bundle = bundle
        # on a 2-D (data × vertex) mesh, tables shard over the vertex axis
        # only (and replicate across data)
        d = dict(mesh.shape).get(VERTEX_AXIS, mesh.devices.size)
        self.n_devices = d
        self.data_axis = next((a for a in mesh.shape
                               if a != VERTEX_AXIS), None)

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

    def _conv(self, tables, l, params, h, out_dtype=None):
        g = apply_gather(tables, h)                   # [L*S, B, C]
        g = g.reshape(l, -1, *h.shape[1:])            # [L, S, B, C]
        # compute in h.dtype (params cast, like ops.spiral_conv): under the
        # mixed policy the deep-level halo gathers move bf16 rows; the MXU
        # accumulates in fp32 and rounds once at the end — or not at all
        # when out_dtype=float32 (final conv: recon stays full precision,
        # ops/spiral_conv._spiral_conv_core_f32out semantics)
        w_l = params["w"].astype(h.dtype).reshape(l, h.shape[-1], -1)
        if h.dtype == jnp.bfloat16:
            out = jnp.einsum("lsbc,lco->sbo", g, w_l,
                             preferred_element_type=jnp.float32)
            if out_dtype == jnp.float32:
                return params["b"].astype(jnp.float32) + out
            return (params["b"] + out).astype(h.dtype)
        return params["b"] + jnp.einsum("lsbc,lco->sbo", g, w_l)

    def _encode(self, params, tables, h):
        cfg = self.config
        # level-0 policy boundary (models/sdvae.py encode): fp32 under
        # "float32"/"mixed", bf16 only under the legacy all-bf16 knob
        h = h.astype(cfg.activation_dtype)
        for i, conv_p in enumerate(params["en_convs"]):
            h = self._conv(tables["conv"][i], self.conv_l[i], conv_p, h)
            h = jax.nn.elu(h)
            h = apply_gather(tables["down"][i], h)
            if i == 0:
                # mixed-policy boundary (models/sdvae.py encode): conv 0
                # gathered the thin G·3 rows in fp32; deeper levels gather
                # ≥G·32-wide rows where bf16 is the measured win
                h = h.astype(cfg.deep_dtype)
        h_full = jax.lax.all_gather(h, VERTEX_AXIS, axis=0, tiled=True)
        h_full = h_full[:self.counts[-1]]
        flat = jnp.swapaxes(h_full, 0, 1).reshape(h_full.shape[1], -1)
        flat = flat.astype(jnp.float32)     # latent heads in full precision
        mu = flat @ params["mu"]["w"] + params["mu"]["b"]
        logvar = None
        if cfg.is_vae:
            logvar = flat @ params["logvar"]["w"] + params["logvar"]["b"]
        elif cfg.pre_z_sigmoid:
            mu = jax.nn.sigmoid(mu)
        return mu, logvar

    def _decode(self, params, tables, z):
        n_levels = len(params["de_convs"])
        num_vert = self.counts[-1]
        h = z @ params["de_dense"]["w"] + params["de_dense"]["b"]
        h = h.reshape(z.shape[0], num_vert, -1)
        h = jnp.swapaxes(h, 0, 1)                     # [N_L, B, C]
        # whole decoder gathers wide rows — deep_dtype territory; the final
        # conv returns its fp32 accumulator unrounded (losses see full
        # precision)
        h = h.astype(self.config.deep_dtype)
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
            vals = tables["up_vals_l"][level][0].astype(h.dtype)
            h = jnp.einsum("ksbc,sk->sbc", up, vals,
                           preferred_element_type=jnp.float32).astype(
                               h.dtype)
            h = self._conv(tables["conv"][level], self.conv_l[level],
                           conv_p, h)
            h = jax.nn.elu(h)
        return self._conv(tables["conv"][0], self.conv_l[0],
                          params["final_conv"], h,
                          out_dtype=jnp.float32).astype(jnp.float32)

    # ------------------------------------------------------------------
    def _build_loss_tables(self):
        """Lazily-built extras the train step needs beyond the forward:
        an ELL halo-gather plan for the template Laplacian (the smoothness
        loss is a per-vertex local operator, like the convs), the
        vertex-sharded region masks for the on-device swap, and the
        valid-row mask hiding the shard padding."""
        if hasattr(self, "_loss_tables"):
            return self._loss_tables
        bundle = self._bundle
        d = self.n_devices
        n = self.counts[0]
        s0 = self.shards[0]

        rows, cols, vals = bundle.template.laplacian
        rows = np.asarray(rows)
        order = np.argsort(rows, kind="stable")
        rows, cols_s, vals_s = rows[order], np.asarray(cols)[order], \
            np.asarray(vals)[order]
        counts = np.bincount(rows, minlength=n)
        k = int(counts.max())
        ell_cols = np.zeros((n, k), np.int64)
        ell_vals = np.zeros((n, k), np.float32)
        pos = np.concatenate([[0], np.cumsum(counts)[:-1]])
        for j in range(k):
            sel = counts > j
            ell_cols[sel, j] = cols_s[pos[sel] + j]
            ell_vals[sel, j] = vals_s[pos[sel] + j]

        def arrange(table_2d):
            padded = _pad_rows_np(np.asarray(table_2d), s0 * d)
            return padded.reshape(d, s0, -1)

        lap_plan = GatherPlan.build(
            arrange(ell_cols).transpose(0, 2, 1).reshape(-1), n, d).tables()
        lap_vals = jnp.asarray(arrange(ell_vals))          # [D, S, K]

        masks = np.asarray(bundle.template.region_masks(), np.float32)
        masks_sh = jnp.asarray(arrange(masks.T))           # [D, S, R]
        valid = np.zeros((d, s0), np.float32)
        valid.reshape(-1)[:n] = 1.0
        self._lap_k = k
        self._loss_tables = {"lap": lap_plan, "lap_vals": lap_vals,
                             "masks": masks_sh,
                             "valid": jnp.asarray(valid)}
        return self._loss_tables

    def _build_bodies(self, weights, optimizer, batch_size: int,
                      swap: bool = True):
        """Shared un-shard_mapped bodies for the per-step and scanned
        builders: (tables, lt, device_step, eval_body, data_axis).
        ONE definition of the loss/update semantics so the per-step and
        scanned paths cannot drift apart (the same rule
        training.trainer._build_raw_step enforces for the DP builders).

        Locality split: reconstruction and the Laplacian regularizer are
        per-vertex local (computed on each shard, masked to real rows,
        psum'd); KL and latent-consistency live on the replicated latent —
        each device computes them identically, so their loss contribution
        is divided by the device count before the gradient psum. The
        classifier head is not part of this step (diagnosis happens on
        replicated latents; see training.trainer for the end2end path).
        """
        import optax

        from ..training.losses import (kl_divergence_loss,
                                       latent_consistency_loss,
                                       region_feature_mask)
        from ..training.trainer import TrainState

        tables = {"conv": self.conv_tables, "down": self.down_tables,
                  "up": self.up_tables, "up_vals_l": self.up_vals}
        lt = self._build_loss_tables()
        lap_k = self._lap_k
        cfg = self.config
        d = self.n_devices
        n_tot = self.counts[0]
        n_regions = int(lt["masks"].shape[-1])
        grid = batch_size * batch_size if swap else batch_size

        def device_loss(params, tables, lt, x, key):
            k_region, k_reparam = jax.random.split(key)
            masks_local = lt["masks"][0]                   # [S, R]
            valid = lt["valid"][0]                         # [S]
            if swap:
                region_idx = jax.random.randint(k_region, (), 0, n_regions)
                m = jnp.take(masks_local, region_idx, axis=1) > 0
                xi = x[:, :, None, :]
                xj = x[:, None, :, :]
                x_grid = jnp.where(m[:, None, None, None], xj, xi)
                x_grid = x_grid.reshape(x.shape[0], -1, x.shape[-1])
            else:
                region_idx = jnp.int32(0)
                x_grid = x

            mu, logvar = self._encode(params, tables, x_grid)
            if cfg.is_vae:
                std = jnp.exp(0.5 * logvar)
                eps = jax.random.normal(k_reparam, mu.shape, mu.dtype)
                z = mu + eps * std
            else:
                z = mu
            out = self._decode(params, tables, z)          # [S, grid, 3]

            vmask = valid[:, None, None]
            recon = jnp.sum((out - x_grid) ** 2 * vmask) / \
                (n_tot * grid * 3)

            lap = 0.0
            if weights.laplacian > 0:
                g = apply_gather(lt["lap"], out)           # [K·S, grid, 3]
                g = g.reshape(lap_k, -1, grid, 3)
                lx = jnp.einsum("ksbc,sk->sbc", g, lt["lap_vals"][0])
                sq = jnp.sum(lx * lx, axis=-1)             # [S, grid]
                # padded rows are structurally zero and d(sqrt)/dx at 0 is
                # NaN — where-guard them before the sqrt, then mask
                safe = jnp.where(valid[:, None] > 0, sq, 1.0)
                per_vertex = jnp.sqrt(safe) * valid[:, None]
                lap = jnp.sum(per_vertex) / (n_tot * grid)

            kl = kl_divergence_loss(mu, logvar) if cfg.is_vae else 0.0
            cons = 0.0
            if swap and weights.latent_consistency > 0:
                fmask = region_feature_mask(cfg.latent_size, n_regions,
                                            region_idx)
                cons = latent_consistency_loss(z, fmask, batch_size,
                                               weights.eta1, weights.eta2)

            # local terms partition over shards (psum of grads sums them);
            # replicated terms are computed identically on every device, so
            # divide by D to keep the psum'd gradient correct
            loss = recon + weights.laplacian * lap + \
                (weights.kl * kl + weights.latent_consistency * cons) / d
            metrics = {"reconstruction": recon, "laplacian": lap,
                       "kl": kl / d, "latent_consistency": cons / d}
            return loss, metrics

        data_axis = self.data_axis if len(self.mesh.shape) > 1 else None

        def finish_metrics(metrics):
            metrics = dict(metrics)
            metrics["tot"] = (metrics["reconstruction"]
                              + weights.kl * metrics["kl"]
                              + weights.latent_consistency
                              * metrics["latent_consistency"]
                              + weights.laplacian * metrics["laplacian"])
            return metrics

        def device_step(state, tables, lt, x, key):
            if data_axis is not None:
                # per-data-replica RNG (train_parallel.py:41-43 semantics):
                # regions/noise decorrelate across data shards but stay
                # identical across this replica's vertex shards
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(data_axis))
            (_, metrics), grads = jax.value_and_grad(
                device_loss, has_aux=True)(state.params, tables, lt, x, key)
            grads = jax.lax.psum(grads, VERTEX_AXIS)
            metrics = jax.lax.psum(metrics, VERTEX_AXIS)
            if data_axis is not None:
                # DP composition: vertex shards SUM their partitioned loss
                # terms, data shards AVERAGE their independent swap grids
                # (same semantics as make_parallel_train_step's pmean)
                grads = jax.lax.pmean(grads, data_axis)
                metrics = jax.lax.pmean(metrics, data_axis)
            metrics = finish_metrics(metrics)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   clf_params=state.clf_params,
                                   clf_opt_state=state.clf_opt_state,
                                   epoch=state.epoch)
            return new_state, metrics

        def eval_body(state, tables, lt, x, key):
            """Validation metrics only — same loss semantics, no update."""
            if data_axis is not None:
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(data_axis))
            _, metrics = device_loss(state.params, tables, lt, x, key)
            metrics = jax.lax.psum(metrics, VERTEX_AXIS)
            if data_axis is not None:
                metrics = jax.lax.pmean(metrics, data_axis)
            return finish_metrics(metrics)

        return tables, lt, device_step, eval_body, data_axis

    def make_train_step(self, weights, optimizer, batch_size: int,
                        swap: bool = True):
        """Vertex-sharded training step — losses and the optimizer update
        under the vertex mesh, matching training.trainer.make_train_step
        update-for-update (same key-splitting, swap, loss semantics).

        step(state, x_sharded [D·S₀, B, 3], key) → (state, metrics).

        On a 2-D (data × vertex) mesh the same step composes DP with
        vertex sharding: x is [D_v·S₀, D_d·B, 3] (vertex dim sharded over
        'vertex', batch dim over 'data'), each data shard builds its own
        swap grid from the shared key, vertex shards psum their
        partitioned loss terms and data shards pmean the resulting
        gradients — DP over ICI and SP halo exchanges from one compiled
        program."""
        tables, lt, device_step, _, data_axis = self._build_bodies(
            weights, optimizer, batch_size, swap)

        x_spec = P(VERTEX_AXIS, data_axis) if data_axis is not None \
            else P(VERTEX_AXIS)
        step = shard_map(
            device_step, mesh=self.mesh,
            in_specs=(P(), P(VERTEX_AXIS), P(VERTEX_AXIS), x_spec,
                      P()),
            out_specs=(P(), P()),
            check_vma=False)

        @jax.jit
        def run(state, x_sharded, key):
            return step(state, tables, lt, x_sharded, key)

        return run

    def make_scanned_epoch(self, weights, optimizer, batch_size: int,
                           swap: bool = True):
        """Whole vertex-sharded epoch in ONE dispatch — the scanned
        counterpart of make_train_step, closing the host-free-epoch gap on
        the 1-D vertex and 2-D (data × vertex) meshes (per-step dispatch
        re-pays the ~10×-of-compute tunnel round-trip the single-chip and
        DP scans eliminated; docs/PERFORMANCE.md).

        epoch(state, data_x [D_v·S₀, n, 3], idx [S, G], step_ids [S], key)
          → (state, metrics averaged over the S steps)

        data_x is the vertex-major resident split, vertex-sharded along
        axis 0 and replicated across the data axis; idx carries G =
        D_data·B global batch columns per step, sharded over the data axis
        (G = B and replicated on a 1-D mesh). The scan slices each batch
        on device with a local take along the replicated sample axis — no
        collective, no host. Key schedule: fold_in(epoch_key, step_id)
        then fold_in(·, data_index) — identical to the per-step composed
        path driven with per-step folded keys and to
        trainer._fold_step_key, so the scanned and per-step paths match
        update-for-update (tests/test_vertex_sharding.py asserts parity).
        """
        from functools import partial

        tables, lt, device_step, _, data_axis = self._build_bodies(
            weights, optimizer, batch_size, swap)

        def epoch_body(state, tables, lt, data_x, idx, step_ids, key):
            def body(s, xs):
                idx_t, sid_t = xs
                x = jnp.take(data_x, idx_t, axis=1)     # [S₀, B, 3] local
                k = jax.random.fold_in(key, sid_t)
                return device_step(s, tables, lt, x, k)

            state, metrics = jax.lax.scan(body, state, (idx, step_ids))
            return state, jax.tree.map(lambda m: jnp.mean(m, axis=0),
                                       metrics)

        idx_spec = P(None, data_axis) if data_axis is not None else P()
        epoch = shard_map(
            epoch_body, mesh=self.mesh,
            in_specs=(P(), P(VERTEX_AXIS), P(VERTEX_AXIS), P(VERTEX_AXIS),
                      idx_spec, P(), P()),
            out_specs=(P(), P()),
            check_vma=False)

        @partial(jax.jit, donate_argnums=(0,))
        def run(state, data_x, idx, step_ids, key):
            return epoch(state, tables, lt, data_x, idx, step_ids, key)

        return run

    def make_scanned_epochs(self, weights, optimizer, batch_size: int,
                            swap: bool = True):
        """MULTI-epoch vertex-sharded training (train steps + per-epoch
        validation) in one dispatch — the composed-mesh analog of
        parallel.make_scanned_parallel_epochs (nested lax.scan inside the
        2-D shard_map; halo all_to_alls live inside the step body).

        epochs_fn(state, train_x [D_v·S₀, n_t, 3], val_x [D_v·S₀, n_v, 3],
                  tr_idx [E, St, G], tr_sid [E, St],
                  va_idx [E, Sv, G], va_sid [E, Sv], key)
          → (state, train_metrics [E] per key, val_metrics [E] per key)
        """
        from functools import partial

        tables, lt, device_step, eval_body, data_axis = self._build_bodies(
            weights, optimizer, batch_size, swap)

        def epochs_fn(state, tables, lt, train_x, val_x, tr_idx, tr_sid,
                      va_idx, va_sid, key):
            def train_body(s, xs):
                idx_t, sid_t = xs
                x = jnp.take(train_x, idx_t, axis=1)
                k = jax.random.fold_in(key, sid_t)
                return device_step(s, tables, lt, x, k)

            def epoch_body(s, xs):
                tr_i, tr_s, va_i, va_s = xs
                s, tr_m = jax.lax.scan(train_body, s, (tr_i, tr_s))

                def val_body(carry, vxs):
                    idx_t, sid_t = vxs
                    x = jnp.take(val_x, idx_t, axis=1)
                    k = jax.random.fold_in(key, sid_t)
                    return carry, eval_body(s, tables, lt, x, k)

                _, va_m = jax.lax.scan(val_body, 0, (va_i, va_s))
                return s, (jax.tree.map(lambda m: jnp.mean(m, axis=0),
                                        tr_m),
                           jax.tree.map(lambda m: jnp.mean(m, axis=0),
                                        va_m))

            state, (tr_all, va_all) = jax.lax.scan(
                epoch_body, state, (tr_idx, tr_sid, va_idx, va_sid))
            return state, tr_all, va_all

        col3 = P(None, None, data_axis) if data_axis is not None else P()
        epochs = shard_map(
            epochs_fn, mesh=self.mesh,
            in_specs=(P(), P(VERTEX_AXIS), P(VERTEX_AXIS), P(VERTEX_AXIS),
                      P(VERTEX_AXIS), col3, P(), col3, P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)

        @partial(jax.jit, donate_argnums=(0,))
        def run(state, train_x, val_x, tr_idx, tr_sid, va_idx, va_sid,
                key):
            return epochs(state, tables, lt, train_x, val_x, tr_idx,
                          tr_sid, va_idx, va_sid, key)

        return run

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
