"""Jitted training step and host-side epoch loop.

One compiled program per step does everything the reference spreads across
CPU collate workers and many torch kernel launches (model_manager.py:257-326):
on-device B→B² feature swap, forward, all five losses, backward, and the Adam
update. Data parallelism is a shard_map over the `data` mesh axis with a
psum gradient all-reduce (the XLA-collective equivalent of DDP/NCCL — see
parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.swap import swap_features_dynamic
from ..models.sdvae import (SDVAEConfig, SpiralGeometry, forward,
                            to_vertex_major)
from ..models.mlp import mlp_apply
from .losses import (kl_divergence_loss, laplacian_loss,
                     latent_consistency_loss, mse_loss, region_feature_mask,
                     weighted_cross_entropy)

__all__ = ["LossWeights", "TrainState", "create_train_state",
           "make_train_step", "make_scanned_train_step",
           "make_scanned_train_epochs", "make_eval_step", "LOSS_KEYS",
           "coupled_adam", "assemble_epoch_plans"]


def assemble_epoch_plans(train_iter, val_iter, n_epochs: int,
                         step_counter: int = 0, with_labels: bool = False):
    """Host-side assembly of the multi-epoch scan arguments, shared by
    ModelManager.run_epochs_scanned, tools/train_ensemble.py and
    tools/sweep.py. The step-id schedule built here (validation ids
    following each epoch's train ids, offset by the running counter) IS
    the key-folding contract the per-step/scanned parity tests — and the
    ensemble/sweep bit-comparability claims — depend on; one definition
    so the callers cannot drift.

    Returns ``(args, next_step_counter)`` where ``args`` is the tuple
    (tr_x, va_x, tr_idx [E,St,B], tr_sid [E,St], va_idx [E,Sv,B],
    va_sid [E,Sv], tr_labels | None, va_labels | None) ready to pass to
    a make_scanned_train_epochs-shaped callable after the state/geometry
    arguments. Labels are included only when ``with_labels`` AND every
    plan carries them."""
    tr_plans = [train_iter.epoch_plan() for _ in range(n_epochs)]
    va_plans = [val_iter.epoch_plan() for _ in range(n_epochs)]
    tr_x, va_x = tr_plans[0][0], va_plans[0][0]
    tr_idx = np.stack([p[1] for p in tr_plans])           # [E, St, B]
    va_idx = np.stack([p[1] for p in va_plans])
    use_labels = bool(with_labels and tr_plans[0][2] is not None
                      and va_plans[0][2] is not None)
    tr_lab = jnp.asarray(np.stack([p[2] for p in tr_plans])) \
        if use_labels else None
    va_lab = jnp.asarray(np.stack([p[2] for p in va_plans])) \
        if use_labels else None

    st, sv = tr_idx.shape[1], va_idx.shape[1]
    per = st + sv
    e_ar = np.arange(n_epochs)[:, None]
    tr_sid = step_counter + 1 + e_ar * per + np.arange(st)[None]
    va_sid = step_counter + 1 + e_ar * per + st + np.arange(sv)[None]
    args = (tr_x, va_x, jnp.asarray(tr_idx),
            jnp.asarray(tr_sid.astype(np.int32)), jnp.asarray(va_idx),
            jnp.asarray(va_sid.astype(np.int32)), tr_lab, va_lab)
    return args, step_counter + n_epochs * per


def coupled_adam(lr: float, weight_decay: float):
    """Adam with torch-style *coupled* L2 (decay added to the gradient
    ahead of the moment updates), matching torch.optim.Adam(...,
    weight_decay=·) — used for both the net (reference
    model_manager.py:69-72) and the MLP head (118-121); optax's adamw
    would decay decoupled and silently change the objective."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(lr))
    return optax.adam(lr)

LOSS_KEYS = ["reconstruction", "kl", "latent_consistency", "laplacian",
             "classification", "classification_acc", "tot"]


@dataclass(frozen=True)
class LossWeights:
    """Loss weighting. Fields are python floats everywhere in the
    standard paths (closed over by the step builders, so `w > 0`
    decides the program STRUCTURE statically); the hyperparameter-sweep
    path (training/sweep.py) instead passes fields as traced jnp
    scalars vmapped over a variant axis — LossWeights is registered as
    a pytree below for exactly that, and `_structurally_active` keeps
    the structure decisions static (traced → compute the term
    unconditionally; a 0.0 weight then contributes exactly-zero loss
    and gradient, so variant updates stay bit-identical to a solo run
    that skipped the term)."""
    kl: float = 1e-4
    laplacian: float = 0.1
    latent_consistency: float = 0.5
    eta1: float = 0.5
    eta2: float = 0.5
    classification: float = 0.0

    @classmethod
    def from_config(cls, opt_cfg: dict, clf_cfg: dict | None = None):
        w_class = 0.0
        if clf_cfg and clf_cfg.get("mlp_training_type") == "end2end":
            w_class = float(clf_cfg.get("mlp_loss_weight", 1.0))
        return cls(
            kl=float(opt_cfg.get("kl_weight", 0.0)),
            laplacian=float(opt_cfg.get("laplacian_weight", 0.0)),
            latent_consistency=float(
                opt_cfg.get("latent_consistency_weight", 0.0)),
            eta1=float(opt_cfg.get("latent_consistency_eta1", 0.5)),
            eta2=float(opt_cfg.get("latent_consistency_eta2", 0.5)),
            classification=w_class,
        )


jax.tree_util.register_pytree_node(
    LossWeights,
    lambda w: ((w.kl, w.laplacian, w.latent_consistency, w.eta1, w.eta2,
                w.classification), None),
    lambda _, c: LossWeights(*c))


def _structurally_active(weight) -> bool:
    """Static decision whether a weighted loss term is part of the
    compiled program. Python/concrete weights keep the exact historical
    behavior (term dropped at build time when == 0); traced weights (the
    sweep path, where one program serves variants with different values)
    always include the term — multiplying by a 0.0 weight adds
    exactly-zero loss and gradient, so the parameter trajectory is
    bit-identical either way (only the unweighted metric readout
    differs: the skipped term reports 0.0, the computed one its value).
    """
    if isinstance(weight, jax.core.Tracer):
        return True
    return bool(weight > 0)


@jax.tree_util.register_pytree_node_class
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    clf_params: Any = None
    clf_opt_state: Any = None
    epoch: int = 0

    def tree_flatten(self):
        return ((self.params, self.opt_state, self.clf_params,
                 self.clf_opt_state), (self.epoch,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, epoch=aux[0])


def create_train_state(params, optimizer, clf_params=None,
                       clf_optimizer=None) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        clf_params=clf_params,
        clf_opt_state=(clf_optimizer.init(clf_params)
                       if clf_params is not None else None),
    )


def _compute_losses(params, clf_params, geom: SpiralGeometry,
                    config: SDVAEConfig, weights: LossWeights,
                    x_grid, region_idx, labels, class_weights,
                    batch_size: int, key, training: bool,
                    swap: bool):
    out, z, mu, logvar = forward(params, geom, config, x_grid, key,
                                 training=training)
    loss_recon = mse_loss(out, x_grid)
    loss_lap = laplacian_loss(geom.laplacian, out) \
        if _structurally_active(weights.laplacian) else 0.0
    loss_kl = kl_divergence_loss(mu, logvar) if config.is_vae else 0.0

    if swap and _structurally_active(weights.latent_consistency):
        fmask = region_feature_mask(config.latent_size,
                                    geom.region_masks.shape[0], region_idx)
        loss_cons = latent_consistency_loss(z, fmask, batch_size,
                                            weights.eta1, weights.eta2)
    else:
        loss_cons = 0.0

    loss_class, acc_class = 0.0, 0.0
    if clf_params is not None \
            and _structurally_active(weights.classification) \
            and labels is not None:
        if swap:
            diag = (batch_size + 1) * jnp.arange(batch_size)
            z_diag = z[diag]
        else:
            z_diag = z
        logits, _ = mlp_apply(clf_params, z_diag)
        loss_class, acc_class = weighted_cross_entropy(
            logits, labels, class_weights)

    loss_tot = (loss_recon
                + weights.kl * loss_kl
                + weights.latent_consistency * loss_cons
                + weights.laplacian * loss_lap
                + weights.classification * loss_class)
    metrics = {
        "reconstruction": loss_recon,
        "kl": loss_kl,
        "latent_consistency": loss_cons,
        "laplacian": loss_lap,
        "classification": loss_class,
        "classification_acc": acc_class,
        "tot": loss_tot,
    }
    return loss_tot, metrics


def _build_raw_step(config: SDVAEConfig, weights: LossWeights,
                    optimizer, batch_size: int, swap: bool = True,
                    clf_optimizer=None, axis_name: str | None = None):
    """The un-jitted train step shared by make_train_step (per-dispatch)
    and make_scanned_train_step (whole epochs in one dispatch)."""

    def step(state: TrainState, geom: SpiralGeometry, x, labels,
             class_weights, key):
        k_region, k_reparam = jax.random.split(key)
        x_vm = to_vertex_major(x)                    # [B,N,3] → [N,B,3]
        if swap:
            n_regions = geom.region_masks.shape[0]
            region_idx = jax.random.randint(k_region, (), 0, n_regions)
            x_grid = swap_features_dynamic(x_vm, geom.region_masks,
                                           region_idx)
        else:
            region_idx = jnp.int32(0)
            x_grid = x_vm

        def loss_fn(params, clf_params):
            return _compute_losses(
                params, clf_params, geom, config, weights, x_grid,
                region_idx, labels, class_weights, batch_size, k_reparam,
                training=True, swap=swap)

        (loss, metrics), (grads, clf_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.clf_params)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
            if clf_grads is not None:
                clf_grads = jax.lax.pmean(clf_grads, axis_name)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        clf_params, clf_opt_state = state.clf_params, state.clf_opt_state
        if clf_params is not None and clf_optimizer is not None \
                and _structurally_active(weights.classification):
            clf_updates, clf_opt_state = clf_optimizer.update(
                clf_grads, state.clf_opt_state, clf_params)
            clf_params = optax.apply_updates(clf_params, clf_updates)

        new_state = TrainState(params=params, opt_state=opt_state,
                               clf_params=clf_params,
                               clf_opt_state=clf_opt_state,
                               epoch=state.epoch)
        return new_state, metrics

    return step


def make_train_step(config: SDVAEConfig, weights: LossWeights,
                    optimizer, batch_size: int, swap: bool = True,
                    clf_optimizer=None, axis_name: str | None = None):
    """Build the jitted train step.

    step(state, geom, x [B,N,3], labels [B] | None, class_weights, key)
      → (state, metrics). With axis_name set, gradients are psum-averaged
    across that mesh axis (for use under shard_map).
    """
    step = _build_raw_step(config, weights, optimizer, batch_size, swap,
                           clf_optimizer, axis_name)
    if axis_name is None:
        return jax.jit(step, donate_argnums=(0,))
    return step


def _fold_step_key(key, sid, axis_name):
    """The scanned paths' key schedule: fold_in the running step id, then
    (under shard_map) the device index — matching the per-step paths
    (make_train_step / make_parallel_train_step's device_step) exactly.
    ONE definition so the single-chip and data-parallel scan bodies cannot
    drift apart."""
    k = jax.random.fold_in(key, sid)
    if axis_name is not None:
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
    return k


def _build_raw_scanned_epoch(config: SDVAEConfig, weights: LossWeights,
                             optimizer, batch_size: int, swap: bool = True,
                             clf_optimizer=None,
                             axis_name: str | None = None):
    """Un-jitted whole-epoch scan shared by make_scanned_train_step
    (single chip) and parallel.make_scanned_parallel_step (inside
    shard_map, with per-device key folding and pmean'd grads/metrics via
    _build_raw_step's axis_name)."""
    step = _build_raw_step(config, weights, optimizer, batch_size, swap,
                           clf_optimizer, axis_name)

    def epoch(state: TrainState, geom: SpiralGeometry, data_x, idx,
              step_ids, labels, class_weights, key):
        # labels may be None: scan treats a None xs leaf as an empty
        # pytree and hands the body None back (jit re-specializes on the
        # structure, so both variants share this one definition)
        def body(s, xs):
            idx_t, sid_t, lab_t = xs
            x = jnp.take(data_x, idx_t, axis=0)
            k = _fold_step_key(key, sid_t, axis_name)
            return step(s, geom, x, lab_t, class_weights, k)

        state, metrics = jax.lax.scan(body, state, (idx, step_ids, labels))
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)

    return epoch


def make_scanned_train_step(config: SDVAEConfig, weights: LossWeights,
                            optimizer, batch_size: int, swap: bool = True,
                            clf_optimizer=None):
    """Whole-epoch training in ONE compiled dispatch: `lax.scan` over the
    per-step train step, slicing batches on device from the resident split.

    epoch(state, geom, data_x [n, N, 3], idx [S, B], step_ids [S],
          labels [S, B] | None, class_weights, key)
      → (state, metrics averaged over the S steps).

    Per-step dispatches cross the host↔device link once per step — on a
    tunneled TPU that round-trip is ~1 ms *quiet* and tens of ms under
    network jitter, i.e. up to ~2× of the 11 ms step wasted off-device.
    A scanned epoch costs one dispatch and one metric fetch regardless of
    step count, and matches the per-step path update-for-update (same
    fold_in key schedule; tests/test_training.py asserts parity).
    """
    epoch = _build_raw_scanned_epoch(config, weights, optimizer,
                                     batch_size, swap, clf_optimizer)
    return jax.jit(epoch, donate_argnums=(0,))


def _build_raw_eval(config: SDVAEConfig, weights: LossWeights,
                    batch_size: int, swap: bool = True):
    """Un-jitted validation step shared by make_eval_step and the
    multi-epoch scan."""

    def step(state: TrainState, geom: SpiralGeometry, x, labels,
             class_weights, key):
        k_region, k_reparam = jax.random.split(key)
        x_vm = to_vertex_major(x)
        if swap:
            n_regions = geom.region_masks.shape[0]
            region_idx = jax.random.randint(k_region, (), 0, n_regions)
            x_grid = swap_features_dynamic(x_vm, geom.region_masks,
                                           region_idx)
        else:
            region_idx = jnp.int32(0)
            x_grid = x_vm
        _, metrics = _compute_losses(
            state.params, state.clf_params, geom, config, weights, x_grid,
            region_idx, labels, class_weights, batch_size, k_reparam,
            training=False, swap=swap)
        return metrics

    return step


def make_eval_step(config: SDVAEConfig, weights: LossWeights,
                   batch_size: int, swap: bool = True):
    """Validation: same losses, no update, deterministic forward (z=mu)."""
    return jax.jit(_build_raw_eval(config, weights, batch_size, swap))


def _build_raw_scanned_epochs(config: SDVAEConfig, weights: LossWeights,
                              optimizer, batch_size: int, swap: bool = True,
                              clf_optimizer=None,
                              axis_name: str | None = None):
    """Un-jitted multi-epoch nested scan shared by
    make_scanned_train_epochs (single chip) and
    parallel.make_scanned_parallel_epochs (inside shard_map). With
    axis_name set, train grads/metrics reduce inside _build_raw_step and
    the per-step validation metrics are pmean'd here."""
    step = _build_raw_step(config, weights, optimizer, batch_size, swap,
                           clf_optimizer, axis_name)
    eval_step = _build_raw_eval(config, weights, batch_size, swap)

    def epochs_fn(state, geom, train_x, val_x, tr_idx, tr_sid, va_idx,
                  va_sid, tr_labels, va_labels, class_weights, key):
        # label arrays may be None: scan passes a None xs leaf through as
        # None (empty pytree), so one body serves both variants
        def train_body(s, xs):
            idx_t, sid_t, lab_t = xs
            x = jnp.take(train_x, idx_t, axis=0)
            k = _fold_step_key(key, sid_t, axis_name)
            return step(s, geom, x, lab_t, class_weights, k)

        def epoch_body(s, xs):
            tr_i, tr_s, va_i, va_s, tr_l, va_l = xs
            s, tr_m = jax.lax.scan(train_body, s, (tr_i, tr_s, tr_l))

            def val_body(carry, vxs):
                idx_t, sid_t, lab_t = vxs
                x = jnp.take(val_x, idx_t, axis=0)
                k = _fold_step_key(key, sid_t, axis_name)
                m = eval_step(s, geom, x, lab_t, class_weights, k)
                if axis_name is not None:
                    m = jax.lax.pmean(m, axis_name)
                return carry, m

            _, va_m = jax.lax.scan(val_body, 0, (va_i, va_s, va_l))
            return s, (jax.tree.map(lambda m: jnp.mean(m, axis=0), tr_m),
                       jax.tree.map(lambda m: jnp.mean(m, axis=0), va_m))

        state, (tr_all, va_all) = jax.lax.scan(
            epoch_body, state, (tr_idx, tr_sid, va_idx, va_sid,
                                tr_labels, va_labels))
        return state, tr_all, va_all

    return epochs_fn


def make_scanned_train_epochs(config: SDVAEConfig, weights: LossWeights,
                              optimizer, batch_size: int, swap: bool = True,
                              clf_optimizer=None):
    """MULTIPLE epochs — train steps AND per-epoch validation — in one
    compiled dispatch (nested lax.scan: epochs over steps).

    epochs_fn(state, geom, train_x [n_t, N, 3], val_x [n_v, N, 3],
              tr_idx [E, St, B], tr_sid [E, St],
              va_idx [E, Sv, B], va_sid [E, Sv],
              tr_labels [E, St, B] | None, va_labels [E, Sv, B] | None,
              class_weights, key)
      → (state, train_metrics [E] per key, val_metrics [E] per key)

    Rationale: on the tunneled runtime a dispatch+fetch round-trip costs
    up to seconds while an epoch's compute is ~100 ms — the flagship
    600-epoch schedule was >90% host overhead. Chunking E epochs into one
    program amortizes that to one fetch per chunk; the key schedule
    (fold_in of a running step id, validation ids following the epoch's
    train ids) matches the sequential run_epoch path exactly.
    """
    epochs_fn = _build_raw_scanned_epochs(config, weights, optimizer,
                                          batch_size, swap, clf_optimizer)
    return jax.jit(epochs_fn, donate_argnums=(0,))
