"""Deep-ensemble training: K independent SD-VAEs in ONE compiled dispatch.

The reference trains one network at a time (train.py epoch loop).
``jax.vmap`` over a member axis trains K members in ONE compiled
dispatch per epoch chunk — every conv matmul becomes a batched matmul
and every spiral gather a K-row-block gather over the SAME index
tables — while the members stay mathematically INDEPENDENT: member i's
whole trajectory (init, swap draws, reparameterization noise, Adam
updates) is exactly the single-model scanned run of
``ModelManager(config, seed=base_seed+i)`` (tests/test_ensemble.py pins
this parity member-for-member).

Measured cost (benchmarks/ensemble_ab.py, flagship step, real chip,
interleaved A/B): the step is HBM-gather-bound and a member's gather
traffic scales with K, so device time is near-linear — per-member cost
0.86× of a solo run at K ∈ {4, 8} (the fixed dispatch/thin-op overheads
amortize), 1.09× at K=2 (vmap layout overhead exceeds the amortization).
The win is therefore mostly OPERATIONAL: one dispatch, one resident
dataset, one process and one compile train the whole ensemble — K
sequential train.py runs pay K× compiles, K× host loops and K×
tunnel round-trips.

Why ensembles: independently-initialized members disagree exactly where
the training data underdetermines the function — the standard
epistemic-uncertainty estimator. Together with the posterior-sampling
surface (analysis/uncertainty.py) this completes the uncertainty story:
per-member posterior spread says what one model doubts about a scan;
cross-member spread (``analysis.uncertainty.summarize_ensemble``) says
what the training run never pinned down.

Seed contract (matches ModelManager.__init__ exactly): member i draws
``k_net, k_clf = split(PRNGKey(base_seed + i))`` for its parameters and
uses ``PRNGKey(base_seed + i + 1)`` as its epoch key — so a trained
member checkpoint is indistinguishable from a ``train.py`` run with
``seed=base_seed+i`` over the same epoch plans.

``tools/train_ensemble.py`` drives this end-to-end: one config → K
standard run dirs, each resumable / servable / evaluable by the whole
stack (test.py, DiagnosisService, export).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.sdvae import SDVAEConfig, SpiralGeometry, init_sdvae
from .trainer import (LossWeights, TrainState, _build_raw_scanned_epoch,
                      _build_raw_scanned_epochs)

__all__ = ["init_ensemble_state", "ensemble_epoch_keys",
           "make_ensemble_scanned_step", "make_ensemble_scanned_epochs",
           "member_state", "n_members"]


def init_ensemble_state(config: SDVAEConfig, geom: SpiralGeometry,
                        optimizer, n_members: int, base_seed: int = 0,
                        clf_init=None, clf_optimizer=None) -> TrainState:
    """Stacked TrainState with leading member axis K on every leaf.

    Member i's net params come from ``init_sdvae(k_net)`` with
    ``k_net, k_clf = split(PRNGKey(base_seed + i))`` — bit-identical to
    ``ModelManager(config, seed=base_seed+i)``'s init. ``clf_init``
    (optional, for end2end classifier heads) receives ``k_clf``."""
    if int(n_members) < 1:
        raise ValueError(f"n_members must be >= 1; got {n_members}")

    def init_one(seed):
        k_net, k_clf = jax.random.split(jax.random.PRNGKey(seed))
        params = init_sdvae(k_net, config, geom)
        clf = clf_init(k_clf) if clf_init is not None else None
        return params, clf

    seeds = jnp.arange(int(n_members)) + int(base_seed)
    params, clf_params = jax.vmap(init_one)(seeds)
    clf_opt_state = None
    if clf_params is not None and clf_optimizer is not None:
        clf_opt_state = jax.vmap(clf_optimizer.init)(clf_params)
    return TrainState(params=params,
                      opt_state=jax.vmap(optimizer.init)(params),
                      clf_params=clf_params,
                      clf_opt_state=clf_opt_state)


def ensemble_epoch_keys(n_members: int, base_seed: int = 0) -> jnp.ndarray:
    """Per-member epoch keys [K, 2]: member i gets
    ``PRNGKey(base_seed + i + 1)`` — the manager's ``seed + 1`` contract,
    so member i's swap/reparameterization stream matches a single run
    with ``seed=base_seed+i``."""
    return jnp.stack([jax.random.PRNGKey(base_seed + i + 1)
                      for i in range(int(n_members))])


def make_ensemble_scanned_step(config: SDVAEConfig, weights: LossWeights,
                               optimizer, batch_size: int,
                               swap: bool = True, clf_optimizer=None):
    """K members × one training epoch (train steps only) in ONE compiled
    dispatch — the member-axis vmap of training.make_scanned_train_step.

    fn(state_K, geom, data_x, idx [S,B], step_ids [S], labels,
       class_weights, keys_K [K,2])
      → (state_K, metrics [K] per key)"""
    raw = _build_raw_scanned_epoch(config, weights, optimizer, batch_size,
                                   swap, clf_optimizer)
    vfn = jax.vmap(raw, in_axes=(0,) + (None,) * 6 + (0,))
    return jax.jit(vfn, donate_argnums=(0,))


def make_ensemble_scanned_epochs(config: SDVAEConfig, weights: LossWeights,
                                 optimizer, batch_size: int,
                                 swap: bool = True, clf_optimizer=None):
    """K members × (E epochs × (train steps + per-epoch validation)) in
    ONE compiled dispatch: ``vmap`` of the multi-epoch nested scan over
    the member axis of (state, epoch key), everything else — geometry,
    resident splits, index plans, labels, class weights — broadcast.

    fn(state_K, geom, train_x, val_x, tr_idx [E,St,B], tr_sid [E,St],
       va_idx [E,Sv,B], va_sid [E,Sv], tr_labels, va_labels,
       class_weights, keys_K [K,2])
      → (state_K, train_metrics [K,E] per key, val_metrics [K,E] per key)

    Same argument contract as training.make_scanned_train_epochs with a
    leading K axis on state/keys/metrics."""
    raw = _build_raw_scanned_epochs(config, weights, optimizer,
                                    batch_size, swap, clf_optimizer)
    vfn = jax.vmap(raw, in_axes=(0,) + (None,) * 10 + (0,))
    return jax.jit(vfn, donate_argnums=(0,))


def n_members(state: TrainState) -> int:
    """Member count of a stacked state (leading axis of any param leaf)."""
    return int(jax.tree_util.tree_leaves(state.params)[0].shape[0])


def member_state(state: TrainState, i: int) -> TrainState:
    """Member i's plain TrainState (drops the member axis) — usable
    anywhere a single-model state is: checkpointing, ModelManager.state,
    eval, serving."""
    k = n_members(state)
    if not 0 <= int(i) < k:
        raise IndexError(f"member {i} out of range for a {k}-member state")
    parts = jax.tree.map(lambda leaf: leaf[int(i)],
                         (state.params, state.opt_state,
                          state.clf_params, state.clf_opt_state))
    return TrainState(*parts, epoch=state.epoch)
