"""Hyperparameter sweeps: K optimization variants in ONE compiled dispatch.

The reference tunes its optimization hyperparameters (lr, weight_decay,
kl/laplacian/latent-consistency weights and margins —
configurations/craniofacial.yaml) by editing the YAML and re-running
train.py once per setting. Here the whole sweep trains as a single
program: ``jax.vmap`` over a variant axis of (state, hyperparameters),
with the loss weights and the optimizer's lr / weight_decay as TRACED
per-variant scalars inside the same multi-epoch nested scan production
training uses (training/trainer._build_raw_scanned_epochs). One compile,
one resident dataset, one dispatch stream — and every variant sees the
SAME init, batch order and swap/reparameterization noise (one seed, one
epoch-key stream), so differences between variants are the
hyperparameters and nothing else: a controlled comparison K sequential
train.py runs can only approximate by fixing seeds.

Exactness contract (pinned by tests/test_sweep.py): variant i's
parameter trajectory is bit-comparable to a solo scanned run configured
with variant i's hyperparameters, because

- ``chain(add_decayed_weights(wd), adam(lr))`` with traced scalars takes
  the same update math as the manager's ``coupled_adam`` (for wd == 0,
  ``g + 0.0 * p == g`` exactly, so the extra transform is a bit-exact
  no-op);
- a 0.0 loss weight contributes exactly-zero loss AND gradient, so
  computing a term the solo build skips structurally does not move the
  updates (trainer._structurally_active documents this);
- the reported METRIC for a 0-weighted term does differ: the solo build
  reports 0.0, the sweep reports the term's unweighted value (a strictly
  more informative readout).

Variant axes are the optimization-section scalars only (SWEEPABLE_KEYS).
Keys that change program structure — batch_size, model.*, epochs — are
rejected: they cannot share one compiled program. ``kl_weight`` may only
be swept among values consistent with the base config's is_vae (kl > 0):
the logvar head exists or not at module-construction time.

``tools/sweep.py`` drives this end-to-end: one base config × a grid of
overrides → K standard run dirs (each with its own config.yaml snapshot
carrying the overridden values, so test.py / serving / export read the
right hyperparameters) + sweep.json ranking the variants.
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import optax

from ..models.sdvae import SDVAEConfig, SpiralGeometry, init_sdvae
from .trainer import LossWeights, TrainState, _build_raw_scanned_epochs

__all__ = ["SWEEPABLE_KEYS", "build_variants", "stack_hyperparams",
           "init_sweep_state", "make_sweep_scanned_epochs",
           "variant_state", "n_variants"]

#: optimization-section keys a sweep may vary (everything else either
#: changes program structure or lives outside the compiled step)
SWEEPABLE_KEYS = ("lr", "weight_decay", "kl_weight", "laplacian_weight",
                  "latent_consistency_weight", "latent_consistency_eta1",
                  "latent_consistency_eta2")


def build_variants(base_config: dict, overrides: list[dict]) -> list[dict]:
    """Full per-variant config dicts: ``base_config`` deep-copied with
    each override applied to the optimization section. Validates that
    only SWEEPABLE_KEYS are touched and that the variants stay
    structurally compatible with the base (is_vae, swap_features)."""
    if not overrides:
        raise ValueError("a sweep needs at least one variant")
    base_kl = float(base_config["optimization"].get("kl_weight", 0.0))
    swap = bool(base_config["data"].get("swap_features", False))
    variants = []
    for i, ov in enumerate(overrides):
        bad = sorted(set(ov) - set(SWEEPABLE_KEYS))
        if bad:
            raise ValueError(
                f"variant {i} sweeps non-sweepable key(s) {bad}; a sweep "
                f"may vary only {list(SWEEPABLE_KEYS)} — other keys change "
                "the compiled program's structure (run them as separate "
                "train.py runs)")
        cfg = copy.deepcopy(base_config)
        cfg["optimization"].update({k: float(v) for k, v in ov.items()})
        kl = float(cfg["optimization"].get("kl_weight", 0.0))
        if base_kl == 0.0 and kl > 0.0:
            raise ValueError(
                f"variant {i} sets kl_weight {kl} > 0 but the base config "
                "is an AE (kl_weight 0): the VAE logvar head does not "
                "exist in the shared program. Sweep kl_weight from a "
                "VAE base config instead")
        if base_kl > 0.0 and kl == 0.0:
            raise ValueError(
                f"variant {i} sets kl_weight 0 under a VAE base config: "
                "the variant would train as a VAE (logvar head + "
                "sampling) but its config snapshot would rebuild an AE, "
                "breaking checkpoint resume — and no solo train.py "
                "equivalent exists. Sweep kl_weight among values > 0, or "
                "run the AE as its own train.py run")
        lc = float(cfg["optimization"].get("latent_consistency_weight", 0.0))
        if lc > 0 and not swap:
            raise ValueError(
                f"variant {i}: latent_consistency_weight > 0 requires "
                "data.swap_features: true in the base config")
        variants.append(cfg)
    return variants


def stack_hyperparams(variant_configs: list[dict]) -> dict:
    """The vmapped hyperparameter pytree: per-variant [K] arrays for the
    optimizer (lr, weight_decay) and a LossWeights whose fields are [K]
    arrays (LossWeights is a registered pytree for exactly this)."""
    def col(key, default=0.0):
        return jnp.asarray([float(c["optimization"].get(key, default))
                            for c in variant_configs], jnp.float32)

    weights = [LossWeights.from_config(c["optimization"],
                                       c.get("classifier"))
               for c in variant_configs]
    stacked = LossWeights(*[
        jnp.asarray([getattr(w, f) for w in weights], jnp.float32)
        for f in ("kl", "laplacian", "latent_consistency", "eta1", "eta2",
                  "classification")])
    return {"lr": col("lr", 1e-4), "weight_decay": col("weight_decay"),
            "weights": stacked}


def _sweep_optimizer(lr, weight_decay):
    """The one optimizer shape every variant shares: torch-style coupled
    L2 ahead of Adam (trainer.coupled_adam's wd > 0 branch), taking lr /
    wd as (possibly traced) scalars. At wd == 0 the decay transform adds
    ``0.0 * p`` — bit-exact no-op — so plain-adam variants ride the same
    structure."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.adam(lr))


def init_sweep_state(config: SDVAEConfig, geom: SpiralGeometry,
                     n_variants: int, seed: int = 0) -> TrainState:
    """Stacked TrainState: K copies of ONE init (ModelManager's seed
    contract: ``k_net, _ = split(PRNGKey(seed))``) — every variant starts
    from identical parameters so the sweep isolates the hyperparameters.
    opt_state takes the shared sweep-optimizer structure."""
    if int(n_variants) < 1:
        raise ValueError(f"n_variants must be >= 1; got {n_variants}")
    k_net, _ = jax.random.split(jax.random.PRNGKey(int(seed)))
    params = init_sdvae(k_net, config, geom)
    opt_state = _sweep_optimizer(0.0, 0.0).init(params)
    k = int(n_variants)
    stack = jax.tree.map(lambda l: jnp.stack([l] * k), (params, opt_state))
    return TrainState(params=stack[0], opt_state=stack[1])


def make_sweep_scanned_epochs(config: SDVAEConfig, batch_size: int,
                              swap: bool = True):
    """K variants × (E epochs × (train steps + per-epoch validation)) in
    ONE compiled dispatch: ``vmap`` of the production multi-epoch nested
    scan over the variant axis of (state, hyperparams); geometry, the
    resident splits, the index plans AND the epoch key broadcast — every
    variant consumes the identical data/noise stream.

    fn(state_K, hp, geom, train_x, val_x, tr_idx [E,St,B], tr_sid [E,St],
       va_idx [E,Sv,B], va_sid [E,Sv], tr_labels, va_labels,
       class_weights, key)
      → (state_K, train_metrics [K,E] per key, val_metrics [K,E] per key)

    ``hp`` is stack_hyperparams' pytree. Same argument contract as
    training.make_scanned_train_epochs with the hp arg inserted and a
    leading K axis on state/metrics."""

    def one(state, hp, geom, train_x, val_x, tr_idx, tr_sid, va_idx,
            va_sid, tr_labels, va_labels, class_weights, key):
        # building the raw scan INSIDE the traced function lets the
        # per-variant traced scalars (loss weights, lr, wd) close over
        # it — the structure decisions stay static via
        # trainer._structurally_active
        opt = _sweep_optimizer(hp["lr"], hp["weight_decay"])
        raw = _build_raw_scanned_epochs(config, hp["weights"], opt,
                                        batch_size, swap)
        return raw(state, geom, train_x, val_x, tr_idx, tr_sid, va_idx,
                   va_sid, tr_labels, va_labels, class_weights, key)

    vfn = jax.vmap(one, in_axes=(0, 0) + (None,) * 11)
    return jax.jit(vfn, donate_argnums=(0,))


def n_variants(state: TrainState) -> int:
    """Variant count of a stacked state (leading axis of any leaf)."""
    return int(jax.tree_util.tree_leaves(state.params)[0].shape[0])


def variant_state(state: TrainState, i: int,
                  weight_decay: float = 0.0) -> TrainState:
    """Variant i's plain TrainState, with opt_state converted to the
    structure the variant's OWN config would build (coupled_adam:
    ``chain(add_decayed_weights, adam)`` when weight_decay > 0, plain
    ``adam`` otherwise) — so a checkpoint saved from it resumes under
    ``train.py`` with that variant's config."""
    k = n_variants(state)
    if not 0 <= int(i) < k:
        raise IndexError(f"variant {i} out of range for a {k}-variant "
                         "state")
    params, opt_state = jax.tree.map(
        lambda leaf: leaf[int(i)], (state.params, state.opt_state))
    if not float(weight_decay) > 0:
        # drop the add_decayed_weights EmptyState: coupled_adam(lr, 0)
        # IS optax.adam, whose state is the chain's second element
        opt_state = opt_state[1]
    return TrainState(params=params, opt_state=opt_state,
                      epoch=state.epoch)
