"""Data-parallel train step: shard_map over the `data` mesh axis.

Each device holds a replica of the params and builds the full B×B swap grid
of its *local* B meshes (the swap grid must not cross devices — mixing would
all-gather vertices over ICI for no benefit; independent per-device grids
are the natural DP semantics and richer training signal). Gradients and
metrics are pmean'd over ICI; the optimizer update runs redundantly per
replica on identical values, keeping params in lockstep.

Per-device RNG: the step key is folded with the device index so
reparameterization noise (and the sampled swap region) decorrelate across
replicas.
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.sdvae import SDVAEConfig
from ..training.trainer import LossWeights, make_train_step
from .mesh import DATA_AXIS

__all__ = ["make_parallel_train_step", "make_parallel_eval_step",
           "make_scanned_parallel_step", "make_scanned_parallel_epochs"]


def make_parallel_train_step(config: SDVAEConfig, weights: LossWeights,
                             optimizer, batch_size: int, mesh: Mesh,
                             swap: bool = True, clf_optimizer=None):
    """Returns jitted step(state, geom, x [n_dev·B, N, 3], labels|None,
    class_weights|None, key) → (state, metrics).

    state/geom replicated; x sharded along the data axis; metrics pmean'd.
    """
    inner = make_train_step(config, weights, optimizer, batch_size,
                            swap=swap, clf_optimizer=clf_optimizer,
                            axis_name=DATA_AXIS)

    def device_step(state, geom, x, labels, class_weights, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return inner(state, geom, x, labels, class_weights, key)

    rep = P()
    sharded = P(DATA_AXIS)
    step = shard_map(
        device_step, mesh=mesh,
        in_specs=(rep, rep, sharded,
                  sharded if clf_optimizer is not None else rep,
                  rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))


def make_scanned_parallel_step(config: SDVAEConfig, weights: LossWeights,
                               optimizer, batch_size: int, mesh: Mesh,
                               swap: bool = True, clf_optimizer=None):
    """Whole data-parallel epoch in ONE dispatch: `lax.scan` over the
    psum-allreduced train step, *inside* shard_map (collectives compile
    inside scan bodies; scan-outside-shard_map would re-enter the sharded
    region per step and re-admit per-step dispatch on real meshes).

    epoch(state, geom, data_x [n, N, 3], idx [S, G], step_ids [S],
          labels [S, G] | None, class_weights, key) → (state, metrics)

    G = n_devices × batch_size global batch columns; idx/labels are
    sharded along that axis so each device scans its own [S, B] slice of
    the plan against the replicated resident split. The scan body IS the
    single-chip one (training.trainer._build_raw_scanned_epoch) with
    axis_name=DATA_AXIS — same key schedule (fold_in(epoch_key, step_id)
    then fold_in(·, device_index), matching the per-step DP path) by
    construction, not by parallel maintenance.
    """
    from ..training.trainer import _build_raw_scanned_epoch

    epoch_body = _build_raw_scanned_epoch(config, weights, optimizer,
                                          batch_size, swap, clf_optimizer,
                                          axis_name=DATA_AXIS)

    rep = P()
    col_sharded = P(None, DATA_AXIS)       # [S, G] → local [S, B]
    epoch = shard_map(
        epoch_body, mesh=mesh,
        in_specs=(rep, rep, rep, col_sharded, rep,
                  col_sharded if clf_optimizer is not None else rep,
                  rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(epoch, donate_argnums=(0,))


def make_scanned_parallel_epochs(config: SDVAEConfig, weights: LossWeights,
                                 optimizer, batch_size: int, mesh: Mesh,
                                 swap: bool = True, clf_optimizer=None):
    """MULTI-epoch data-parallel training (train steps + per-epoch
    validation) in one dispatch — the shard_map analog of
    training.make_scanned_train_epochs (literally the same nested-scan
    body, _build_raw_scanned_epochs with axis_name=DATA_AXIS), with
    global-batch index/label columns sharded over the data axis:

    epochs_fn(state, geom, train_x, val_x, tr_idx [E, St, G], tr_sid,
              va_idx [E, Sv, G], va_sid, tr_labels|None, va_labels|None,
              class_weights, key)
      → (state, train_metrics [E], val_metrics [E])

    This is what keeps multi-chip training host-free: without it, DP fell
    back to per-step dispatch and re-paid the ~10×-of-compute host
    overhead the single-chip scan eliminated (docs/PERFORMANCE.md).
    """
    from ..training.trainer import _build_raw_scanned_epochs

    epochs_body = _build_raw_scanned_epochs(config, weights, optimizer,
                                            batch_size, swap,
                                            clf_optimizer,
                                            axis_name=DATA_AXIS)

    rep = P()
    col3 = P(None, None, DATA_AXIS)        # [E, S, G] → local [E, S, B]
    lab_spec = col3 if clf_optimizer is not None else rep
    epochs = shard_map(
        epochs_body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, col3, rep, col3, rep,
                  lab_spec, lab_spec, rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(epochs, donate_argnums=(0,))


def make_parallel_eval_step(config: SDVAEConfig, weights: LossWeights,
                            batch_size: int, mesh: Mesh, swap: bool = True,
                            with_labels: bool = False):
    """Sharded validation step: per-device losses pmean'd, no update."""
    from ..training.trainer import make_eval_step

    inner = make_eval_step(config, weights, batch_size, swap=swap)

    def device_step(state, geom, x, labels, class_weights, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        metrics = inner(state, geom, x, labels, class_weights, key)
        return jax.lax.pmean(metrics, DATA_AXIS)

    rep = P()
    sharded = P(DATA_AXIS)
    step = shard_map(
        device_step, mesh=mesh,
        in_specs=(rep, rep, sharded,
                  sharded if with_labels else rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    return jax.jit(step)
