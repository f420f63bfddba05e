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

__all__ = ["make_parallel_train_step", "make_parallel_eval_step"]


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
