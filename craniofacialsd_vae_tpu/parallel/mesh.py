"""Device meshes and sharding layout.

The reference is strictly single-GPU (SURVEY.md §2C: no torch.distributed
anywhere); scaling here is first-class and TPU-native: a 1-D `data` mesh axis
over ICI carries data parallelism (the swap-grid batch is embarrassingly
parallel), gradients are combined with psum — the XLA-collective equivalent
of DDP/NCCL allreduce, inserted by the compiler. The model (~1M params) is
far too small for tensor/pipeline parallelism; the natural second axis for
very large templates is vertex-dim sharding with ppermute halo exchange
(mesh analog of context parallelism) — layered on the same Mesh when needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_data_mesh", "shard_batch", "replicate",
           "make_member_mesh", "shard_member_axis"]

DATA_AXIS = "data"

#: axis name for member-parallel training (deep ensembles / hyperparameter
#: sweeps): the vmapped member axis of training/{ensemble,sweep}.py sharded
#: over devices. Members share NO state, so the partitioned program has
#: zero collectives — scaling is embarrassingly parallel over ICI.
MEMBER_AXIS = "member"


def make_data_mesh(n_devices: int | None = None,
                   devices=None) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch [B_global, ...] sharded along the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, geometry constants) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_member_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D ``member`` mesh over the first n devices (default: all) — for
    sharding the K axis of a stacked ensemble/sweep state."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (MEMBER_AXIS,))


def shard_member_axis(mesh: Mesh, tree):
    """Place every leaf of a stacked member-axis pytree (ensemble/sweep
    TrainState, per-member epoch keys, per-variant hyperparameters)
    sharded along its leading K axis over the ``member`` mesh.

    The jitted vmapped trainers (training/ensemble.py, training/sweep.py)
    follow the input sharding — XLA partitions the program so each device
    trains K/n_devices members with no collectives (members are
    mathematically independent; see tests/test_member_sharding.py for the
    sharded-vs-unsharded parity pin). Broadcast operands (geometry, epoch
    plans, resident splits) are left unsharded and replicate.

    Every leaf's leading axis must be divisible by the mesh size —
    enforced loudly, since an uneven K would silently fall back to
    replication-heavy layouts."""
    n = mesh.devices.size
    sharding = NamedSharding(mesh, P(MEMBER_AXIS))

    def put(x):
        if x.ndim == 0 or x.shape[0] % n:
            raise ValueError(
                f"member-axis leaf of shape {x.shape} cannot shard over "
                f"{n} devices: the leading (member) axis must be a "
                f"multiple of the mesh size — pick K as a multiple of "
                f"{n}, or a smaller mesh (make_member_mesh(n_devices=...))")
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)
