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

__all__ = ["make_data_mesh", "shard_batch", "replicate"]

DATA_AXIS = "data"


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
