"""Multi-host (DCN) training support.

The reference is single-process/single-GPU. Here multi-host runs follow the
standard JAX recipe: `jax.distributed.initialize` connects the hosts, the
global mesh spans all devices, each host feeds its local shard of the global
batch, and `make_array_from_process_local_data` assembles global arrays.
Data parallelism is the only axis that crosses DCN (the model is ~1M params;
gradients all-reduce over ICI within each slice and over DCN across slices,
which XLA handles from the same psum).
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["initialize_multihost", "local_batch_slice",
           "global_batch_from_local", "MultihostBatchIterator"]


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Connect this host to the jax.distributed cluster. No-ops when the
    environment provides the configuration (TPU pods auto-configure)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def local_batch_slice(global_batch_size: int) -> slice:
    """The slice of each global batch this host is responsible for loading
    (contiguous block per process, matching mesh device order)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch_from_local(mesh, local_array: np.ndarray):
    """Assemble a globally-sharded array from this host's local shard
    (jax.make_array_from_process_local_data over the data axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local_array)


class MultihostBatchIterator:
    """Per-host view of a global batch stream.

    Wraps a deterministic host-side iterator built with the GLOBAL batch
    size (same seed on every process → identical shuffle order everywhere,
    the multi-host analog of the reference's single-process DataLoader).
    Each process keeps only its `local_batch_slice` of every batch and
    assembles device-global arrays for the sharded train step; all other
    keys stay host-local metadata. Under a single process this degrades to
    plain sharded batches, which is what the unit tests and the
    single-host `--multihost` smoke path exercise.
    """

    def __init__(self, base_iter, mesh):
        self.base = base_iter
        self.mesh = mesh
        self.batch_size = base_iter.batch_size   # global

    @property
    def drop_last(self):
        return getattr(self.base, "drop_last", False)

    def __len__(self):
        return len(self.base)

    def epoch_plan(self):
        """Scanned-epoch plan (see BatchIterator.epoch_plan). Every
        process computes the identical plan (same seed → same shuffle);
        the shard_map'd scanned step shards the global-batch index
        columns over the mesh, so each process's devices scan only their
        slice — no per-step host involvement across DCN."""
        return self.base.epoch_plan()

    def ordered_batches(self):
        """Deterministic non-RNG-consuming pass over the base iterator's
        host-local arrays (see _BatchIteratorBase.ordered_batches) — for
        single-process out-of-band evaluation only."""
        return self.base.ordered_batches()

    def __iter__(self):
        sl = local_batch_slice(self.batch_size)
        for batch in self.base:
            if batch["x"].shape[0] != self.batch_size:
                continue   # drop_last across hosts must agree
            out = dict(batch)
            out["x"] = global_batch_from_local(
                self.mesh, np.ascontiguousarray(batch["x"][sl]))
            if "labels" in batch:
                out["labels"] = global_batch_from_local(
                    self.mesh, np.ascontiguousarray(batch["labels"][sl]))
            yield out
