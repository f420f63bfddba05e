"""Multi-host (DCN) data-parallel support.

The reference has no distributed training of any kind (SURVEY §2C); these
tests pin the multi-host recipe: per-host batch slicing, global-array
assembly over the virtual 8-device mesh, the MultihostBatchIterator wrapper
feeding the sharded train step, and a real (single-process)
jax.distributed.initialize round-trip in a subprocess.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from craniofacialsd_vae_tpu.parallel import (MultihostBatchIterator,
                                             global_batch_from_local,
                                             local_batch_slice,
                                             make_data_mesh)


class TestLocalBatchSlice:
    def test_single_process_full_slice(self):
        sl = local_batch_slice(32)
        assert sl == slice(0, 32)

    def test_simulated_four_processes(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        for pid in range(4):
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            sl = local_batch_slice(32)
            assert sl == slice(pid * 8, (pid + 1) * 8)

    def test_slices_tile_global_batch(self, monkeypatch):
        """Concatenating every host's slice reconstructs the global batch
        exactly once, in mesh device order."""
        monkeypatch.setattr(jax, "process_count", lambda: 8)
        covered = []
        for pid in range(8):
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            sl = local_batch_slice(16)
            covered.extend(range(sl.start, sl.stop))
        assert covered == list(range(16))


class TestGlobalBatchFromLocal:
    def test_values_and_sharding(self):
        mesh = make_data_mesh()
        n_dev = mesh.devices.size
        x = np.arange(n_dev * 2 * 3, dtype=np.float32).reshape(n_dev * 2, 3)
        arr = global_batch_from_local(mesh, x)
        assert arr.shape == (n_dev * 2, 3)
        np.testing.assert_array_equal(np.asarray(arr), x)
        # sharded along the data axis: each device holds 2 rows
        assert len(arr.sharding.device_set) == n_dev
        shard = next(iter(arr.addressable_shards))
        assert shard.data.shape == (2, 3)


class TestMultihostBatchIterator:
    def _arrays(self, n=24, verts=12):
        from craniofacialsd_vae_tpu.data.dataset import MeshArrays

        rng = np.random.default_rng(0)
        return MeshArrays(
            x=rng.normal(size=(n, verts, 3)).astype(np.float32),
            y=["a"] * n,
            age=np.zeros(n, np.float32),
            gender=["m"] * n,
            augmented=np.zeros(n, bool),
            names=[f"a_{i}.obj" for i in range(n)])

    def test_wraps_batches_as_global_arrays(self):
        from craniofacialsd_vae_tpu.data.dataset import BatchIterator

        mesh = make_data_mesh()
        n_dev = mesh.devices.size
        base = BatchIterator(self._arrays(), n_dev * 2, shuffle=False,
                             class2idx={"a": 0})
        it = MultihostBatchIterator(base, mesh)
        assert len(it) == len(base)
        batches = list(it)
        assert len(batches) > 0
        for b in batches:
            assert b["x"].shape[0] == n_dev * 2
            assert isinstance(b["x"], jax.Array)
            assert "labels" in b and b["labels"].shape == (n_dev * 2,)
        # single-process: global content equals the host batch content
        host = list(base)[0]
        np.testing.assert_array_equal(np.asarray(batches[0]["x"]), host["x"])

    @pytest.mark.slow
    def test_feeds_sharded_train_step(self):
        """run_epoch over a MultihostBatchIterator with the parallel step:
        the end-to-end --multihost path on one process."""
        import optax

        from craniofacialsd_vae_tpu.data.dataset import BatchIterator
        from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
        from craniofacialsd_vae_tpu.parallel import make_parallel_train_step
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state)
        from tests.test_training import _tiny_geometry

        from craniofacialsd_vae_tpu.models import SDVAEConfig

        geom = _tiny_geometry(np.random.default_rng(0))
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        mesh = make_data_mesh()
        n_dev = mesh.devices.size
        batch = 2
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        opt = optax.adam(1e-3)
        state = create_train_state(params, opt)
        weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
        step = make_parallel_train_step(config, weights, opt, batch, mesh,
                                        swap=True)

        n_verts = geom.region_masks.shape[1]
        arrays = self._arrays(n=n_dev * batch * 2, verts=n_verts)
        base = BatchIterator(arrays, n_dev * batch, shuffle=False)
        it = MultihostBatchIterator(base, mesh)
        for b in it:
            state, metrics = step(state, geom, b["x"], None, None,
                                  jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["tot"]))


@pytest.mark.slow
def test_distributed_initialize_single_process_smoke():
    """jax.distributed.initialize round-trip in a clean subprocess
    (coordinator on localhost, one process) — the launch path --multihost
    takes on each host."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from craniofacialsd_vae_tpu.parallel import (initialize_multihost,
    local_batch_slice, global_batch_from_local, make_data_mesh)
initialize_multihost("127.0.0.1:{port}", 1, 0)
assert jax.process_count() == 1 and jax.process_index() == 0
import numpy as np
mesh = make_data_mesh()
sl = local_batch_slice(8)
arr = global_batch_from_local(mesh, np.ones((8, 3), np.float32)[sl])
assert arr.shape == (8, 3)
print("MULTIHOST_OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                         capture_output=True, text=True, timeout=240,
                         env=env)
    assert "MULTIHOST_OK" in out.stdout, out.stderr[-2000:]
