"""Data-parallel train-step edges (parallel/train_parallel.py)."""

import numpy as np
import pytest

import jax
import optax

from craniofacialsd_vae_tpu.models import SDVAEConfig, init_mlp, init_sdvae
from craniofacialsd_vae_tpu.parallel import (make_data_mesh,
                                             make_parallel_train_step)
from craniofacialsd_vae_tpu.training import LossWeights, create_train_state
from tests.test_training import _tiny_geometry


def test_labels_none_with_clf_optimizer():
    """An end2end-configured step must still accept labels=None (None is an
    empty pytree, so the sharded in_spec has no leaves to bind) — e.g. a
    validation pass without labels on an end2end run."""
    geom = _tiny_geometry(np.random.default_rng(0))
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = init_sdvae(k1, config, geom)
    clf = init_mlp(k2, 6, [8], 3)
    opt, copt = optax.adam(1e-3), optax.adam(1e-3)
    state = create_train_state(params, opt, clf, copt)
    mesh = make_data_mesh()
    weights = LossWeights(kl=1e-4, laplacian=0.0, latent_consistency=0.5)
    step = make_parallel_train_step(config, weights, opt, 2, mesh,
                                    swap=True, clf_optimizer=copt)
    n = geom.region_masks.shape[1]
    rng = np.random.default_rng(1)
    x = rng.normal(size=(mesh.devices.size * 2, n, 3)).astype(np.float32)

    state, m = step(state, geom, x, None, None, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["tot"]))

    # and with labels present the classification loss engages
    labels = np.zeros(mesh.devices.size * 2, np.int32)
    cw = np.ones(3, np.float32)
    state, m2 = step(state, geom, x, labels, cw, jax.random.PRNGKey(3))
    assert np.isfinite(float(m2["tot"]))


def _dp_setup(b=2, seed=0):
    import jax.numpy as jnp

    geom = _tiny_geometry(np.random.default_rng(seed))
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    opt = optax.adam(1e-3)
    weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
    mesh = make_data_mesh()
    n = geom.region_masks.shape[1]
    rng = np.random.default_rng(seed + 1)
    n_data = 12
    data = jnp.asarray(rng.normal(size=(n_data, n, 3)).astype(np.float32))

    def fresh_state():
        params = init_sdvae(jax.random.PRNGKey(7), config, geom)
        return create_train_state(params, opt)

    return geom, config, opt, weights, mesh, data, n_data, fresh_state


@pytest.mark.slow
class TestScannedParallel:
    """The host-free DP epoch (lax.scan inside shard_map) must be
    update-for-update identical to the per-step shard_map path — same
    psum'd gradients, same fold_in(step_id)∘fold_in(device) key
    schedule."""

    def test_scanned_epoch_matches_per_step(self):
        from craniofacialsd_vae_tpu.parallel import \
            make_scanned_parallel_step

        b = 2
        geom, config, opt, weights, mesh, data, n_data, fresh = _dp_setup()
        G = mesh.devices.size * b
        steps = 4
        rng = np.random.default_rng(3)
        idx = rng.integers(0, n_data, size=(steps, G)).astype(np.int32)
        key = jax.random.PRNGKey(11)
        data_np = np.asarray(data)

        step = make_parallel_train_step(config, weights, opt, b, mesh,
                                        swap=True)
        state_ref = fresh()
        ms_ref = []
        for i in range(steps):
            k = jax.random.fold_in(key, i + 1)
            state_ref, m = step(state_ref, geom, data_np[idx[i]], None,
                                None, k)
            ms_ref.append(float(m["tot"]))

        epoch = make_scanned_parallel_step(config, weights, opt, b, mesh,
                                           swap=True)
        state_s, m_s = epoch(fresh(), geom, data, idx,
                             np.arange(1, steps + 1), None, None, key)

        ref_leaves = jax.tree.leaves(state_ref.params)
        s_leaves = jax.tree.leaves(state_s.params)
        for a, c in zip(ref_leaves, s_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(float(m_s["tot"]), np.mean(ms_ref),
                                   rtol=1e-5)

    def test_scanned_epochs_match_sequential(self):
        """Multi-epoch (train + per-epoch validation) single-dispatch DP
        == sequential per-step train/eval with the manager's step-id
        schedule (val ids follow the epoch's train ids)."""
        from craniofacialsd_vae_tpu.parallel import (
            make_parallel_eval_step, make_scanned_parallel_epochs)

        b = 2
        geom, config, opt, weights, mesh, data, n_data, fresh = _dp_setup()
        G = mesh.devices.size * b
        E, St, Sv = 2, 3, 2
        rng = np.random.default_rng(5)
        tr_idx = rng.integers(0, n_data, size=(E, St, G)).astype(np.int32)
        va_idx = rng.integers(0, n_data, size=(E, Sv, G)).astype(np.int32)
        per = St + Sv
        e_ar = np.arange(E)[:, None]
        tr_sid = (1 + e_ar * per + np.arange(St)[None]).astype(np.int32)
        va_sid = (1 + e_ar * per + St + np.arange(Sv)[None]).astype(
            np.int32)
        key = jax.random.PRNGKey(13)
        data_np = np.asarray(data)

        step = make_parallel_train_step(config, weights, opt, b, mesh,
                                        swap=True)
        ev = make_parallel_eval_step(config, weights, b, mesh, swap=True)
        state_ref = fresh()
        va_ref = np.zeros(E)
        for e in range(E):
            for s in range(St):
                k = jax.random.fold_in(key, int(tr_sid[e, s]))
                state_ref, _ = step(state_ref, geom,
                                    data_np[tr_idx[e, s]], None, None, k)
            vals = []
            for s in range(Sv):
                k = jax.random.fold_in(key, int(va_sid[e, s]))
                m = ev(state_ref, geom, data_np[va_idx[e, s]], None,
                       None, k)
                vals.append(float(m["tot"]))
            va_ref[e] = np.mean(vals)

        epochs = make_scanned_parallel_epochs(config, weights, opt, b,
                                              mesh, swap=True)
        state_s, tr_m, va_m = epochs(
            fresh(), geom, data, data, tr_idx, tr_sid, va_idx, va_sid,
            None, None, None, key)

        for a, c in zip(jax.tree.leaves(state_ref.params),
                        jax.tree.leaves(state_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(va_m["tot"]), va_ref,
                                   rtol=1e-4)
