"""Vertex-dimension sharding: the halo-exchange forward must match the
unsharded model exactly, on an 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from craniofacialsd_vae_tpu.geometry import precompute_geometry
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template
    from craniofacialsd_vae_tpu.models import (SDVAEConfig, SpiralGeometry,
                                               init_sdvae)

    template = synthetic_template(subdivisions=3, n_regions=5)
    bundle = precompute_geometry(template, [2, 2], [5, 5], [1, 1])
    geom = SpiralGeometry.from_bundle(bundle)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=10)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    return template, bundle, geom, config, params


class TestGatherPlan:
    def test_sharded_gather_matches_take(self, setup):
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, GatherPlan, apply_gather)
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        template, *_ = setup
        n = template.num_vertices
        d = 8
        rng = np.random.default_rng(0)
        shard = -(-n // d)
        idx = rng.integers(0, n, size=shard * d)
        plan = GatherPlan.build(idx, n, d)
        tables = plan.tables()

        x = rng.normal(size=(shard * d, 3)).astype(np.float32)
        x[n:] = 0.0
        mesh = Mesh(np.array(jax.devices()[:d]), (VERTEX_AXIS,))

        out = shard_map(
            lambda t, x: apply_gather(t, x), mesh=mesh,
            in_specs=(P(VERTEX_AXIS), P(VERTEX_AXIS)),
            out_specs=P(VERTEX_AXIS), check_vma=False)(tables,
                                                       jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), x[idx], rtol=1e-6)

    def test_gather_plan_gradients(self, setup):
        """d(gather)/dx must flow through all_to_all correctly."""
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, GatherPlan, apply_gather)
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        template, *_ = setup
        n = template.num_vertices
        d = 4
        shard = -(-n // d)
        rng = np.random.default_rng(1)
        idx = rng.integers(0, n, size=shard * d)
        tables = GatherPlan.build(idx, n, d).tables()
        x = rng.normal(size=(shard * d, 2)).astype(np.float32)
        w = rng.normal(size=(shard * d, 2)).astype(np.float32)
        mesh = Mesh(np.array(jax.devices()[:d]), (VERTEX_AXIS,))

        def loss(x):
            def dev(t, x, w):
                out = apply_gather(t, x)
                return jax.lax.psum(jnp.sum(out * w), VERTEX_AXIS)

            return shard_map(dev, mesh=mesh,
                             in_specs=(P(VERTEX_AXIS), P(VERTEX_AXIS),
                                       P(VERTEX_AXIS)),
                             out_specs=P(), check_vma=False)(
                                 tables, x, jnp.asarray(w))

        g = jax.grad(loss)(jnp.asarray(x))
        ref = np.zeros_like(x)
        np.add.at(ref, idx, w)
        np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-5,
                                   atol=1e-6)


class TestVertexShardedForward:
    def test_gradients_match_unsharded(self, setup):
        """Parameter gradients through the halo-exchange forward equal the
        unsharded ones — the sharded model trains, not just infers."""
        from craniofacialsd_vae_tpu.models import forward
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from jax.sharding import Mesh

        template, bundle, geom, config, params = setup
        n = template.num_vertices
        rng = np.random.default_rng(7)
        x = rng.normal(size=(n, 2, 3)).astype(np.float32)

        def loss_ref(params):
            out, _, mu, _ = forward(params, geom, config, jnp.asarray(x))
            return jnp.mean(out ** 2) + jnp.mean(mu ** 2)

        g_ref = jax.grad(loss_ref)(params)

        d = 4
        mesh = Mesh(np.array(jax.devices()[:d]), (VERTEX_AXIS,))
        model = VertexShardedModel(bundle, config, mesh)
        fwd = model.make_forward()
        x_sharded = jnp.asarray(model.shard_vertices(x))

        def loss_sharded(params):
            out, mu, _ = fwd(params, x_sharded)
            # slice away the padded rows — their values are unspecified
            return jnp.mean(out[:n] ** 2) + jnp.mean(mu ** 2)

        g_shard = jax.grad(loss_sharded)(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5),
            g_ref, g_shard)

    def test_train_step_matches_unsharded(self, setup):
        """One full vertex-sharded training step (swap + recon + KL +
        Laplacian + latent-consistency losses + Adam) produces the same
        parameter update as the unsharded step on 8 virtual devices."""
        import optax

        from craniofacialsd_vae_tpu.models import SpiralGeometry
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state)
        from craniofacialsd_vae_tpu.training.trainer import make_train_step
        from jax.sharding import Mesh

        template, bundle, geom, config, params = setup
        n = template.num_vertices
        b = 3
        weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
        opt = optax.adam(1e-2)
        key = jax.random.PRNGKey(11)
        rng = np.random.default_rng(5)
        x = rng.normal(size=(b, n, 3)).astype(np.float32)

        ref_step = make_train_step(config, weights, opt, batch_size=b,
                                   swap=True)
        # the jitted step donates its input state — hand it a copy so the
        # module-scoped fixture params stay alive for later tests
        ref_state = create_train_state(
            jax.tree.map(jnp.array, params), opt)
        ref_state, ref_metrics = ref_step(ref_state, geom, jnp.asarray(x),
                                          None, None, key)

        d = 8
        mesh = Mesh(np.array(jax.devices()[:d]), (VERTEX_AXIS,))
        model = VertexShardedModel(bundle, config, mesh)
        step = model.make_train_step(weights, opt, batch_size=b, swap=True)
        state = create_train_state(params, opt)
        x_vm = np.swapaxes(x, 0, 1)                     # vertex-major
        x_sharded = jnp.asarray(model.shard_vertices(x_vm))
        state, metrics = step(state, x_sharded, key)

        for k in ("reconstruction", "kl", "laplacian", "latent_consistency",
                  "tot"):
            np.testing.assert_allclose(float(metrics[k]),
                                       float(ref_metrics[k]),
                                       rtol=2e-3, atol=1e-6,
                                       err_msg=k)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=3e-5),
            ref_state.params, state.params)

    def test_2d_mesh_composes_dp_with_vertex_sharding(self, setup):
        """The same vertex-sharded step on a 2-D (data × vertex) mesh must
        equal pure data-parallel training (make_parallel_train_step):
        vertex shards psum partitioned loss terms, data shards pmean
        gradients — one compiled program composing DP with the SP/CP
        analog."""
        import optax

        from craniofacialsd_vae_tpu.parallel import (make_data_mesh,
                                                     make_parallel_train_step)
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state)
        from jax.sharding import Mesh

        template, bundle, geom, config, params = setup
        n = template.num_vertices
        b, d_data, d_vert = 2, 2, 4
        weights = LossWeights(kl=1e-4, laplacian=0.1,
                              latent_consistency=0.5)
        opt = optax.adam(1e-2)
        key = jax.random.PRNGKey(13)
        rng = np.random.default_rng(6)
        x = rng.normal(size=(d_data * b, n, 3)).astype(np.float32)

        # oracle: pure DP over a 2-device data mesh
        dp_mesh = make_data_mesh(d_data)
        dp_step = make_parallel_train_step(config, weights, opt,
                                           batch_size=b, mesh=dp_mesh)
        dp_state = create_train_state(jax.tree.map(jnp.array, params), opt)
        dp_state, dp_metrics = dp_step(dp_state, geom, jnp.asarray(x),
                                       None, None, key)

        # composed: 2 data shards × 4 vertex shards
        mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(d_data, d_vert),
                      ("data", VERTEX_AXIS))
        model = VertexShardedModel(bundle, config, mesh2d)
        assert model.n_devices == d_vert and model.data_axis == "data"
        step = model.make_train_step(weights, opt, batch_size=b, swap=True)
        state = create_train_state(jax.tree.map(jnp.array, params), opt)
        x_vm = np.swapaxes(x, 0, 1)              # [N, d_data·B, 3]
        x_sharded = jnp.asarray(model.shard_vertices(x_vm))
        state, metrics = step(state, x_sharded, key)

        for k in ("reconstruction", "kl", "laplacian",
                  "latent_consistency", "tot"):
            np.testing.assert_allclose(float(metrics[k]),
                                       float(dp_metrics[k]),
                                       rtol=2e-3, atol=1e-6,
                                       err_msg=k)
        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-3, atol=3e-5),
            dp_state.params, state.params)

    def test_matches_unsharded(self, setup):
        from craniofacialsd_vae_tpu.models import forward
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from jax.sharding import Mesh

        template, bundle, geom, config, params = setup
        n = template.num_vertices
        b = 3
        rng = np.random.default_rng(2)
        x = rng.normal(size=(n, b, 3)).astype(np.float32)

        out_ref, z_ref, mu_ref, logvar_ref = forward(
            params, geom, config, jnp.asarray(x))

        d = 8
        mesh = Mesh(np.array(jax.devices()[:d]), (VERTEX_AXIS,))
        model = VertexShardedModel(bundle, config, mesh)
        fwd = model.make_forward()
        x_sharded = model.shard_vertices(x)
        out, mu, logvar = fwd(params, jnp.asarray(x_sharded))

        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logvar),
                                   np.asarray(logvar_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out)[:n],
                                   np.asarray(out_ref),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
class TestScannedVertexEpochs:
    """Host-free epochs on the vertex-sharded (and 2-D composed) meshes:
    the scanned paths must match the per-step paths update-for-update
    (same fold_in(epoch_key, step_id) → fold_in(·, data_index) schedule)."""

    def _weights_opt(self):
        import optax

        from craniofacialsd_vae_tpu.training import LossWeights

        return (LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5),
                optax.adam(1e-2))

    def test_scanned_epoch_matches_per_step_2d(self, setup):
        """lax.scan inside the 2-D (data × vertex) shard_map equals the
        per-step composed path driven with per-step folded keys."""
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from craniofacialsd_vae_tpu.training import create_train_state
        from jax.sharding import Mesh

        template, bundle, geom, config, params = setup
        n = template.num_vertices
        b, d_data, d_vert = 2, 2, 4
        n_data, n_steps = 6, 3
        weights, opt = self._weights_opt()
        key = jax.random.PRNGKey(21)
        rng = np.random.default_rng(8)

        mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(d_data, d_vert),
                      ("data", VERTEX_AXIS))
        model = VertexShardedModel(bundle, config, mesh2d)
        data_vm = rng.normal(size=(n, n_data, 3)).astype(np.float32)
        padded = model.shard_vertices(data_vm)   # [D_v·S₀, n_data, 3]
        idx = rng.integers(0, n_data,
                           size=(n_steps, d_data * b)).astype(np.int32)

        # oracle: per-step composed path, per-step folded keys
        step = model.make_train_step(weights, opt, batch_size=b, swap=True)
        state_a = create_train_state(jax.tree.map(jnp.array, params), opt)
        for s in range(n_steps):
            k = jax.random.fold_in(key, s)
            x = jnp.asarray(padded[:, idx[s], :])
            state_a, m_a = step(state_a, x, k)

        # scanned: whole epoch in one dispatch
        epoch = model.make_scanned_epoch(weights, opt, batch_size=b,
                                         swap=True)
        state_b = create_train_state(jax.tree.map(jnp.array, params), opt)
        state_b, metrics = epoch(state_b, jnp.asarray(padded),
                                 jnp.asarray(idx),
                                 jnp.arange(n_steps, dtype=jnp.int32), key)

        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=2e-6),
            state_a.params, state_b.params)
        # metrics are averaged over steps — finite and keyed like per-step
        for k in ("reconstruction", "kl", "laplacian",
                  "latent_consistency", "tot"):
            assert np.isfinite(float(metrics[k])), k

    def test_scanned_epoch_matches_per_step_1d(self, setup):
        """Same parity on the pure vertex mesh (no data axis)."""
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from craniofacialsd_vae_tpu.training import create_train_state
        from jax.sharding import Mesh

        template, bundle, geom, config, params = setup
        n = template.num_vertices
        b, n_data, n_steps = 2, 5, 2
        weights, opt = self._weights_opt()
        key = jax.random.PRNGKey(23)
        rng = np.random.default_rng(9)

        mesh = Mesh(np.array(jax.devices()[:4]), (VERTEX_AXIS,))
        model = VertexShardedModel(bundle, config, mesh)
        data_vm = rng.normal(size=(n, n_data, 3)).astype(np.float32)
        padded = model.shard_vertices(data_vm)
        idx = rng.integers(0, n_data, size=(n_steps, b)).astype(np.int32)

        step = model.make_train_step(weights, opt, batch_size=b, swap=True)
        state_a = create_train_state(jax.tree.map(jnp.array, params), opt)
        for s in range(n_steps):
            k = jax.random.fold_in(key, s)
            state_a, _ = step(state_a, jnp.asarray(padded[:, idx[s], :]), k)

        epoch = model.make_scanned_epoch(weights, opt, batch_size=b,
                                         swap=True)
        state_b = create_train_state(jax.tree.map(jnp.array, params), opt)
        state_b, _ = epoch(state_b, jnp.asarray(padded), jnp.asarray(idx),
                           jnp.arange(n_steps, dtype=jnp.int32), key)

        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=2e-6),
            state_a.params, state_b.params)

    def test_scanned_multi_epoch_2d_runs(self, setup):
        """Multi-epoch (train + per-epoch validation) nested scan on the
        composed mesh: one dispatch, finite [E]-shaped metrics, and the
        train trajectory equals E sequential single-epoch dispatches."""
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from craniofacialsd_vae_tpu.training import create_train_state
        from jax.sharding import Mesh

        template, bundle, geom, config, params = setup
        n = template.num_vertices
        b, d_data, d_vert = 2, 2, 4
        n_data, E, St, Sv = 6, 2, 2, 1
        weights, opt = self._weights_opt()
        key = jax.random.PRNGKey(29)
        rng = np.random.default_rng(10)

        mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(d_data, d_vert),
                      ("data", VERTEX_AXIS))
        model = VertexShardedModel(bundle, config, mesh2d)
        data_vm = rng.normal(size=(n, n_data, 3)).astype(np.float32)
        padded = jnp.asarray(model.shard_vertices(data_vm))
        G = d_data * b
        tr_idx = rng.integers(0, n_data, size=(E, St, G)).astype(np.int32)
        va_idx = rng.integers(0, n_data, size=(E, Sv, G)).astype(np.int32)
        per = St + Sv
        e_ar = np.arange(E)[:, None]
        tr_sid = (e_ar * per + np.arange(St)[None]).astype(np.int32)
        va_sid = (e_ar * per + St + np.arange(Sv)[None]).astype(np.int32)

        epochs = model.make_scanned_epochs(weights, opt, batch_size=b,
                                           swap=True)
        state = create_train_state(jax.tree.map(jnp.array, params), opt)
        state, tr_m, va_m = epochs(state, padded, padded,
                                   jnp.asarray(tr_idx),
                                   jnp.asarray(tr_sid),
                                   jnp.asarray(va_idx),
                                   jnp.asarray(va_sid), key)
        assert np.asarray(tr_m["tot"]).shape == (E,)
        assert np.asarray(va_m["tot"]).shape == (E,)
        assert np.all(np.isfinite(np.asarray(tr_m["tot"])))
        assert np.all(np.isfinite(np.asarray(va_m["tot"])))

        # oracle: E sequential single-epoch scans with the same step ids
        epoch = model.make_scanned_epoch(weights, opt, batch_size=b,
                                         swap=True)
        state_o = create_train_state(jax.tree.map(jnp.array, params), opt)
        for e in range(E):
            state_o, _ = epoch(state_o, padded, jnp.asarray(tr_idx[e]),
                               jnp.asarray(tr_sid[e]), key)
        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=5e-4, atol=2e-6),
            state_o.params, state.params)
