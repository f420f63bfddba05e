"""Mixed-precision activation policy (compute_dtype="mixed"): level-0 ops
stay fp32, deeper levels run bf16. These tests pin the numerics contract:
outputs/gradients track the fp32 path within bf16 tolerance, params and
losses stay fp32, and training still converges."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_training import _tiny_geometry


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _setup(rng, compute_dtype):
    from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae

    geom = _tiny_geometry(rng)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6,
                         compute_dtype=compute_dtype)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    return geom, config, params


class TestMixedPrecision:
    def test_forward_tracks_fp32(self, rng):
        from craniofacialsd_vae_tpu.models import SDVAEConfig, forward

        geom, config, params = _setup(rng, "mixed")
        config32 = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        n = geom.region_masks.shape[1]
        x = jnp.asarray(rng.normal(size=(n, 5, 3)).astype(np.float32))

        out_m, z_m, mu_m, _ = forward(params, geom, config, x)
        out_f, z_f, mu_f, _ = forward(params, geom, config32, x)

        # fp32 outputs either way — bf16 only inside the deep levels
        assert out_m.dtype == jnp.float32
        assert mu_m.dtype == jnp.float32
        # bf16 has ~2^-8 relative precision; a few layers compound it
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_f),
                                   atol=5e-2, rtol=5e-2)
        np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_f),
                                   atol=5e-2, rtol=5e-2)

    @pytest.mark.slow
    def test_gradients_track_fp32(self, rng):
        """Cosine similarity of the full gradient pytree vs fp32 — the
        mixed backward (bf16 cotangents through the deep tables, fp32
        accumulation for dW/db) must preserve the descent direction."""
        from craniofacialsd_vae_tpu.models import SDVAEConfig, forward

        geom, config, params = _setup(rng, "mixed")
        config32 = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        n = geom.region_masks.shape[1]
        x = jnp.asarray(rng.normal(size=(n, 4, 3)).astype(np.float32))

        def loss(p, cfg):
            out, z, mu, logvar = forward(p, geom, cfg, x,
                                         key=jax.random.PRNGKey(3),
                                         training=True)
            return jnp.mean((out - x) ** 2) + 1e-4 * jnp.mean(mu ** 2)

        g_m = jax.grad(lambda p: loss(p, config))(params)
        g_f = jax.grad(lambda p: loss(p, config32))(params)

        lm, lf = jax.tree.leaves(g_m), jax.tree.leaves(g_f)
        for a, b in zip(lm, lf):
            assert a.dtype == jnp.float32  # master grads stay fp32
        va = np.concatenate([np.asarray(l).ravel() for l in lm])
        vb = np.concatenate([np.asarray(l).ravel() for l in lf])
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert cos > 0.999, f"gradient cosine {cos}"

    def test_train_step_converges(self, rng):
        import optax
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state,
                                                     make_train_step)

        geom, config, params = _setup(rng, "mixed")
        opt = optax.adam(1e-2)
        state = create_train_state(params, opt)
        weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
        b = 3
        step = make_train_step(config, weights, opt, batch_size=b, swap=True)
        n = geom.region_masks.shape[1]
        x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        key = jax.random.PRNGKey(2)
        first = None
        for i in range(30):
            state, metrics = step(state, geom, x, None, None,
                                  jax.random.fold_in(key, i))
            if first is None:
                first = float(metrics["tot"])
        assert float(metrics["tot"]) < first
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32

    def test_fp32_path_unchanged(self):
        """The mixed-policy cast points must be no-ops under the default
        float32 config. Golden fixture generated from the pre-mixed-policy
        code (commit f098a95, tests/fixtures/fp32_forward_golden.npz with
        deterministic geometry rng(11) / params PRNGKey(0) / input
        rng(77); committed to git — regenerate only from a worktree at
        that commit); any future edit that leaks a rounding into the fp32
        formulation moves the output by ≥bf16 eps (~4e-3) and trips the
        1e-6 tolerance."""
        import os

        from craniofacialsd_vae_tpu.models import (SDVAEConfig, forward,
                                                   init_sdvae)
        from tests.test_training import _tiny_geometry

        golden = np.load(os.path.join(os.path.dirname(__file__),
                                      "fixtures", "fp32_forward_golden.npz"))
        geom = _tiny_geometry(np.random.default_rng(11))
        config32 = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        params = init_sdvae(jax.random.PRNGKey(0), config32, geom)
        out, _, mu, logvar = forward(params, geom, config32,
                                     jnp.asarray(golden["x"]))
        np.testing.assert_allclose(np.asarray(out), golden["out"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(mu), golden["mu"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(logvar), golden["logvar"],
                                   rtol=1e-6, atol=1e-7)

    def test_mixed_recon_not_bf16_quantized(self, rng):
        """The final decoder conv must return its fp32 accumulator
        UNROUNDED under the mixed policy: if a trailing bf16 cast sneaks
        back in, every output value is exactly bf16-representable and this
        test fails."""
        from craniofacialsd_vae_tpu.models import forward

        geom, config, params = _setup(rng, "mixed")
        n = geom.region_masks.shape[1]
        x = jnp.asarray(rng.normal(size=(n, 4, 3)).astype(np.float32))
        out = np.asarray(forward(params, geom, config, x)[0])
        quantized = out.astype(jnp.bfloat16.dtype).astype(np.float32)
        frac = float(np.mean(out != quantized))
        assert frac > 0.5, (
            f"only {frac:.0%} of recon values carry sub-bf16 precision — "
            "the final conv output looks bf16-rounded")

    @pytest.mark.slow
    def test_data_parallel_scanned_epoch(self, rng):
        """The host-free DP epoch (lax.scan inside shard_map) must accept
        the mixed policy: bf16 activations per replica, fp32 psum'd grads,
        params in lockstep across devices."""
        import optax
        from craniofacialsd_vae_tpu.parallel import (
            make_data_mesh, make_scanned_parallel_step)
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state)

        geom, config, params = _setup(rng, "mixed")
        opt = optax.adam(1e-3)
        weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
        mesh = make_data_mesh()
        b = 2
        G = mesh.devices.size * b
        n = geom.region_masks.shape[1]
        n_data, steps = 12, 3
        data = jnp.asarray(
            np.asarray(rng.normal(size=(n_data, n, 3)), np.float32))
        idx = jnp.asarray(rng.integers(0, n_data, size=(steps, G)),
                          jnp.int32)
        epoch = make_scanned_parallel_step(config, weights, opt,
                                           batch_size=b, mesh=mesh)
        state = create_train_state(params, opt)
        state, m = epoch(state, geom, data, idx, 1 + jnp.arange(steps),
                         None, None, jax.random.PRNGKey(5))
        assert np.isfinite(float(m["tot"]))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32

    @pytest.mark.slow
    def test_vertex_sharded_mixed(self, rng):
        """The vertex-sharded (halo-exchange) model honors the mixed
        policy: its forward tracks the unsharded mixed forward, and a full
        sharded train step keeps fp32 params and finite losses — the halo
        gathers move bf16 rows, psum'd grads stay fp32."""
        import optax
        from jax.sharding import Mesh

        from craniofacialsd_vae_tpu.geometry import precompute_geometry
        from craniofacialsd_vae_tpu.geometry.synthetic import \
            synthetic_template
        from craniofacialsd_vae_tpu.models import (SDVAEConfig,
                                                   SpiralGeometry, forward,
                                                   init_sdvae)
        from craniofacialsd_vae_tpu.parallel.vertex_sharding import (
            VERTEX_AXIS, VertexShardedModel)
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state)

        template = synthetic_template(subdivisions=3, n_regions=5)
        bundle = precompute_geometry(template, [2, 2], [5, 5], [1, 1])
        geom = SpiralGeometry.from_bundle(bundle)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=10,
                             compute_dtype="mixed")
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)

        n = template.num_vertices
        x = rng.normal(size=(n, 2, 3)).astype(np.float32)
        out_ref, _, mu_ref, _ = forward(params, geom, config,
                                        jnp.asarray(x))

        d = 4
        mesh = Mesh(np.array(jax.devices()[:d]), (VERTEX_AXIS,))
        model = VertexShardedModel(bundle, config, mesh)
        fwd = model.make_forward()
        out_s, mu_s, _ = fwd(params, jnp.asarray(model.shard_vertices(x)))

        assert out_s.dtype == jnp.float32 and mu_s.dtype == jnp.float32
        # same policy on both sides; only the accumulation grouping differs
        np.testing.assert_allclose(np.asarray(out_s[:n]),
                                   np.asarray(out_ref),
                                   atol=3e-2, rtol=3e-2)
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_ref),
                                   atol=3e-2, rtol=3e-2)

        opt = optax.adam(1e-3)
        weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
        step = model.make_train_step(weights, opt, batch_size=2, swap=True)
        state = create_train_state(params, opt)
        xb = rng.normal(size=(n, 2, 3)).astype(np.float32)
        state, m = step(state, jnp.asarray(model.shard_vertices(xb)),
                        jax.random.PRNGKey(9))
        assert np.isfinite(float(m["tot"]))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32

    def test_from_dict_string_kl_weight(self):
        """pyyaml parses bare scientific notation ("1e-4") as a string;
        from_dict must coerce it when deciding is_vae (regression: the
        flagship yaml's kl_weight reached from_dict un-coerced via the
        bench/entry loaders)."""
        from craniofacialsd_vae_tpu.models import SDVAEConfig

        cfg = SDVAEConfig.from_dict(
            {"in_channels": 3, "out_channels": [8, 16], "latent_size": 6,
             "compute_dtype": "mixed"}, "1e-4")
        assert cfg.is_vae and cfg.compute_dtype == "mixed"
        assert not SDVAEConfig.from_dict(
            {"in_channels": 3, "out_channels": [8], "latent_size": 4},
            "0.0").is_vae

    def test_config_validation(self):
        from craniofacialsd_vae_tpu.utils import (DEFAULT_CONFIG,
                                                  validate_config)
        import copy

        cfg = copy.deepcopy(DEFAULT_CONFIG)
        cfg["model"]["compute_dtype"] = "mixed"
        validate_config(cfg)
        cfg["model"]["compute_dtype"] = "fp16"
        with pytest.raises(ValueError, match="compute_dtype"):
            validate_config(cfg)
