"""Golden-value regression tests: fixed seeds + fixed inputs must keep
producing the same numbers (CPU platform, float64-free determinism)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_training import _tiny_geometry


class TestGoldenForward:
    def test_forward_values_stable(self):
        """Catch silent numerical regressions in init + forward: the first
        reconstruction values for a fixed seed/input are pinned."""
        from craniofacialsd_vae_tpu.models import (SDVAEConfig, forward,
                                                   init_sdvae)

        rng = np.random.default_rng(123)
        geom = _tiny_geometry(rng)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        params = init_sdvae(jax.random.PRNGKey(42), config, geom)
        n = geom.region_masks.shape[1]
        x = jnp.asarray(
            np.linspace(-1, 1, n * 2 * 3).reshape(n, 2, 3).astype(
                np.float32))
        out, z, mu, logvar = forward(params, geom, config, x)

        # structural invariants
        assert out.shape == (n, 2, 3)
        assert np.isfinite(np.asarray(out)).all()
        # pinned statistics (update deliberately if init/arch changes)
        got = np.array([float(jnp.mean(out)), float(jnp.std(out)),
                        float(jnp.mean(mu)), float(jnp.std(logvar))])
        expected_file = "tests/fixtures/golden_forward.npy"
        import os
        if not os.path.exists(expected_file):
            np.save(expected_file, got)
            pytest.skip("golden values recorded")
        expected = np.load(expected_file)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


class TestEighBackends:
    def test_lobpcg_matches_scipy(self):
        from craniofacialsd_vae_tpu.geometry.synthetic import \
            synthetic_template
        from craniofacialsd_vae_tpu.ops.eigh import \
            laplacian_eigendecomposition

        tpl = synthetic_template(subdivisions=2, n_regions=3)
        k = 6
        vals_s, vecs_s = laplacian_eigendecomposition(tpl, k,
                                                      backend="scipy")
        vals_l, vecs_l = laplacian_eigendecomposition(tpl, k,
                                                      backend="lobpcg")
        np.testing.assert_allclose(np.sort(vals_l), np.sort(vals_s),
                                   rtol=1e-2, atol=1e-3)

    def test_dense_matches_scipy_small(self):
        from craniofacialsd_vae_tpu.geometry.synthetic import \
            synthetic_template
        from craniofacialsd_vae_tpu.ops.eigh import \
            laplacian_eigendecomposition

        tpl = synthetic_template(subdivisions=2, n_regions=3)
        k = 5
        vals_s, _ = laplacian_eigendecomposition(tpl, k, backend="scipy")
        vals_d, vecs_d = laplacian_eigendecomposition(tpl, k, backend="tpu")
        np.testing.assert_allclose(np.sort(vals_d), np.sort(vals_s),
                                   rtol=1e-4, atol=1e-4)
        # eigenvectors satisfy L v = λ v
        from craniofacialsd_vae_tpu.ops.eigh import \
            unnormalized_laplacian_dense
        lap = unnormalized_laplacian_dense(tpl.num_vertices, tpl.edges)
        resid = lap @ vecs_d - vecs_d * vals_d[None, :]
        assert np.abs(resid).max() < 1e-3
