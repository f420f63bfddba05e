"""Vertex-reordering utility tests (geometry/reorder.py).

The RCM experiment's validity rests on the relabeling being exact: the
permuted bundle must compute the SAME model function up to the vertex
relabeling, bit-for-bit. (End-to-end perf verdict: 0.999× — a wash; the
utility stays as the measured experiment's harness, not a product path.
benchmarks/reorder_ab.py, benchmarks/reorder_step_ab.py.)"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bundles():
    from craniofacialsd_vae_tpu.geometry import precompute_geometry
    from craniofacialsd_vae_tpu.geometry.reorder import (
        hierarchy_rcm_permutations, permute_bundle)
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template

    tpl = synthetic_template(subdivisions=3, n_regions=3)
    bundle = precompute_geometry(tpl, [2, 2], [5, 5], [1, 1])
    perms = hierarchy_rcm_permutations(bundle)
    return bundle, permute_bundle(bundle, perms), perms


def test_permutations_are_valid(bundles):
    bundle, permuted, perms = bundles
    counts = bundle.vertex_counts
    for p, n in zip(perms, counts):
        assert sorted(p) == list(range(n))
    # coarsest level keeps its native order (latent layout contract)
    np.testing.assert_array_equal(perms[-1], np.arange(counts[-1]))


def test_rcm_reduces_index_bandwidth(bundles):
    bundle, permuted, _ = bundles
    n = bundle.template.num_vertices

    def bandwidth(spirals):
        return np.abs(np.asarray(spirals)
                      - np.arange(n)[:, None]).mean()

    assert bandwidth(permuted.spirals[0]) < bandwidth(bundle.spirals[0])


def test_forward_bit_identical_under_relabeling(bundles):
    """Same params, permuted geometry, permuted input → permuted output
    and IDENTICAL latent — zero tolerance (pure relabeling, no
    reassociation)."""
    import jax
    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.models import (SDVAEConfig, SpiralGeometry,
                                               forward, init_sdvae)

    bundle, permuted, perms = bundles
    g0 = SpiralGeometry.from_bundle(bundle)
    g1 = SpiralGeometry.from_bundle(permuted)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    params = init_sdvae(jax.random.PRNGKey(0), config, g0)

    n = bundle.template.num_vertices
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(n, 2, 3)).astype(np.float32))
    p0 = np.asarray(perms[0])
    out0, _, mu0, lv0 = forward(params, g0, config, x)
    out1, _, mu1, lv1 = forward(params, g1, config, x[p0])
    np.testing.assert_array_equal(np.asarray(mu0), np.asarray(mu1))
    np.testing.assert_array_equal(np.asarray(lv0), np.asarray(lv1))
    np.testing.assert_array_equal(np.asarray(out0)[p0], np.asarray(out1))
