"""TPU ops unit tests (run on the 8-device virtual CPU platform):
gather/ELL primitives vs numpy oracles, gradient correctness of the
scatter-free custom VJPs, spiral conv vs a dense reference formula."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def random_coo(rng, m, n, nnz_per_row):
    rows, cols, vals = [], [], []
    for r in range(m):
        k = rng.integers(1, nnz_per_row + 1)
        cs = rng.choice(n, size=k, replace=False)
        for c in cs:
            rows.append(r)
            cols.append(c)
            vals.append(rng.normal())
    return (np.array(rows), np.array(cols),
            np.array(vals, dtype=np.float32))


class TestEllMatmul:
    def test_forward_matches_dense(self, rng):
        from craniofacialsd_vae_tpu.ops import from_coo, ell_matmul

        m, n = 13, 29
        rows, cols, vals = random_coo(rng, m, n, 4)
        dense = np.zeros((m, n), np.float32)
        dense[rows, cols] = vals
        mat = from_coo(rows, cols, vals, (m, n))
        x = rng.normal(size=(n, 3, 5)).astype(np.float32)
        out = ell_matmul(mat, jnp.asarray(x))
        ref = np.einsum("mn,nbc->mbc", dense, x)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_gradient_matches_transpose(self, rng):
        from craniofacialsd_vae_tpu.ops import from_coo, ell_matmul

        m, n = 11, 17
        rows, cols, vals = random_coo(rng, m, n, 3)
        dense = np.zeros((m, n), np.float32)
        dense[rows, cols] = vals
        mat = from_coo(rows, cols, vals, (m, n))
        x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(m, 4)).astype(np.float32))

        g = jax.grad(lambda x: jnp.sum(ell_matmul(mat, x) * w))(x)
        ref = dense.T @ np.asarray(w)
        np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)

    def test_jit_and_vmap_compatible(self, rng):
        from craniofacialsd_vae_tpu.ops import from_coo, ell_matmul

        rows, cols, vals = random_coo(rng, 5, 7, 2)
        mat = from_coo(rows, cols, vals, (5, 7))
        x = jnp.asarray(rng.normal(size=(7, 2)).astype(np.float32))
        out1 = jax.jit(ell_matmul)(mat, x)
        out2 = ell_matmul(mat, x)
        np.testing.assert_allclose(out1, out2, rtol=1e-6)


class TestCappedEll:
    """Tiered transpose layout (traffic-optimal cap, sparse.capped_ell):
    correctness under extreme in-degree skew, where main + multiple
    overflow tiers are exercised."""

    def test_skewed_degrees_match_dense(self, rng):
        from craniofacialsd_vae_tpu.ops.sparse import capped_ell

        # one super-hub row (degree 200), a mid tail, many degree-1 rows —
        # forces the optimal cap well below k_max and ≥2 overflow tiers
        m, n = 64, 300
        rows, cols, vals = [], [], []
        degs = [200, 40, 40, 12] + [1] * (m - 4)
        for r, d in enumerate(degs):
            cs = rng.choice(n, size=d, replace=False)
            for c in cs:
                rows.append(r)
                cols.append(int(c))
                vals.append(float(rng.normal()))
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals, np.float32)
        ce = capped_ell(rows, cols, vals, m)
        assert ce.cols.shape[1] < 200        # cap bound well below k_max
        assert len(ce.tiers) >= 1
        dense = np.zeros((m, n), np.float32)
        dense[rows, cols] = vals
        x = rng.normal(size=(n, 7)).astype(np.float32)
        np.testing.assert_allclose(ce.apply(jnp.asarray(x)), dense @ x,
                                   rtol=1e-4, atol=1e-5)

    def test_row_traffic_not_worse_than_plain(self, rng):
        from craniofacialsd_vae_tpu.ops.sparse import capped_ell

        m, n = 32, 50
        rows, cols, vals = random_coo(rng, m, n, 6)
        # add a skewed tail
        extra = rng.choice(n, size=30, replace=False)
        rows = np.concatenate([rows, np.zeros(30, rows.dtype)])
        cols = np.concatenate([cols, extra])
        vals = np.concatenate([vals, rng.normal(size=30).astype(np.float32)])
        ce = capped_ell(rows, cols, vals, m)
        plain_rows = m * int(np.bincount(rows, minlength=m).max())
        tiered_rows = ce.cols.shape[0] * ce.cols.shape[1] + sum(
            oc.shape[0] * oc.shape[1] for _, oc, _ in ce.tiers)
        assert tiered_rows <= plain_rows

    def test_empty_and_uniform(self, rng):
        from craniofacialsd_vae_tpu.ops.sparse import capped_ell

        ce = capped_ell(np.array([], np.int64), np.array([], np.int64),
                        np.array([], np.float32), 4)
        x = jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32))
        np.testing.assert_allclose(ce.apply(x), np.zeros((4, 2)), atol=0)
        # perfectly uniform degrees → no tiers, exact ELL
        rows = np.repeat(np.arange(5), 3)
        cols = np.tile(np.arange(3), 5)
        vals = np.ones(15, np.float32)
        ce = capped_ell(rows, cols, vals, 5)
        assert ce.tiers == () and ce.cols.shape == (5, 3)


class TestGatherRows:
    def test_forward_and_backward(self, rng):
        from craniofacialsd_vae_tpu.ops import gather_op_from_idx, gather_rows

        n, m = 20, 35
        idx = rng.integers(0, n, size=m)
        op = gather_op_from_idx(idx, n)
        x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
        out = gather_rows(op, x)
        np.testing.assert_allclose(out, np.asarray(x)[idx], rtol=1e-6)

        w = jnp.asarray(rng.normal(size=(m, 6)).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(gather_rows(op, x) * w))(x)
        ref = np.zeros((n, 6), np.float32)
        np.add.at(ref, idx, np.asarray(w))
        np.testing.assert_allclose(g, ref, rtol=1e-5, atol=1e-5)


class TestSpiralConv:
    def test_matches_dense_reference(self, rng):
        """out[n] = concat_l x[spiral[n,l]] @ W + b — the reference formula
        (model.py:27-41), evaluated densely in numpy."""
        from craniofacialsd_vae_tpu.ops import (build_spiral_op,
                                                init_spiral_conv, spiral_conv)

        n, l, c_in, c_out, b = 30, 5, 4, 8, 3
        spirals = rng.integers(0, n, size=(n, l))
        op = build_spiral_op(spirals)
        params = init_spiral_conv(jax.random.PRNGKey(0), c_in, c_out, l)
        x = rng.normal(size=(n, b, c_in)).astype(np.float32)

        out = spiral_conv(params, jnp.asarray(x), op)

        gathered = x[spirals]                        # [N, L, B, C]
        gathered = np.moveaxis(gathered, 2, 1)       # [N, B, L, C]
        gathered = gathered.reshape(n, b, l * c_in)
        ref = gathered @ np.asarray(params["w"]) + np.asarray(params["b"])
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_gradients_match_autodiff_oracle(self, rng):
        """Custom gather-only VJP equals JAX autodiff of the naive formula."""
        from craniofacialsd_vae_tpu.ops import (build_spiral_op,
                                                init_spiral_conv, spiral_conv)

        n, l, c_in, c_out = 12, 3, 2, 4
        spirals = rng.integers(0, n, size=(n, l))
        op = build_spiral_op(spirals)
        params = init_spiral_conv(jax.random.PRNGKey(1), c_in, c_out, l)
        x = jnp.asarray(rng.normal(size=(n, 2, c_in)).astype(np.float32))
        sp = jnp.asarray(spirals)

        def naive(params, x):
            g = jnp.take(x, sp.reshape(-1), axis=0)
            g = g.reshape(n, l, x.shape[1], c_in)
            g = jnp.moveaxis(g, 1, 2).reshape(n, x.shape[1], l * c_in)
            return jnp.sum((g @ params["w"] + params["b"]) ** 2)

        def mine(params, x):
            return jnp.sum(spiral_conv(params, x, op) ** 2)

        g1 = jax.grad(naive, argnums=(0, 1))(params, x)
        g2 = jax.grad(mine, argnums=(0, 1))(params, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                    atol=1e-5), g1, g2)

    def test_grad_with_numpy_closure_params(self, rng):
        """Checkpoint-resume regression: params restored from msgpack are
        numpy arrays; closed over by a jitted grad-of-x function they
        become jaxpr Literals, whose __getitem__ rejects traced indices —
        the identity-column backward must not fancy-index w_l directly.
        Spirals start with the identity column (SpiralNet++ convention) to
        exercise the grouped backward path that failed."""
        from craniofacialsd_vae_tpu.ops import (build_spiral_op,
                                                init_spiral_conv,
                                                spiral_conv)

        n, l, c_in, c_out = 12, 4, 2, 3
        spirals = rng.integers(0, n, size=(n, l))
        spirals[:, 0] = np.arange(n)                 # identity position
        op = build_spiral_op(spirals)
        params = jax.tree.map(np.asarray, init_spiral_conv(
            jax.random.PRNGKey(2), c_in, c_out, l))  # numpy, like resume

        @jax.jit
        def grad_x(x):
            return jax.grad(
                lambda x: jnp.sum(spiral_conv(params, x, op) ** 2))(x)

        x = jnp.asarray(rng.normal(size=(n, 2, c_in)).astype(np.float32))
        g = grad_x(x)                                # must trace cleanly
        assert np.isfinite(np.asarray(g)).all()


class TestSpiralConvOutGather:
    """Matmul-first formulation (final decoder conv under bf16 policies):
    out = b + Σ_l (x @ W_l)[spiral[:, l]] must equal the gather-first
    spiral_conv — a gather moves values, it never rounds them."""

    def _build(self, rng, n=30, l=5, c_in=8, c_out=3, b=4, identity=True):
        from craniofacialsd_vae_tpu.ops import (build_spiral_op,
                                                init_spiral_conv)

        spirals = rng.integers(0, n, size=(n, l))
        if identity:
            spirals[:, 0] = np.arange(n)             # SpiralNet++ convention
        op = build_spiral_op(spirals)
        params = init_spiral_conv(jax.random.PRNGKey(3), c_in, c_out, l)
        x = rng.normal(size=(n, b, c_in)).astype(np.float32)
        return op, params, x

    def test_matches_gather_first_fp32(self, rng):
        from craniofacialsd_vae_tpu.ops import (spiral_conv,
                                                spiral_conv_out_gather)

        op, params, x = self._build(rng)
        ref = spiral_conv(params, jnp.asarray(x), op)
        out = spiral_conv_out_gather(params, jnp.asarray(x), op)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_bf16_matches_f32out_path(self, rng):
        """Same bf16 products, fp32 accumulation → agree to fp32 summation
        order; output is the unrounded fp32 accumulator in both forms."""
        from craniofacialsd_vae_tpu.ops import (spiral_conv,
                                                spiral_conv_out_gather)

        op, params, x = self._build(rng, identity=False)
        xb = jnp.asarray(x).astype(jnp.bfloat16)
        ref = spiral_conv(params, xb, op, out_dtype=jnp.float32)
        out = spiral_conv_out_gather(params, xb, op)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_gradients_match_autodiff_oracle(self, rng):
        """gather_rows' capped-transpose VJP composed with native einsum
        autodiff equals the gather-first custom VJP (fp32)."""
        from craniofacialsd_vae_tpu.ops import (spiral_conv,
                                                spiral_conv_out_gather)

        op, params, x = self._build(rng, n=12, l=4, c_in=5, c_out=2, b=2)
        x = jnp.asarray(x)

        def ref_loss(params, x):
            return jnp.sum(spiral_conv(params, x, op) ** 2)

        def og_loss(params, x):
            return jnp.sum(spiral_conv_out_gather(params, x, op) ** 2)

        g1 = jax.grad(ref_loss, argnums=(0, 1))(params, x)
        g2 = jax.jit(jax.grad(og_loss, argnums=(0, 1)))(params, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                    atol=1e-5), g1, g2)

    def test_decode_formulation_switch(self, rng):
        """decode() under the mixed policy uses the out-gather final conv;
        final_out_gather=False restores the gather-first form. Both must
        agree (fp32-summation-order tolerance) and stay fp32-precise."""
        import dataclasses

        from craniofacialsd_vae_tpu.models import (SDVAEConfig, decode,
                                                   init_sdvae)
        from tests.test_training import _tiny_geometry

        geom = _tiny_geometry(rng)
        cfg = SDVAEConfig(out_channels=(8, 16), latent_size=6,
                          compute_dtype="mixed")
        params = init_sdvae(jax.random.PRNGKey(0), cfg, geom)
        z = jnp.asarray(rng.normal(size=(3, cfg.latent_size))
                        .astype(np.float32))
        out_og = decode(params, geom, cfg, z)
        out_gf = decode(params, geom,
                        dataclasses.replace(cfg, final_out_gather=False), z)
        assert out_og.dtype == jnp.float32
        np.testing.assert_allclose(out_og, out_gf, rtol=1e-4, atol=1e-5)


class TestPool:
    def test_selection_pool(self, rng):
        from craniofacialsd_vae_tpu.geometry.simplify import SparseCOO
        from craniofacialsd_vae_tpu.ops import build_pool_operator, pool

        m, n = 6, 15
        sel = rng.choice(n, size=m, replace=False)
        coo = SparseCOO(rows=np.arange(m), cols=sel,
                        vals=np.ones(m, np.float32), shape=(m, n))
        op = build_pool_operator(coo)
        x = jnp.asarray(rng.normal(size=(n, 3, 2)).astype(np.float32))
        out = pool(x, op)
        np.testing.assert_allclose(out, np.asarray(x)[sel], rtol=1e-6)

    def test_barycentric_pool(self, rng):
        from craniofacialsd_vae_tpu.geometry.simplify import SparseCOO
        from craniofacialsd_vae_tpu.ops import build_pool_operator, pool

        m, n = 10, 4
        rows = np.repeat(np.arange(m), 3)
        cols = rng.integers(0, n, size=3 * m)
        vals = rng.normal(size=3 * m).astype(np.float32)
        coo = SparseCOO(rows=rows, cols=cols, vals=vals, shape=(m, n))
        dense = np.zeros((m, n), np.float32)
        np.add.at(dense, (rows, cols), vals)
        op = build_pool_operator(coo)
        x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
        out = pool(x, op)
        np.testing.assert_allclose(out, dense @ np.asarray(x),
                                   rtol=1e-4, atol=1e-5)
