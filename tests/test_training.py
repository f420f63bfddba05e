"""Swap transform, losses, and train-step tests against loop-based oracles
that implement the reference semantics directly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


class TestSwap:
    def test_grid_matches_reference_loops(self, rng):
        """Vectorized on-device swap == the reference's nested python loops
        (swap_batch_transform.py:27-38)."""
        from craniofacialsd_vae_tpu.data import swap_features

        b, n = 4, 20
        x = rng.normal(size=(b, n, 3)).astype(np.float32)
        mask = rng.random(n) < 0.3

        # reference oracle
        ref = np.zeros((b * b, n, 3), np.float32)
        feature_idxs = np.where(mask)[0]
        for j in range(b):
            for i in range(b):
                if i == j:
                    ref[i * b + j] = x[i]
                else:
                    v = x[i].copy()
                    v[feature_idxs] = x[j][feature_idxs]
                    ref[i * b + j] = v

        x_vm = jnp.asarray(np.swapaxes(x, 0, 1))          # [N, B, 3]
        out = swap_features(x_vm, jnp.asarray(mask))      # [N, B², 3]
        out = np.swapaxes(np.asarray(out), 0, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_diagonal_is_identity(self, rng):
        from craniofacialsd_vae_tpu.data import swap_features

        b, n = 3, 10
        x = rng.normal(size=(n, b, 3)).astype(np.float32)
        mask = rng.random(n) < 0.5
        out = swap_features(jnp.asarray(x), jnp.asarray(mask))
        for i in range(b):
            np.testing.assert_allclose(out[:, i * b + i], x[:, i])


class TestLosses:
    def test_kl(self, rng):
        from craniofacialsd_vae_tpu.training import kl_divergence_loss

        mu = rng.normal(size=(6, 10)).astype(np.float32)
        logvar = rng.normal(size=(6, 10)).astype(np.float32)
        ref = np.mean(-0.5 * np.sum(
            1 + logvar - mu ** 2 - np.exp(logvar), axis=1))
        out = kl_divergence_loss(jnp.asarray(mu), jnp.asarray(logvar))
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_laplacian(self, rng):
        from craniofacialsd_vae_tpu.ops import from_coo
        from craniofacialsd_vae_tpu.training import laplacian_loss

        n, b = 12, 4
        dense = rng.normal(size=(n, n)).astype(np.float32) * \
            (rng.random((n, n)) < 0.3)
        rows, cols = np.nonzero(dense)
        mat = from_coo(rows, cols, dense[rows, cols], (n, n))
        pred = rng.normal(size=(b, n, 3)).astype(np.float32)

        # reference oracle (model_manager.py:343-349)
        lx = np.einsum("mn,bnc->bmc", dense, pred)
        ref = (np.linalg.norm(lx, axis=-1) / n).sum() / b

        pred_vm = jnp.asarray(np.moveaxis(pred, 0, 1))
        out = laplacian_loss(mat, pred_vm)
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_latent_consistency_matches_reference_math(self, rng):
        """Masked-vectorized loss == direct loop implementation of
        model_manager.py:360-393."""
        from craniofacialsd_vae_tpu.training import (latent_consistency_loss,
                                                     region_feature_mask)

        bs, latent, n_regions = 4, 30, 5
        region = 2
        eta1, eta2 = 0.5, 0.25
        z = rng.normal(size=(bs * bs, latent)).astype(np.float32)

        size = latent // n_regions
        lo, hi = region * size, (region + 1) * size
        zf = z[:, lo:hi].reshape(bs, bs, -1)
        ze = np.concatenate([z[:, :lo], z[:, hi:]], axis=1) \
            .reshape(bs, bs, -1)

        pairs = [(a, c) for a in range(bs) for c in range(a + 1, bs)]
        lg = np.array([((zf[a] - zf[c]) ** 2).sum(-1)
                       for a, c in pairs]).reshape(-1)
        dg = np.array([((zf[:, a] - zf[:, c]) ** 2).sum(-1)
                       for a, c in pairs]).reshape(-1)
        dr = np.array([((ze[a] - ze[c]) ** 2).sum(-1)
                       for a, c in pairs]).reshape(-1)
        lr = np.array([((ze[:, a] - ze[:, c]) ** 2).sum(-1)
                       for a, c in pairs]).reshape(-1)
        ref = (np.maximum(0, lg - dg + eta1).sum() +
               np.maximum(0, lr - dr + eta2).sum()) / (bs ** 3 - bs ** 2)

        fmask = region_feature_mask(latent, n_regions, region)
        out = latent_consistency_loss(jnp.asarray(z), fmask, bs, eta1, eta2)
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_weighted_cross_entropy(self, rng):
        from craniofacialsd_vae_tpu.training import weighted_cross_entropy

        logits = rng.normal(size=(8, 4)).astype(np.float32)
        labels = rng.integers(0, 4, size=8)
        w = rng.random(4).astype(np.float32)

        # torch CrossEntropyLoss(weight) oracle
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        nll = -logp[np.arange(8), labels]
        ref = (w[labels] * nll).sum() / w[labels].sum()
        out, acc = weighted_cross_entropy(jnp.asarray(logits),
                                          jnp.asarray(labels), jnp.asarray(w))
        np.testing.assert_allclose(out, ref, rtol=1e-5)
        assert 0.0 <= float(acc) <= 100.0


def _tiny_geometry(rng, n_regions=3, return_bundle=False):
    """A small 2-level hierarchy on a subdivided octahedron for fast
    model/train tests. return_bundle additionally returns the raw
    GeometryBundle (spiral tables + COO transforms) for torch oracles."""
    from craniofacialsd_vae_tpu.geometry import (MeshData, precompute_geometry)
    from craniofacialsd_vae_tpu.geometry.template import template_from_mesh
    from craniofacialsd_vae_tpu.models import SpiralGeometry

    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], dtype=np.float64)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    edge_mid = {}
    new_verts = list(verts)

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in edge_mid:
            m = (verts[a] + verts[b]) / 2
            m /= np.linalg.norm(m)
            edge_mid[key] = len(new_verts)
            new_verts.append(m)
        return edge_mid[key]

    nf = []
    for a, b, c in faces:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    verts = np.asarray(new_verts)
    faces = np.asarray(nf)

    template = template_from_mesh(
        MeshData(vertices=verts, faces=faces), with_regions=False)
    bundle = precompute_geometry(template, [2, 2], [5, 5], [1, 1])
    geom = SpiralGeometry.from_bundle(bundle)
    # synthesize region masks (the octahedron has no colors)
    n = template.num_vertices
    masks = np.zeros((n_regions, n), bool)
    for i in range(n_regions):
        masks[i, rng.choice(n, size=n // n_regions, replace=False)] = True
    geom.region_masks = jnp.asarray(masks)
    return (geom, bundle) if return_bundle else geom


class TestTrainStep:
    def test_loss_decreases(self, rng):
        import optax
        from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state,
                                                     make_train_step)

        geom = _tiny_geometry(rng)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        opt = optax.adam(1e-2)
        state = create_train_state(params, opt)
        weights = LossWeights(kl=1e-4, laplacian=0.0,
                              latent_consistency=0.5)
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

    def test_scanned_epoch_matches_per_step(self, rng):
        """make_scanned_train_step (whole epoch in one lax.scan dispatch)
        must reproduce the per-step path update-for-update: same batches,
        same fold_in key schedule → same final params and mean metrics."""
        import optax
        from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
        from craniofacialsd_vae_tpu.training import (
            LossWeights, create_train_state, make_scanned_train_step,
            make_train_step)

        geom = _tiny_geometry(rng)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        opt = optax.adam(1e-2)
        weights = LossWeights(kl=1e-4, laplacian=0.1,
                              latent_consistency=0.5)
        b, steps = 3, 5
        n = geom.region_masks.shape[1]
        data = jnp.asarray(rng.normal(size=(12, n, 3)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 12, size=(steps, b)), jnp.int32)
        key = jax.random.PRNGKey(7)
        step_ids = 1 + jnp.arange(steps)

        step = make_train_step(config, weights, opt, batch_size=b,
                               swap=True)
        # both paths donate their state; give each its own buffers
        state_a = create_train_state(jax.tree.map(jnp.copy, params), opt)
        tots = []
        for t in range(steps):
            x = jnp.take(data, idx[t], axis=0)
            state_a, m = step(state_a, geom, x, None, None,
                              jax.random.fold_in(key, 1 + t))
            tots.append(float(m["tot"]))

        epoch = make_scanned_train_step(config, weights, opt,
                                        batch_size=b, swap=True)
        state_b = create_train_state(jax.tree.map(jnp.copy, params), opt)
        state_b, metrics = epoch(state_b, geom, data, idx, step_ids, None,
                                 None, key)

        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(a, c, rtol=1e-5,
                                                    atol=1e-6),
            state_a.params, state_b.params)
        np.testing.assert_allclose(float(metrics["tot"]),
                                   np.mean(tots), rtol=1e-5)

    def test_multi_epoch_scan_matches_sequential(self, rng):
        """make_scanned_train_epochs (E epochs + per-epoch validation in
        one dispatch) must equal the sequential per-step train + eval
        loop with the same step-id key schedule."""
        import optax
        from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
        from craniofacialsd_vae_tpu.training import (
            LossWeights, create_train_state, make_eval_step,
            make_scanned_train_epochs, make_train_step)

        geom = _tiny_geometry(rng)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        opt = optax.adam(1e-2)
        weights = LossWeights(kl=1e-4, laplacian=0.1,
                              latent_consistency=0.5)
        b, e_n, st, sv = 3, 2, 3, 2
        n = geom.region_masks.shape[1]
        tr_x = jnp.asarray(rng.normal(size=(9, n, 3)).astype(np.float32))
        va_x = jnp.asarray(rng.normal(size=(6, n, 3)).astype(np.float32))
        tr_idx = jnp.asarray(rng.integers(0, 9, size=(e_n, st, b)),
                             jnp.int32)
        va_idx = jnp.asarray(rng.integers(0, 6, size=(e_n, sv, b)),
                             jnp.int32)
        per = st + sv
        e_ar = np.arange(e_n)[:, None]
        tr_sid = jnp.asarray(1 + e_ar * per + np.arange(st)[None],
                             jnp.int32)
        va_sid = jnp.asarray(1 + e_ar * per + st + np.arange(sv)[None],
                             jnp.int32)
        key = jax.random.PRNGKey(17)

        # sequential oracle
        step = make_train_step(config, weights, opt, batch_size=b,
                               swap=True)
        estep = make_eval_step(config, weights, batch_size=b, swap=True)
        state_a = create_train_state(jax.tree.map(jnp.copy, params), opt)
        va_tots = []
        for e in range(e_n):
            for t in range(st):
                x = jnp.take(tr_x, tr_idx[e, t], axis=0)
                state_a, _ = step(state_a, geom, x, None, None,
                                  jax.random.fold_in(key, tr_sid[e, t]))
            ms = []
            for t in range(sv):
                x = jnp.take(va_x, va_idx[e, t], axis=0)
                ms.append(estep(state_a, geom, x, None, None,
                                jax.random.fold_in(key, va_sid[e, t])))
            va_tots.append(np.mean([float(m["tot"]) for m in ms]))

        epochs_fn = make_scanned_train_epochs(config, weights, opt,
                                              batch_size=b, swap=True)
        state_b = create_train_state(jax.tree.map(jnp.copy, params), opt)
        state_b, tr_m, va_m = epochs_fn(state_b, geom, tr_x, va_x,
                                        tr_idx, tr_sid, va_idx, va_sid,
                                        None, None, None, key)
        jax.tree.map(
            lambda a, c: np.testing.assert_allclose(a, c, rtol=1e-5,
                                                    atol=1e-6),
            state_a.params, state_b.params)
        np.testing.assert_allclose(np.asarray(va_m["tot"]), va_tots,
                                   rtol=1e-5)

    def test_eval_step_deterministic(self, rng):
        import optax
        from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
        from craniofacialsd_vae_tpu.training import (LossWeights,
                                                     create_train_state,
                                                     make_eval_step)

        geom = _tiny_geometry(rng)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        state = create_train_state(params, optax.adam(1e-3))
        weights = LossWeights(latent_consistency=0.5)
        b = 3
        estep = make_eval_step(config, weights, batch_size=b, swap=True)
        n = geom.region_masks.shape[1]
        x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
        key = jax.random.PRNGKey(9)
        m1 = estep(state, geom, x, None, None, key)
        m2 = estep(state, geom, x, None, None, key)
        assert float(m1["tot"]) == float(m2["tot"])


class TestModelShapes:
    def test_encode_decode_roundtrip_shapes(self, rng):
        from craniofacialsd_vae_tpu.models import (SDVAEConfig, decode,
                                                   encode, forward,
                                                   init_sdvae)

        geom = _tiny_geometry(rng)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        n = geom.region_masks.shape[1]
        x = jnp.asarray(rng.normal(size=(n, 2, 3)).astype(np.float32))

        mu, logvar = encode(params, geom, config, x)
        assert mu.shape == (2, 6) and logvar.shape == (2, 6)
        out = decode(params, geom, config, mu)
        assert out.shape == (n, 2, 3)
        rec, z, mu2, _ = forward(params, geom, config, x,
                                 jax.random.PRNGKey(1), training=True)
        assert rec.shape == (n, 2, 3) and z.shape == (2, 6)
        # training=True draws noise → z != mu
        assert not np.allclose(z, mu2)

    def test_non_vae_mode(self, rng):
        from craniofacialsd_vae_tpu.models import (SDVAEConfig, encode,
                                                   init_sdvae)

        geom = _tiny_geometry(rng)
        config = SDVAEConfig(out_channels=(8, 16), latent_size=6,
                             is_vae=False)
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        assert "logvar" not in params
        n = geom.region_masks.shape[1]
        x = jnp.asarray(rng.normal(size=(n, 2, 3)).astype(np.float32))
        mu, logvar = encode(params, geom, config, x)
        assert logvar is None
