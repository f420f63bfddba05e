"""Distance ops vs numpy/scipy oracles."""

import numpy as np

import jax.numpy as jnp


class TestNearest:
    def test_matches_brute_force(self):
        from craniofacialsd_vae_tpu.ops.distances import nearest_dists_sq

        rng = np.random.default_rng(0)
        x = rng.normal(size=(100, 3)).astype(np.float32)
        y = rng.normal(size=(137, 3)).astype(np.float32)
        d2 = np.asarray(nearest_dists_sq(jnp.asarray(x), jnp.asarray(y),
                                         chunk=32))
        ref = ((x[:, None] - y[None]) ** 2).sum(-1).min(axis=1)
        # the MXU expansion form (|x|^2+|y|^2-2xy) carries ~1e-5 relative
        # cancellation noise vs the difference form
        np.testing.assert_allclose(d2, ref, rtol=1e-4, atol=1e-6)


class TestChamfer:
    def test_zero_for_identical(self):
        from craniofacialsd_vae_tpu.ops.distances import chamfer_distance

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        # the expansion form leaves ~1e-8 fp cancellation residue where
        # the difference form was exactly 0
        assert float(chamfer_distance(x, x)) < 1e-6

    def test_symmetric_and_batched(self):
        from craniofacialsd_vae_tpu.ops.distances import chamfer_distance

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(2, 60, 3)).astype(np.float32))
        d = chamfer_distance(x, y)
        d_swap = chamfer_distance(y, x)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_swap),
                                   rtol=1e-5)
        assert d.shape == (2,)


class TestPointMesh:
    def test_zero_on_surface(self):
        from craniofacialsd_vae_tpu.geometry.synthetic import octasphere
        from craniofacialsd_vae_tpu.ops.distances import point_mesh_distance

        verts, faces = octasphere(1)
        # face centroids lie on the surface
        pts = verts[faces].mean(axis=1)
        d = point_mesh_distance(jnp.asarray(pts), verts, faces)
        assert d < 1e-10


class TestSinkhorn:
    def test_zero_for_identical_clouds(self):
        from craniofacialsd_vae_tpu.ops.distances import sinkhorn_divergence

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
        d_same = float(sinkhorn_divergence(x, x, epsilon=0.01))
        y = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32) + 2.0)
        d_diff = float(sinkhorn_divergence(x, y, epsilon=0.01))
        assert d_same < 0.05
        assert d_diff > 1.0  # clouds 2 units apart → OT cost ≈ ‖Δ‖² ≈ 12


class TestBucketedChamfer:
    def test_duplicate_padding_is_exact(self):
        """fitting.py pads the chamfer target to a power-of-two bucket by
        duplicating a real point and masking the reverse mean — the value
        must equal the unpadded symmetric chamfer exactly (duplicates
        never change a min; the masked sum divides by the true count)."""
        import jax.numpy as jnp

        from craniofacialsd_vae_tpu.ops.distances import (chamfer_distance,
                                                          nearest_dists_sq)

        rng = np.random.default_rng(11)
        g = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        t = np.asarray(rng.normal(size=(41, 3)).astype(np.float32))
        q = len(t)
        q_pad = 1 << (q - 1).bit_length()
        t_padded = jnp.asarray(np.concatenate(
            [t, np.broadcast_to(t[:1], (q_pad - q, 3))]))
        mask = jnp.asarray((np.arange(q_pad) < q).astype(np.float32))

        bucketed = float(jnp.mean(nearest_dists_sq(g, t_padded))
                         + jnp.sum(nearest_dists_sq(t_padded, g) * mask)
                         / q)
        exact = float(chamfer_distance(g, jnp.asarray(t)))
        np.testing.assert_allclose(bucketed, exact, rtol=1e-6)
