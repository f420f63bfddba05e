"""Tester building blocks on tiny geometry (CPU platform) — metric
semantics against hand-computed oracles, plus config validation."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_training import _tiny_geometry


@pytest.fixture(scope="module")
def tiny_manager(tmp_path_factory):
    """A minimal ModelManager-like shim over the tiny geometry."""
    import optax

    from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
    from craniofacialsd_vae_tpu.training import create_train_state

    class Shim:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.geometry = _tiny_geometry(rng)
            self.net_config = SDVAEConfig(out_channels=(8, 16),
                                          latent_size=6)
            params = init_sdvae(jax.random.PRNGKey(0), self.net_config,
                                self.geometry)
            self.state = create_train_state(params, optax.adam(1e-3))
            self.to_mm_const = 10.0
            self.is_vae = True
            self.model_latent_size = 6
            self._train_latents = None
            self._train_labels = None

        @property
        def train_latents_and_labels(self):
            return self._train_latents, self._train_labels

        def encode(self, x):
            from craniofacialsd_vae_tpu.models import encode
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 2:
                x = x[None]
            mu, _ = encode(self.state.params, self.geometry,
                           self.net_config, jnp.swapaxes(x, 0, 1))
            return mu

        def generate(self, z):
            from craniofacialsd_vae_tpu.models import decode
            z = jnp.asarray(z, jnp.float32)
            single = z.ndim == 1
            if single:
                z = z[None]
            out = jnp.swapaxes(decode(self.state.params, self.geometry,
                                      self.net_config, z), 0, 1)
            return out[0] if single else out

        def forward(self, x, training=False):
            from craniofacialsd_vae_tpu.models import forward
            x = jnp.swapaxes(jnp.asarray(x, jnp.float32), 0, 1)
            out, z, mu, lv = forward(self.state.params, self.geometry,
                                     self.net_config, x)
            return jnp.swapaxes(out, 0, 1), z, mu, lv

        def compute_vertex_errors(self, a, b):
            return jnp.sqrt(jnp.sum((jnp.asarray(a) - jnp.asarray(b)) ** 2,
                                    axis=-1)) * self.to_mm_const

        def encode_all(self, it, is_train_loader=True):
            zs, labels = [], {"y": [], "age": [], "gender": [],
                              "augmented": []}
            for b in it:
                zs.append(np.asarray(self.encode(b["x"])))
                labels["y"].extend(b["y"])
            z = np.concatenate(zs)
            if is_train_loader:
                self._train_latents, self._train_labels = z, labels
            return z, labels

    return Shim()


def _batches(x, b=2):
    out = []
    for s in range(0, len(x) - len(x) % b, b):
        out.append({"x": x[s:s + b], "y": ["n"] * b,
                    "age": np.zeros(b), "gender": ["M"] * b,
                    "augmented": np.zeros(b, bool)})
    return out


class TestMetricSemantics:
    def test_reconstruction_errors_oracle(self, tiny_manager):
        """Per-mesh mean mm error, stats over meshes — verified by
        recomputing from a direct forward pass."""
        from craniofacialsd_vae_tpu.analysis.tester import \
            reconstruction_errors

        n = tiny_manager.geometry.region_masks.shape[1]
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, n, 3)).astype(np.float32)
        norm = {"mean": np.zeros((n, 3), np.float32),
                "std": np.ones((n, 3), np.float32)}
        stats = reconstruction_errors(tiny_manager, _batches(x), norm)

        out = np.asarray(tiny_manager.forward(x)[0])
        per_mesh = (np.linalg.norm(out - x, axis=-1) * 10.0).mean(axis=1)
        assert abs(stats["mean"] - per_mesh.mean()) < 1e-4
        assert abs(stats["max"] - per_mesh.max()) < 1e-4

    def test_vector_linspace_endpoints(self):
        from craniofacialsd_vae_tpu.analysis.tester import vector_linspace

        a = np.arange(5.0)
        b = -np.arange(5.0)
        vs = vector_linspace(a, b, 7)
        assert vs.shape == (7, 5)
        np.testing.assert_allclose(vs[0], a, rtol=1e-6)
        np.testing.assert_allclose(vs[-1], b, rtol=1e-6)
        np.testing.assert_allclose(vs[3], (a + b) / 2, atol=1e-6)

    def test_latent_stats_cache(self, tiny_manager, tmp_path):
        from craniofacialsd_vae_tpu.analysis.tester import \
            compute_latent_stats

        n = tiny_manager.geometry.region_masks.shape[1]
        rng = np.random.default_rng(2)
        x = rng.normal(size=(6, n, 3)).astype(np.float32)
        stats = compute_latent_stats(tiny_manager, str(tmp_path),
                                     _batches(x))
        assert os.path.exists(tmp_path / "z_stats.npz")
        z, _ = tiny_manager.train_latents_and_labels
        np.testing.assert_allclose(stats["means"], z.mean(axis=0),
                                   rtol=1e-5)
        # second call loads the cache (even with no iterator)
        stats2 = compute_latent_stats(tiny_manager, str(tmp_path))
        np.testing.assert_allclose(stats2["maxs"], stats["maxs"])

    def test_latent_stats_reads_reference_pkl(self, tiny_manager, tmp_path):
        """A migrated reference run dir carries z_stats.pkl (pickled torch
        tensors, reference test.py:95-117) — consumed in place, no npz and
        no iterator needed."""
        import pickle

        import torch

        from craniofacialsd_vae_tpu.analysis.tester import \
            compute_latent_stats

        ref = {"means": torch.arange(6, dtype=torch.float32),
               "stds": torch.ones(6), "mins": -torch.ones(6),
               "maxs": torch.full((6,), 2.0)}
        with open(tmp_path / "z_stats.pkl", "wb") as f:
            pickle.dump(ref, f)
        stats = compute_latent_stats(tiny_manager, str(tmp_path))
        np.testing.assert_allclose(stats["means"], np.arange(6,
                                                             dtype=np.float32))
        np.testing.assert_allclose(stats["maxs"], np.full(6, 2.0))
        assert not os.path.exists(tmp_path / "z_stats.npz")


class TestConfig:
    def test_defaults_fill_missing_keys(self, tmp_path):
        from craniofacialsd_vae_tpu.utils import get_config

        p = tmp_path / "c.yaml"
        p.write_text("data:\n  template_path: t.ply\n"
                     "optimization:\n  epochs: 3\n")
        cfg = get_config(str(p))
        assert cfg["optimization"]["epochs"] == 3
        assert cfg["optimization"]["batch_size"] == 4        # default
        assert cfg["model"]["latent_size"] == 75             # default
        assert cfg["logging_frequency"]["save_weights"] == 100

    def test_consistency_requires_swap(self, tmp_path):
        from craniofacialsd_vae_tpu.utils import get_config

        p = tmp_path / "c.yaml"
        p.write_text("data:\n  template_path: t.ply\n"
                     "  swap_features: false\n"
                     "optimization:\n  latent_consistency_weight: 1\n")
        with pytest.raises(ValueError, match="swap_features"):
            get_config(str(p))

    def test_passthrough_sections(self, tmp_path):
        from craniofacialsd_vae_tpu.utils import get_config

        p = tmp_path / "c.yaml"
        p.write_text("data:\n  template_path: t.ply\n"
                     "classifier:\n  main_model_type: qda\n")
        cfg = get_config(str(p))
        assert cfg["classifier"]["main_model_type"] == "qda"
