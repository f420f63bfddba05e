"""Data-parallel train-step edges (parallel/train_parallel.py)."""

import numpy as np

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
