"""End-to-end MLP classifier training mode (reference
mlp_training_type: end2end — model_manager.py:99-121, 295-306):
the classification CE joins the total loss and the classifier head trains
with its own optimizer inside the same jitted step."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tests.test_training import _tiny_geometry


def test_end2end_classifier_updates_and_learns():
    from craniofacialsd_vae_tpu.models import (SDVAEConfig, init_mlp,
                                               init_sdvae)
    from craniofacialsd_vae_tpu.training import (LossWeights,
                                                 create_train_state,
                                                 make_train_step)

    rng = np.random.default_rng(0)
    geom = _tiny_geometry(rng)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    clf_params = init_mlp(jax.random.PRNGKey(1), 6, [16], 3)

    opt = optax.adam(1e-2)
    clf_opt = optax.adam(1e-2)
    state = create_train_state(params, opt, clf_params, clf_opt)
    weights = LossWeights(latent_consistency=0.5, classification=1.0)
    b = 3
    step = make_train_step(config, weights, opt, batch_size=b, swap=True,
                           clf_optimizer=clf_opt)

    n = geom.region_masks.shape[1]
    x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    labels = jnp.asarray(np.array([0, 1, 2], np.int32))
    cw = jnp.asarray(np.ones(3, np.float32) / 3)

    clf_before = jax.tree.map(np.asarray, state.clf_params)
    key = jax.random.PRNGKey(2)
    first = None
    for i in range(25):
        state, metrics = step(state, geom, x, labels, cw,
                              jax.random.fold_in(key, i))
        if first is None:
            first = float(metrics["classification"])

    # classifier head actually updated
    changed = any(
        not np.allclose(a["w"], np.asarray(b2["w"]))
        for a, b2 in zip(clf_before, state.clf_params))
    assert changed
    # CE on the (fixed) batch decreases
    assert float(metrics["classification"]) < first
    # fp32 rounding can land a hair above 100
    assert 0.0 <= float(metrics["classification_acc"]) <= 100.001
