"""Non-default model/training modes: swap_features=False (plain batches,
no consistency loss) and pre_z_sigmoid on the non-VAE encoder."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tests.test_training import _tiny_geometry


def test_train_step_without_swap():
    from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
    from craniofacialsd_vae_tpu.training import (LossWeights,
                                                 create_train_state,
                                                 make_train_step)

    rng = np.random.default_rng(0)
    geom = _tiny_geometry(rng)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    opt = optax.adam(1e-2)
    state = create_train_state(params, opt)
    weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.0)
    b = 5  # arbitrary batch size — no B² grid without swapping
    step = make_train_step(config, weights, opt, batch_size=b, swap=False)

    n = geom.region_masks.shape[1]
    x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(20):
        state, m = step(state, geom, x, None, None,
                        jax.random.fold_in(key, i))
        if first is None:
            first = float(m["tot"])
    assert float(m["latent_consistency"]) == 0.0
    assert float(m["tot"]) < first


def test_pre_z_sigmoid_bounds_latents():
    from craniofacialsd_vae_tpu.models import SDVAEConfig, encode, init_sdvae

    rng = np.random.default_rng(1)
    geom = _tiny_geometry(rng)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6,
                         is_vae=False, pre_z_sigmoid=True)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    n = geom.region_masks.shape[1]
    x = jnp.asarray(rng.normal(size=(n, 3, 3)).astype(np.float32) * 5)
    mu, logvar = encode(params, geom, config, x)
    assert logvar is None
    assert float(jnp.min(mu)) >= 0.0 and float(jnp.max(mu)) <= 1.0
