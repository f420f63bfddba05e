"""MLP latent classifier head (reference model.py:191-203).

Linear stack with ReLU after every layer *including the last* (a reference
quirk kept for parity — logits are therefore non-negative; argmax of
log-softmax over them matches the reference's predicted labels)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_mlp", "mlp_apply"]


def init_mlp(key, in_features: int, hidden_features: list,
             out_classes: int) -> list:
    feats = [in_features] + list(hidden_features) + [out_classes]
    keys = jax.random.split(key, len(feats) - 1)
    layers = []
    for i in range(1, len(feats)):
        n_in, n_out = feats[i - 1], feats[i]
        limit = float(np.sqrt(6.0 / (n_in + n_out)))
        w = jax.random.uniform(keys[i - 1], (n_in, n_out), jnp.float32,
                               minval=-limit, maxval=limit)
        layers.append({"w": w, "b": jnp.zeros((n_out,), jnp.float32)})
    return layers


def mlp_apply(layers: list, x: jnp.ndarray):
    """Returns (logits [..., n_classes], predicted labels [...])."""
    h = x
    for layer in layers:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    labels = jnp.argmax(jax.nn.log_softmax(h, axis=-1), axis=-1)
    return h, labels
