"""Checkpoint/resume invariants (training/checkpoint.py)."""

import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from craniofacialsd_vae_tpu.training import create_train_state
from craniofacialsd_vae_tpu.training.checkpoint import (resume_checkpoint,
                                                        save_checkpoint)


def _state(value=0.0):
    params = {"w": jnp.full((3, 3), value, jnp.float32)}
    return create_train_state(params, optax.adam(1e-3))


def test_save_resume_roundtrip(tmp_path):
    state = _state(1.5)
    save_checkpoint(str(tmp_path), state, epoch=7)
    restored, epoch = resume_checkpoint(str(tmp_path), _state(0.0))
    assert epoch == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(state.params["w"]))


def test_epoch_mismatch_reinits_optimizer(tmp_path, capsys):
    """model_%08d.ckpt and optimizer.ckpt are written atomically but not as
    a pair; a crash between the writes leaves a newer model with an older
    optimizer. Resume must detect the mismatch instead of silently applying
    stale optimizer moments."""
    state = _state(1.0)
    save_checkpoint(str(tmp_path), state, epoch=100)
    # simulate the crash: a newer model checkpoint appears without its
    # paired optimizer.ckpt update
    newer = _state(2.0)
    import flax.serialization as ser
    with open(os.path.join(str(tmp_path), "model_00000200.ckpt"), "wb") as f:
        f.write(ser.to_bytes({"params": newer.params,
                              "clf_params": newer.clf_params}))

    template = _state(0.0)
    # warm the template optimizer state so "reinitialized" is observable
    restored, epoch = resume_checkpoint(str(tmp_path), template)
    assert epoch == 200
    out = capsys.readouterr().out
    assert "WARNING" in out and "optimizer" in out
    # params come from the newer model file
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(newer.params["w"]))
    # optimizer state equals the fresh template's (reinitialized), not the
    # stale epoch-100 moments
    fresh_mu = jax.tree.leaves(template.opt_state)
    got_mu = jax.tree.leaves(restored.opt_state)
    for a, b in zip(fresh_mu, got_mu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
