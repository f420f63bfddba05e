"""Checkpoint / resume (reference model_manager.py:682-776 analog).

Format: msgpack-serialized pytrees (flax.serialization) — no pickle, no
framework lock-in. Cadence and layout mirror the reference: one
`model_%08d.ckpt` per save epoch (params only) plus a single rolling
`optimizer.ckpt` (opt state + epoch); resume picks the lexicographically
last model file and parses the epoch from the filename.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "latest_checkpoint", "resume_checkpoint"]

_MODEL_RE = re.compile(r"model_(\d{8})\.ckpt$")


def _atomic_write(path: str, data: bytes) -> None:
    """Write via tmp+rename so a crash mid-write never corrupts the latest
    checkpoint (the reference's torch.save can leave partial files)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_checkpoint(checkpoint_dir: str, state, epoch: int,
                    keep_last: int | None = None) -> str:
    """Write model_%08d.ckpt + optimizer.ckpt (atomically). `epoch` is
    1-based like the reference (save at epoch+1). keep_last prunes older
    model files, keeping the most recent N."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    model_path = os.path.join(checkpoint_dir, f"model_{epoch:08d}.ckpt")
    _atomic_write(model_path, serialization.to_bytes(
        {"params": state.params, "clf_params": state.clf_params}))
    opt_path = os.path.join(checkpoint_dir, "optimizer.ckpt")
    _atomic_write(opt_path, serialization.to_bytes(
        {"opt_state": state.opt_state,
         "clf_opt_state": state.clf_opt_state,
         "epoch": epoch}))
    if keep_last is not None:
        models = sorted(f for f in os.listdir(checkpoint_dir)
                        if _MODEL_RE.search(f))
        for old in models[:-keep_last]:
            os.remove(os.path.join(checkpoint_dir, old))
    return model_path


def latest_checkpoint(checkpoint_dir: str) -> str | None:
    if not os.path.isdir(checkpoint_dir):
        return None
    models = sorted(f for f in os.listdir(checkpoint_dir)
                    if _MODEL_RE.search(f))
    return os.path.join(checkpoint_dir, models[-1]) if models else None


def resume_checkpoint(checkpoint_dir: str, state):
    """Restore the latest checkpoint into `state` (a template with the right
    pytree structure). Returns (state, epoch). Epoch 0 when nothing saved."""
    model_path = latest_checkpoint(checkpoint_dir)
    if model_path is None:
        return state, 0
    with open(model_path, "rb") as f:
        blob = f.read()
    try:
        model = serialization.from_bytes(
            {"params": state.params, "clf_params": state.clf_params}, blob)
    except (ValueError, TypeError):
        # checkpoint written with a different classifier-head architecture
        # (TypeError: stored None vs a live head, e.g. a converted
        # reference checkpoint) — restore the network, keep the fresh head
        raw = serialization.msgpack_restore(blob)
        params = serialization.from_state_dict(state.params, raw["params"])
        model = {"params": params, "clf_params": state.clf_params}
        print("Classifier head shape mismatch; restored network weights only")
    epoch = int(_MODEL_RE.search(model_path).group(1))
    opt_path = os.path.join(checkpoint_dir, "optimizer.ckpt")
    opt_state, clf_opt_state = state.opt_state, state.clf_opt_state
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_blob = f.read()
        try:
            opt = serialization.from_bytes(
                {"opt_state": state.opt_state,
                 "clf_opt_state": state.clf_opt_state,
                 "epoch": epoch}, opt_blob)
            opt_state = opt["opt_state"]
            clf_opt_state = opt["clf_opt_state"]
            # model_%08d.ckpt and the rolling optimizer.ckpt are written
            # atomically but not as a pair; a crash between the two leaves
            # a newer model with an older optimizer state
            stored_epoch = int(opt["epoch"])
            if stored_epoch != epoch:
                print(f"WARNING: optimizer.ckpt is from epoch "
                      f"{stored_epoch} but the latest model checkpoint is "
                      f"epoch {epoch} (crash between paired writes?); "
                      "reinitializing optimizer state")
                opt_state = state.opt_state
                clf_opt_state = state.clf_opt_state
        except (ValueError, TypeError):
            raw = serialization.msgpack_restore(opt_blob)
            # same crash-between-paired-writes guard as the mainline path
            if int(raw["epoch"]) != epoch:
                print(f"WARNING: optimizer.ckpt is from epoch "
                      f"{int(raw['epoch'])} but the latest model "
                      f"checkpoint is epoch {epoch}; reinitializing "
                      "optimizer state")
            else:
                opt_state = serialization.from_state_dict(
                    state.opt_state, raw["opt_state"])
                print("Classifier optimizer mismatch; restored net "
                      "optimizer state only")

    from .trainer import TrainState

    # upload restored leaves (msgpack gives numpy) to device arrays: one
    # H2D now instead of per-dispatch constant re-uploads, and numpy params
    # closed over by jitted eval fns would otherwise become Literals whose
    # __getitem__ rejects traced indices
    import jax.numpy as jnp

    def _to_device(tree):
        return jax.tree.map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
            tree)

    new_state = TrainState(params=_to_device(model["params"]),
                           opt_state=_to_device(opt_state),
                           clf_params=_to_device(model["clf_params"]),
                           clf_opt_state=_to_device(clf_opt_state),
                           epoch=epoch)
    print(f"Resume from epoch {epoch}")
    return new_state, epoch
