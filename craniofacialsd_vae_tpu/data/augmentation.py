"""Offline dataset augmentation (reference data_loading.py:292-374,
utils.py:234-267), TPU-batched.

Three modes generating synthetic meshes from same-class, same-age-group
pairs:
  * interpolate     — linear vertex interpolation x1 + t·(x2 - x1)
  * spectral_comb   — swap a random third of the first 30 spectral
                      coefficients between the pair
  * spectral_interp — per-coefficient Gaussian-weighted interpolation of the
                      first 30 coefficients

The spectral modes project onto the k=1000 smallest Laplacian eigenvectors
and rebuild from that basis (reference semantics: the augmented mesh is the
k-mode reconstruction, utils.py:244-267). Projections are batched matmuls on
the MXU; the eigenbasis comes from ops.eigh (dense on-TPU eigh instead of
the reference's minutes-long ARPACK run).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["interpolate", "spectral_combination", "spectral_interpolation",
           "augment_pairs"]

SWAP_UNTIL = 30        # reference utils.py:249
INTERP_UNTIL = 30      # reference utils.py:264


def interpolate(x1, x2, value):
    """Linear vertex interpolation (reference utils.py:234-235). Accepts
    batched [..., N, 3] and broadcastable value."""
    return x1 + value * (x2 - x1)


@jax.jit
def _spectral_swap_batch(eigvecs, x1, x2, selectors):
    """x1, x2: [P, N, 3]; selectors: [P, k] {0,1} mask of coefficients to
    take from x2. Returns U(s1 ⊕ s2-masked)."""
    s1 = jnp.einsum("nk,pnc->pkc", eigvecs, x1,
                    precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.einsum("nk,pnc->pkc", eigvecs, x2,
                    precision=jax.lax.Precision.HIGHEST)
    s3 = jnp.where(selectors[:, :, None] > 0, s2, s1)
    return jnp.einsum("nk,pkc->pnc", eigvecs, s3,
                      precision=jax.lax.Precision.HIGHEST)


def _as_batch(x) -> np.ndarray:
    """Lift a single [N, 3] mesh to [1, N, 3] (np.atleast_3d would append
    the new axis at the END, giving [N, 3, 1])."""
    x = np.asarray(x, np.float32)
    return x[None] if x.ndim == 2 else x


def spectral_combination(eigvecs: np.ndarray, x1, x2, rng: np.random.Generator):
    """Swap a random third of the first SWAP_UNTIL coefficients
    (reference utils.py:244-253). Batched over leading dim."""
    x1 = _as_batch(x1)
    p, _, _ = x1.shape
    k = eigvecs.shape[1]
    selectors = np.zeros((p, k), np.float32)
    for i in range(p):
        chosen = rng.choice(SWAP_UNTIL, SWAP_UNTIL // 3, replace=False)
        selectors[i, chosen] = 1.0
    out = _spectral_swap_batch(jnp.asarray(eigvecs), jnp.asarray(x1),
                               jnp.asarray(_as_batch(x2)),
                               jnp.asarray(selectors))
    return np.asarray(out)


@jax.jit
def _spectral_interp_batch(eigvecs, x1, x2, values, interp_mask):
    s1 = jnp.einsum("nk,pnc->pkc", eigvecs, x1,
                    precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.einsum("nk,pnc->pkc", eigvecs, x2,
                    precision=jax.lax.Precision.HIGHEST)
    s3 = s1 + values[:, :, None] * (s2 - s1)
    s4 = jnp.where(interp_mask[None, :, None] > 0, s3, s1)
    return jnp.einsum("nk,pkc->pnc", eigvecs, s4,
                      precision=jax.lax.Precision.HIGHEST)


def spectral_interpolation(eigvecs: np.ndarray, x1, x2,
                           rng: np.random.Generator):
    """Gaussian-weighted (N(0.5, 0.5)) per-coefficient interpolation of the
    first INTERP_UNTIL coefficients (reference utils.py:256-267)."""
    x1 = _as_batch(x1)
    p = x1.shape[0]
    k = eigvecs.shape[1]
    values = rng.normal(0.5, 0.5, size=(p, k)).astype(np.float32)
    mask = np.zeros(k, np.float32)
    mask[:INTERP_UNTIL] = 1.0
    out = _spectral_interp_batch(jnp.asarray(eigvecs), jnp.asarray(x1),
                                 jnp.asarray(_as_batch(x2)),
                                 jnp.asarray(values), jnp.asarray(mask))
    return np.asarray(out)


def augment_pairs(mode: str, x1: np.ndarray, x2: np.ndarray,
                  rng: np.random.Generator, eigvecs: np.ndarray | None = None):
    """Dispatch one batch of augmentation pairs → ([P, N, 3], tags)."""
    if mode == "interpolate":
        t = rng.uniform(size=(len(x1), 1, 1)).astype(np.float32)
        out = interpolate(np.asarray(x1, np.float32),
                          np.asarray(x2, np.float32), t)
        tags = [f"_interp{float(v):.2f}" for v in t[:, 0, 0]]
        return np.asarray(out), tags
    if mode == "spectral_comb":
        out = spectral_combination(eigvecs, x1, x2, rng)
        return out, ["_spectral_comb"] * len(x1)
    if mode == "spectral_interp":
        out = spectral_interpolation(eigvecs, x1, x2, rng)
        return out, ["_spectral_interp"] * len(x1)
    raise ValueError(f"unknown augmentation mode {mode}")
