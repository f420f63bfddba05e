"""Training losses (reference model_manager.py:274-393).

All pure jnp functions of (predictions, targets, static geometry). The
latent-consistency loss — the disentanglement objective over the B×B swap
grid — is rewritten index-free: instead of slicing the latent at a python
region index (which would force retracing per region), the swapped region is
expressed as a {0,1} feature mask over latent dims, so the region chosen each
step can be a traced integer and the whole step stays one compiled program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.sparse import PaddedRowSparse, ell_matmul

__all__ = ["mse_loss", "kl_divergence_loss", "laplacian_loss",
           "latent_consistency_loss", "weighted_cross_entropy",
           "region_feature_mask"]


def mse_loss(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((prediction - target) ** 2)


def kl_divergence_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 Σ_z (1 + logvar - mu² - e^logvar), mean over batch."""
    kl = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1)
    return jnp.mean(kl)


def laplacian_loss(laplacian: PaddedRowSparse,
                   prediction: jnp.ndarray) -> jnp.ndarray:
    """mean_b Σ_n ‖(L x̂)_n‖₂ / N — smoothness regularizer
    (reference model_manager.py:343-349). prediction is vertex-major
    [N, B, 3]."""
    n_verts, batch = prediction.shape[0], prediction.shape[1]
    lx = ell_matmul(laplacian, prediction)            # [N, B, 3]
    per_vertex = jnp.linalg.norm(lx, axis=-1)         # [N, B]
    return jnp.sum(per_vertex) / (n_verts * batch)


def region_feature_mask(latent_size: int, num_regions: int,
                        region_idx) -> jnp.ndarray:
    """{0,1} float mask over latent dims selecting region `region_idx`'s
    contiguous slice. region_idx may be a traced int."""
    size = latent_size // num_regions
    dims = jnp.arange(latent_size)
    return ((dims >= region_idx * size) &
            (dims < (region_idx + 1) * size)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("batch_size",))
def latent_consistency_loss(z: jnp.ndarray, feature_mask: jnp.ndarray,
                            batch_size: int, eta1: float,
                            eta2: float) -> jnp.ndarray:
    """Disentanglement margins over the B×B swap grid
    (reference model_manager.py:360-393).

    z: [B², Z], row i·B+j = mesh identity i carrying region from donor j.
    With masked squared distances d²ᶠ (swapped-region dims) and d²ᵉ (all
    other dims), for all unordered index pairs p=(a<b):

      lg[p, j] = d²ᶠ(z[a,j], z[b,j])   same donor   → should be 0
      dg[p, i] = d²ᶠ(z[i,a], z[i,b])   same identity → should be large
      lr[p, i] = d²ᵉ(z[i,a], z[i,b])   same identity → should be 0
      dr[p, j] = d²ᵉ(z[a,j], z[b,j])   same donor   → should be large

    loss = [Σ max(0, lg-dg+η1) + Σ max(0, lr-dr+η2)] / (B³-B²), pairing the
    p-th identity-pair with the p-th donor-pair exactly as the reference's
    flattened triu alignment does.
    """
    bs = batch_size
    zg = z.reshape(bs, bs, -1)
    else_mask = 1.0 - feature_mask

    ia, ib = jnp.triu_indices(bs, k=1)

    # pairs over the identity axis (same donor j)
    d_id = zg[ia] - zg[ib]                               # [P, B(j), Z]
    lg = jnp.sum(d_id ** 2 * feature_mask, axis=-1)      # [P, B]
    dr = jnp.sum(d_id ** 2 * else_mask, axis=-1)         # [P, B]

    # pairs over the donor axis (same identity i)
    d_dn = zg[:, ia] - zg[:, ib]                         # [B(i), P, Z]
    dg = jnp.sum(d_dn ** 2 * feature_mask, axis=-1).T    # [P, B]
    lr = jnp.sum(d_dn ** 2 * else_mask, axis=-1).T       # [P, B]

    hinge_g = jnp.maximum(0.0, lg - dg + eta1)
    hinge_r = jnp.maximum(0.0, lr - dr + eta2)
    return (jnp.sum(hinge_g) + jnp.sum(hinge_r)) / (bs ** 3 - bs ** 2)


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights: jnp.ndarray):
    """Class-weighted CE matching torch.nn.CrossEntropyLoss(weight=...):
    weighted mean with normalizer Σ w_{y_i}. Returns (loss, accuracy%)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = class_weights[labels]
    loss = jnp.sum(w * nll) / jnp.sum(w)
    acc = 100.0 * jnp.mean(
        (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return loss, acc
