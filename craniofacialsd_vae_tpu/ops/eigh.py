"""Mesh-Laplacian eigendecomposition on TPU.

The reference computes the k=1000 smallest eigenpairs of the (unnormalized)
graph Laplacian with scipy's ARPACK (utils.py:238-241) — "up to a few
minutes" on a laptop (README.md:68-69). On TPU the 17k×17k Laplacian fits
comfortably dense in HBM (1.2 GB fp32), so we run one dense
jnp.linalg.eigh and slice the smallest k — simpler, exact for all k, and
the dominant cost of the reference demo disappears.

Spectral projection/reconstruction of mesh batches (the actual augmentation
math) are plain matmuls that ride the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["unnormalized_laplacian_dense", "laplacian_eigendecomposition",
           "spectral_project", "spectral_reconstruct"]


def unnormalized_laplacian_dense(num_vertices: int,
                                 edges: np.ndarray) -> np.ndarray:
    """Dense L = D - A from unique undirected edges (host-side), matching
    torch_geometric get_laplacian(normalization=None)."""
    lap = np.zeros((num_vertices, num_vertices), dtype=np.float32)
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    lap[src, dst] = -1.0
    deg = np.bincount(src, minlength=num_vertices).astype(np.float32)
    lap[np.arange(num_vertices), np.arange(num_vertices)] = deg
    return lap


def laplacian_eigendecomposition(template, k: int = 500,
                                 backend: str = "auto"):
    """(eigenvalues [k], eigenvectors [N, k]) of the k smallest eigenpairs.

    backend: 'tpu' — dense jnp.linalg.eigh (exact, fast on-accelerator);
             'scipy' — ARPACK eigsh(which='SM') like the reference;
             'auto' — tpu when an accelerator is present, else scipy.
    """
    n = template.num_vertices
    if backend == "auto":
        backend = "tpu" if jax.default_backend() != "cpu" else "scipy"

    if backend == "scipy":
        import scipy.sparse as sp
        from scipy.sparse.linalg import eigsh

        src = np.concatenate([template.edges[:, 0], template.edges[:, 1]])
        dst = np.concatenate([template.edges[:, 1], template.edges[:, 0]])
        deg = np.bincount(src, minlength=n).astype(np.float64)
        lap = sp.coo_matrix(
            (np.concatenate([-np.ones(len(src)), deg]),
             (np.concatenate([src, np.arange(n)]),
              np.concatenate([dst, np.arange(n)]))),
            shape=(n, n)).tocsc()
        vals, vecs = eigsh(lap, k=k, which="SM")
        return vals, vecs

    lap = unnormalized_laplacian_dense(n, template.edges)
    vals, vecs = jnp.linalg.eigh(jnp.asarray(lap))
    # eigh returns ascending order: smallest k are the leading columns
    return np.asarray(vals[:k]), np.asarray(vecs[:, :k])


@jax.jit
def spectral_project(eigvecs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """s = Uᵀ x — [N, k]ᵀ @ [..., N, 3] → [..., k, 3]."""
    return jnp.einsum("nk,...nc->...kc", eigvecs, x)


@jax.jit
def spectral_reconstruct(eigvecs: jnp.ndarray, x: jnp.ndarray,
                         s_orig: jnp.ndarray,
                         s_new: jnp.ndarray) -> jnp.ndarray:
    """x + U (s_new - s_orig): replace the truncated spectrum of x without
    losing the unmodeled high-frequency residual."""
    return x + jnp.einsum("nk,...kc->...nc", eigvecs, s_new - s_orig)
