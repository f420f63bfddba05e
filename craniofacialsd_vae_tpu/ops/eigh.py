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


def _scipy_eigsh(template, k):
    import scipy.sparse as sp
    from scipy.sparse.linalg import eigsh

    n = template.num_vertices
    src = np.concatenate([template.edges[:, 0], template.edges[:, 1]])
    dst = np.concatenate([template.edges[:, 1], template.edges[:, 0]])
    deg = np.bincount(src, minlength=n).astype(np.float64)
    lap = sp.coo_matrix(
        (np.concatenate([-np.ones(len(src)), deg]),
         (np.concatenate([src, np.arange(n)]),
          np.concatenate([dst, np.arange(n)]))),
        shape=(n, n)).tocsc()
    # shift-invert about a small negative sigma: identical smallest-k
    # eigenpairs but converges orders of magnitude faster than the
    # reference's which='SM' iteration (README.md:68-69 "a few minutes")
    try:
        return eigsh(lap, k=k, sigma=-0.01, which="LM")
    except Exception:
        return eigsh(lap, k=k, which="SM")


def _lobpcg_smallest(template, k):
    """Smallest-k eigenpairs via LOBPCG on the spectrally-shifted operator
    (cI - L) — sparse matvecs only, runs on TPU without materializing the
    dense Laplacian in the compiler."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    from .sparse import from_coo, ell_matmul_raw

    n = template.num_vertices
    src = np.concatenate([template.edges[:, 0], template.edges[:, 1]])
    dst = np.concatenate([template.edges[:, 1], template.edges[:, 0]])
    deg = np.bincount(src, minlength=n).astype(np.float32)
    rows = np.concatenate([src, np.arange(n)])
    cols = np.concatenate([dst, np.arange(n)])
    vals = np.concatenate([-np.ones(len(src), np.float32), deg])
    lap = from_coo(rows, cols, vals, (n, n), with_transpose=False)
    shift = float(2.0 * deg.max() + 1.0)       # Gershgorin upper bound

    def matvec(x):                              # (cI - L) x
        return shift * x - ell_matmul_raw(lap.cols, lap.vals, x)

    x0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, k)).astype(np.float32))
    theta, vecs, _ = lobpcg_standard(matvec, x0, m=200)
    evals = shift - np.asarray(theta)           # back to L's spectrum
    order = np.argsort(evals)
    return evals[order], np.asarray(vecs)[:, order]


def laplacian_eigendecomposition(template, k: int = 500,
                                 backend: str = "auto"):
    """(eigenvalues [k], eigenvectors [N, k]) of the k smallest eigenpairs
    of the unnormalized graph Laplacian.

    backend: 'tpu'    — dense jnp.linalg.eigh (exact; needs the compiler to
                        take an N×N operand);
             'lobpcg' — sparse-matvec LOBPCG on the shifted operator (TPU,
                        no dense matrix);
             'scipy'  — ARPACK eigsh(which='SM'), the reference's method;
             'auto'   — try tpu → scipy fallback.
    """
    n = template.num_vertices
    if backend == "scipy":
        return _scipy_eigsh(template, k)
    if backend == "lobpcg":
        return _lobpcg_smallest(template, k)
    if backend == "auto" and n > 8192:
        # dense N×N eigh operands overwhelm remote/AOT compile helpers well
        # before HBM is the limit; shift-invert ARPACK is seconds anyway
        return _scipy_eigsh(template, k)

    try:
        lap = unnormalized_laplacian_dense(n, template.edges)
        vals, vecs = jnp.linalg.eigh(jnp.asarray(lap))
        # ascending order: smallest k are the leading columns
        return np.asarray(vals[:k]), np.asarray(vecs[:, :k])
    except Exception as e:
        if backend == "tpu":
            raise
        print(f"[eigh] dense on-accelerator eigh failed ({type(e).__name__})"
              "; falling back to scipy ARPACK")
        return _scipy_eigsh(template, k)


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
