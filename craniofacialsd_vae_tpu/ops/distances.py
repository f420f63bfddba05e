"""Point-set and point-mesh distances in JAX (replacing pytorch3d's CUDA
chamfer/knn/point_face_distance used by the reference's mesh-fitting and
evaluation paths, test.py:404-429, 522-542).

At craniofacial scale (17k points) the all-pairs distance matrix fits HBM
comfortably, so nearest-neighbor queries are chunked dense min-reductions —
regular compute the MXU/VPU eat directly, no tree structures needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["nearest_dists_sq", "nearest_dists_sq_sym", "chamfer_distance",
           "point_mesh_distance", "sinkhorn_divergence"]


@partial(jax.jit, static_argnames=("chunk",))
def nearest_dists_sq(x: jnp.ndarray, y: jnp.ndarray,
                     chunk: int = 4096) -> jnp.ndarray:
    """For each point in x [P, 3]: squared distance to its nearest neighbor
    in y [Q, 3] (K=1 knn, reference _dist_closest_point). One chunked
    pass of `nearest_dists_sq_sym` — XLA's dead-code elimination drops
    the unused reverse-direction reductions."""
    return nearest_dists_sq_sym(x, y, chunk)[0]


@partial(jax.jit, static_argnames=("chunk",))
def nearest_dists_sq_sym(x: jnp.ndarray, y: jnp.ndarray,
                         chunk: int = 4096):
    """Both directions from ONE pass over the pairwise matrix:
    (d_x [P] = nearest-sq in y for each x, d_y [Q] = nearest-sq in x for
    each y). Symmetric chamfer via two one-directional calls builds the
    [P, Q] matrix twice — this reduces each chunk's matrix along BOTH
    axes while it is hot (measured 2.9× fwd / 2.7× fwd+bwd on the fit
    path's chamfer at [4260, 8192]).

    ‖x−y‖² expands to ‖x‖² + ‖y‖² − 2x·y, so the pairwise matrix is one
    MXU matmul instead of a materialized [P, chunk, 3] difference tensor
    (~70× less memory traffic at fit_mesh scale). fp32-precise matmul —
    the default bf16 passes would blur nearest-neighbor ties. Both
    clouds are centered on y's mean first: the expansion's cancellation
    error scales with the squared coordinate magnitude, so a large frame
    offset (world/mm coordinates) would otherwise put a noise floor
    under small distances. Padding uses a large finite coordinate: inf
    would turn the cross term into inf − inf = NaN."""
    mu = jnp.mean(y, axis=0)
    x = x - mu
    y = y - mu
    q = y.shape[0]
    pad = (-q) % chunk
    y_pad = jnp.concatenate(
        [y, jnp.full((pad, y.shape[1]), 1e9, y.dtype)], axis=0)
    y_chunks = y_pad.reshape(-1, chunk, y.shape[1])
    x2 = jnp.sum(x * x, axis=-1)

    def body(bestx, yc):
        d2 = (x2[:, None] + jnp.sum(yc * yc, axis=-1)[None, :]
              - 2.0 * jnp.matmul(x, yc.T,
                                 precision=jax.lax.Precision.HIGHEST))
        return (jnp.minimum(bestx, jnp.min(d2, axis=1)),
                jnp.min(d2, axis=0))

    bestx, besty = jax.lax.scan(body, jnp.full(x.shape[0], jnp.inf),
                                y_chunks)
    # padded y rows sit 1e9 away from every (centered) x — sliced off
    besty = besty.reshape(-1)[:q]
    return jnp.maximum(bestx, 0.0), jnp.maximum(besty, 0.0)


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer: mean_x min_y ‖·‖² + mean_y min_x ‖·‖²
    (pytorch3d.loss.chamfer_distance semantics). Accepts [P,3]/[Q,3] or
    batched [B,P,3]/[B,Q,3]."""
    if x.ndim == 3:
        return jax.vmap(chamfer_distance)(x, y)
    d_x, d_y = nearest_dists_sq_sym(x, y)
    return jnp.mean(d_x) + jnp.mean(d_y)


def point_mesh_distance(points: jnp.ndarray, verts: jnp.ndarray,
                        faces: jnp.ndarray) -> jnp.ndarray:
    """Mean squared point-to-triangle distance / n_points (reference
    _point_mesh_distance, test.py:522-533). Exact point-triangle distances
    via the host Ericson kernel (offline metric, not a training path)."""
    import numpy as np

    from ..geometry.simplify import _point_triangle_closest

    tri = np.asarray(verts)[np.asarray(faces)]
    pts = np.asarray(points)
    best = np.full(len(pts), np.inf)
    for s in range(0, len(pts), 1024):
        d2 = _point_triangle_closest(pts[s:s + 1024], tri)
        best[s:s + 1024] = d2.min(axis=1)
    return float(best.sum() / len(pts) ** 2)


@partial(jax.jit, static_argnames=("n_iters",))
def sinkhorn_divergence(x: jnp.ndarray, y: jnp.ndarray,
                        epsilon: float = 0.05,
                        n_iters: int = 50) -> jnp.ndarray:
    """Entropic-regularized OT distance between two point clouds with
    uniform weights (the geomloss SamplesLoss('sinkhorn') the reference
    imports for mesh fitting, test.py:394 — its use is commented out there;
    provided here as a working option). Plain Sinkhorn in log-space."""
    p, q = x.shape[0], y.shape[0]
    # expansion form: one MXU matmul instead of a [P, Q, 3] tensor
    cost = jnp.maximum(
        jnp.sum(x * x, -1)[:, None] + jnp.sum(y * y, -1)[None, :]
        - 2.0 * jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST),
        0.0)
    log_mu = jnp.full(p, -jnp.log(p))
    log_nu = jnp.full(q, -jnp.log(q))

    def body(carry, _):
        f, g = carry
        f = -epsilon * jax.nn.logsumexp(
            (g[None, :] - cost) / epsilon + log_nu[None, :], axis=1)
        g = -epsilon * jax.nn.logsumexp(
            (f[:, None] - cost) / epsilon + log_mu[:, None], axis=0)
        return (f, g), None

    (f, g), _ = jax.lax.scan(body, (jnp.zeros(p), jnp.zeros(q)), None,
                             length=n_iters)
    coupling = jnp.exp((f[:, None] + g[None, :] - cost) / epsilon
                       + log_mu[:, None] + log_nu[None, :])
    return jnp.sum(coupling * cost)
