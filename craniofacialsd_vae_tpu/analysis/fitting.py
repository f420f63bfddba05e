"""Latent fitting of an unregistered scan (reference test.py:336-520).

The core of the reference's mesh-fitting experiment, factored out of the
Tester so the serving path can fit scans without the training dataset:
Procrustes landmark alignment onto the template frame, then Adam over a
population of latent restarts minimizing ``10·landmark-MSE + chamfer``,
keeping the best restart. Classification of the result stays with the
callers (Tester adds per-region predictions and artifact export; serving
builds a diagnosis report).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def procrustes_align(scan: np.ndarray, landmarks: np.ndarray,
                     tpl_landmarks: np.ndarray):
    """Align an unregistered scan onto the template's landmark frame
    (reference test.py:350-373: centered/normalized orthogonal
    Procrustes, then re-scaled into the template frame). Returns
    (aligned_scan, aligned_landmarks), float64."""
    from scipy.linalg import orthogonal_procrustes

    scan = np.asarray(scan, np.float64)
    landmarks = np.asarray(landmarks, np.float64)
    tpl_lnd = np.asarray(tpl_landmarks, np.float64)

    t_tpl = tpl_lnd.mean(0)
    c_tpl = tpl_lnd - t_tpl
    n_tpl = np.linalg.norm(c_tpl)
    c_tpl = c_tpl / n_tpl

    t_new = landmarks.mean(0)
    c_new = landmarks - t_new
    n_new = np.linalg.norm(c_new)
    c_new = c_new / n_new

    rotation, scale = orthogonal_procrustes(c_tpl, c_new)

    aligned = (scan - t_new) / n_new
    aligned = (aligned @ rotation.T) * scale
    aligned = aligned * n_tpl + t_tpl
    aligned_lnd = (c_new @ rotation.T) * scale * n_tpl + t_tpl
    return aligned, aligned_lnd


def fit_latent(manager, norm: dict | None, scan: np.ndarray,
               landmarks: np.ndarray, landmarks_idx, *, lr: float = 5e-3,
               iterations: int = 250, n_restarts: int = 16, seed: int = 0,
               z_anchor: np.ndarray | None = None, mesh=None) -> dict:
    """Fit a latent to an unregistered scan.

    scan: [M, 3] raw vertices (any M); landmarks: [K, 3] picked on the
    scan, corresponding to ``landmarks_idx`` on the template. norm is the
    run's normalization dict (None for unnormalized runs). z_anchor seeds
    one restart deterministically (the Tester passes the train-latent
    means, reference test.py:381-389; serving has no dataset and anchors
    at the VAE prior mean, zeros). Returns {z, vertices (raw scan space),
    chamfer_mm2, landmark_mse_mm2, aligned_scan}.

    ``mesh``: an optional 1-axis `jax.sharding.Mesh` — the restarts are
    independent, so they shard embarrassingly across it (n_restarts
    rounds up to a mesh multiple; the extra restarts only add
    candidates). Restart→device placement changes nothing numerically:
    each restart's trajectory is independent of the others.
    """
    import optax

    mgr = manager
    landmarks_idx = list(landmarks_idx)
    aligned, aligned_lnd = procrustes_align(
        scan, landmarks, mgr.template.pos[landmarks_idx])

    if mesh is not None:
        n_dev = mesh.devices.size
        n_restarts = -(-n_restarts // n_dev) * n_dev   # round up to mesh
    rng = np.random.default_rng(seed)
    z0 = rng.standard_normal(
        (n_restarts - 1, mgr.model_latent_size)).astype(np.float32)
    anchor = np.zeros(mgr.model_latent_size, np.float32) \
        if z_anchor is None else np.asarray(z_anchor, np.float32)
    z0 = np.concatenate([z0, anchor[None]], axis=0)

    target_lnd = jnp.asarray(aligned_lnd, jnp.float32)
    lnd_idx = jnp.asarray(landmarks_idx)
    if norm is not None:
        mean_j = jnp.asarray(norm["mean"])
        std_j = jnp.asarray(norm["std"])
    else:
        mean_j, std_j = jnp.zeros(3), jnp.ones(3)

    from ..models.sdvae import decode, from_vertex_major
    from ..ops.distances import nearest_dists_sq_sym

    params = mgr.state.params
    geom = mgr.geometry
    config = mgr.net_config

    # Bucket the (subsampled) chamfer target to the next power of two:
    # every patient scan has a different vertex count, and an exact-shape
    # jit would recompile the whole scanned optimization per request.
    # Padding duplicates a real point, so the gen→target min is EXACT
    # (duplicates never introduce new distances); the target→gen
    # direction divides the masked sum by the true count.
    t_sub = np.asarray(aligned, np.float32)[::4]
    q = len(t_sub)
    q_pad = 1 << (q - 1).bit_length()
    t_padded = jnp.asarray(np.concatenate(
        [t_sub, np.broadcast_to(t_sub[:1], (q_pad - q, 3))]))
    t_mask = jnp.asarray((np.arange(q_pad) < q).astype(np.float32))

    def chamfer_bucketed(g):
        d_g, d_t = nearest_dists_sq_sym(g, t_padded)
        return jnp.mean(d_g) + jnp.sum(d_t * t_mask) / q

    def losses(z):
        gen = from_vertex_major(decode(params, geom, config, z))
        gen = gen * std_j + mean_j                    # [R, N, 3]
        lnd_loss = jnp.mean(
            (gen[:, lnd_idx, :] - target_lnd) ** 2, axis=(1, 2))
        # gen side subsampled too (template-resolution, static shape)
        ch = jax.vmap(lambda g: chamfer_bucketed(g[::4]))(gen)
        return lnd_loss, ch

    def loss_fn(z):
        lnd_loss, ch = losses(z)
        return jnp.sum(10.0 * lnd_loss + ch)

    opt = optax.adam(lr)

    # The whole optimization is ONE dispatch: a host loop of per-step
    # jits pays a tunnel round-trip per iteration (measured 45 s for a
    # 250-iteration intake request vs ~7 s scanned — same update
    # sequence, so results are identical). `iterations` is a static scan
    # length: one compile per distinct value, reused across requests.
    @jax.jit
    def run(z, opt_state):
        def body(carry, _):
            z, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(z)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(z, updates), opt_state), loss
        (z, opt_state), _ = jax.lax.scan(body, (z, opt_state), None,
                                         length=iterations)
        # final per-restart losses come back in the same dispatch
        return z, losses(z)

    z = jnp.asarray(z0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        # committed placement: jit propagates the restart sharding
        # through the whole scanned optimization (params broadcast once
        # per request — amortized over the single dispatch)
        z = jax.device_put(
            z, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0])))
    z, (lnd_loss, ch) = run(z, opt.init(z))
    errors = 10.0 * np.asarray(lnd_loss) + np.asarray(ch)
    best = int(np.argmin(errors))
    z_best = np.asarray(z)[best]

    gen = np.asarray(mgr.generate(z_best))
    if norm is not None:
        gen = gen * norm["std"] + norm["mean"]
    return {"z": z_best, "vertices": gen,
            "chamfer_mm2": float(np.asarray(ch)[best] * mgr.to_mm_const),
            "landmark_mse_mm2": float(np.asarray(lnd_loss)[best]
                                      * mgr.to_mm_const),
            "aligned_scan": aligned}
