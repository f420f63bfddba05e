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

import weakref

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


# Jitted scanned-optimization programs, keyed per (manager, lr,
# iterations). Everything request-specific — params, restart latents,
# bucketed chamfer target/mask/count, landmarks, normalization — enters
# as ARGUMENTS, so requests that share shapes share the compiled program
# exactly (closure-captured arrays would embed per-request constants in
# the module and defeat both the in-process and persistent compile
# caches). Params are an argument too: a manager that resumes new
# weights keeps using the same program. Weak-keyed on the manager:
# an id()-keyed dict would both pin the closed-over geometry forever and
# risk serving a dead manager's program to a new object recycling its
# address.
_FIT_RUN_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _get_fit_run(mgr, lr: float, iterations: int):
    per_mgr = _FIT_RUN_CACHE.setdefault(mgr, {})
    run = per_mgr.get((lr, iterations))
    if run is not None:
        return run
    import optax

    from ..models.sdvae import decode, from_vertex_major
    from ..ops.distances import nearest_dists_sq_sym

    geom, config = mgr.geometry, mgr.net_config
    opt = optax.adam(lr)

    def losses(params, z, c):
        gen = from_vertex_major(decode(params, geom, config, z))
        gen = gen * c["std"] + c["mean"]              # [R, N, 3]
        lnd_loss = jnp.mean(
            (gen[:, c["lnd_idx"], :] - c["target_lnd"]) ** 2, axis=(1, 2))

        def chamfer_bucketed(g):                      # gen side at [::4]
            d_g, d_t = nearest_dists_sq_sym(g, c["t_padded"])
            return jnp.mean(d_g) + jnp.sum(d_t * c["t_mask"]) / c["q"]

        ch = jax.vmap(lambda g: chamfer_bucketed(g[::4]))(gen)
        return lnd_loss, ch

    def loss_fn(params, z, c):
        lnd_loss, ch = losses(params, z, c)
        return jnp.sum(10.0 * lnd_loss + ch)

    # The whole optimization is ONE dispatch: a host loop of per-step
    # jits pays a tunnel round-trip per iteration (measured 45 s for a
    # 250-iteration intake request vs scanned — same update sequence, so
    # results are identical). `iterations` is a static scan length.
    @jax.jit
    def run(params, z, opt_state, c):
        def body(carry, _):
            z, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn, argnums=1)(
                params, z, c)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(z, updates), opt_state), loss

        (z, opt_state), _ = jax.lax.scan(body, (z, opt_state), None,
                                         length=iterations)
        # final per-restart losses come back in the same dispatch
        return z, losses(params, z, c)

    per_mgr[(lr, iterations)] = run
    return run


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

    # Bucket the (subsampled) chamfer target to the next power of two:
    # every patient scan has a different vertex count, and an exact-shape
    # program would recompile the whole scanned optimization per request.
    # Padding duplicates a real point, so the gen→target min is EXACT
    # (duplicates never introduce new distances); the target→gen
    # direction divides the masked sum by the true count.
    t_sub = np.asarray(aligned, np.float32)[::4]
    q = len(t_sub)
    q_pad = 1 << (q - 1).bit_length()
    consts = {
        "t_padded": jnp.asarray(np.concatenate(
            [t_sub, np.broadcast_to(t_sub[:1], (q_pad - q, 3))])),
        "t_mask": jnp.asarray((np.arange(q_pad) < q).astype(np.float32)),
        "q": jnp.float32(q),
        "target_lnd": jnp.asarray(aligned_lnd, jnp.float32),
        "lnd_idx": jnp.asarray(landmarks_idx, jnp.int32),
        "mean": jnp.asarray(norm["mean"], jnp.float32)
            if norm is not None else jnp.zeros(3),
        "std": jnp.asarray(norm["std"], jnp.float32)
            if norm is not None else jnp.ones(3),
    }

    run = _get_fit_run(mgr, float(lr), int(iterations))
    z = jnp.asarray(z0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        # committed placement: jit propagates the restart sharding
        # through the whole scanned optimization (params broadcast once
        # per request — amortized over the single dispatch)
        z = jax.device_put(
            z, NamedSharding(mesh, PartitionSpec(mesh.axis_names[0])))
    opt = optax.adam(lr)
    z, (lnd_loss, ch) = run(mgr.state.params, z, opt.init(z), consts)
    errors = 10.0 * np.asarray(lnd_loss) + np.asarray(ch)
    best = int(np.argmin(errors))
    z_best = np.asarray(z)[best]

    gen = np.asarray(mgr.generate(z_best))
    if norm is not None:
        gen = gen * norm["std"] + norm["mean"]
    # squared distances need the SQUARED linear→mm constant (the reference
    # scales its squared fit losses by the linear constant but never
    # labels the units — test.py:423-425, 463-464; our serving contract
    # says mm²)
    mm2 = mgr.to_mm_const ** 2
    return {"z": z_best, "vertices": gen,
            "chamfer_mm2": float(np.asarray(ch)[best] * mm2),
            "landmark_mse_mm2": float(np.asarray(lnd_loss)[best] * mm2),
            "aligned_scan": aligned}
