"""Diagnostic saliency: gradient attribution of a QDA diagnosis onto the
scan surface.

The diagnosis of a raw scan ``x`` is ``argmax_c log p(c | mu(x))`` over
the QDA head's class Gaussians. Saliency asks *which surface vertices
drive that decision*: the gradient of the log-posterior margin

    m(x) = log p(c_pred | mu(x)) - log p(c_ref | mu(x))

with respect to the raw vertex coordinates, reduced to one magnitude per
vertex (the L2 norm over xyz, reported in nats per millimetre of vertex
displacement). A large value means "moving this vertex changes the
diagnostic evidence fastest" — the mesh analog of input-gradient saliency
maps, aggregated per anatomical region for the clinical report.

``c_ref`` defaults to the healthy class ("what pushes this scan away from
healthy"); when the prediction IS healthy that margin is identically zero,
so the reference falls back to the runner-up class — the margin then reads
"how firmly healthy vs the closest differential diagnosis".

The whole computation — normalize → encode → QDA log-posteriors →
per-sample margin → reverse-mode gradient → per-vertex magnitude — is ONE
jittable function of (params, raw vertices), so it serves through the same
bucketed static-shape dispatch as every other deployment program
(serving.DiagnosisService.saliency) and batches across the evaluation set
(Tester.saliency_maps). The QDA enters through its sklearn-style
factorization (rotations/scalings, classifiers.QDAClassifier:85-97) padded
to a dense [C, D, Rmax] tensor, making the log-posteriors a single einsum —
closed-form, differentiable, and exactly equal to the numpy head.

New surface beyond the reference (which offers no explanation of its
classifier outputs); the per-region aggregation follows the reference's
anatomical segmentation (utils.py:93-135) and the colormap exports reuse
its error-render conventions (utils.py:168-177).
"""

from __future__ import annotations

import numpy as np

__all__ = ["qda_log_posterior_constants", "make_qda_log_posterior",
           "make_margin_fn", "make_saliency_fn", "region_attribution"]


def qda_log_posterior_constants(qda) -> dict:
    """Dense, padded constants for computing QDA log-posteriors in jnp.

    Returns ``means`` [C, D], ``scaled_rot`` [C, D, Rmax] (each class's
    rotations divided by sqrt(scalings), zero-padded past its rank — the
    zero columns contribute nothing to the quadratic form) and
    ``log_offsets`` [C] (``-0.5·Σ log s2 + log prior``), such that

        log p(c | z) = -0.5·‖(z - mean_c) @ scaled_rot_c‖² + log_offsets_c

    matches :meth:`QDAClassifier.log_posteriors` exactly."""
    qda._ensure_factors()
    means = np.asarray(qda.means, np.float32)
    n_classes, dim = means.shape
    rmax = max(r.shape[1] for r in qda.rotations)
    scaled_rot = np.zeros((n_classes, dim, rmax), np.float32)
    log_offsets = np.zeros(n_classes, np.float64)
    for i, (rot, s2) in enumerate(zip(qda.rotations, qda.scalings)):
        scaled_rot[i, :, :rot.shape[1]] = rot / np.sqrt(s2)
        log_offsets[i] = -0.5 * np.sum(np.log(s2)) + np.log(qda.priors[i])
    return {"means": means, "scaled_rot": scaled_rot,
            "log_offsets": log_offsets.astype(np.float32)}


def make_qda_log_posterior(qda):
    """jnp closure over the padded constants: latents [B, D] →
    log-posteriors [B, C] (log prior + Gaussian log-pdf up to the shared
    normalizer), exactly equal to :meth:`QDAClassifier.log_posteriors`.
    Shared by the saliency margin and the posterior-sampling uncertainty
    programs (analysis/uncertainty.py)."""
    import jax.numpy as jnp

    consts = qda_log_posterior_constants(qda)
    q_means = jnp.asarray(consts["means"])
    q_srot = jnp.asarray(consts["scaled_rot"])
    q_off = jnp.asarray(consts["log_offsets"])

    def log_post(z):                                 # [B, D] → [B, C]
        diff = z[:, None, :] - q_means[None]         # [B, C, D]
        proj = jnp.einsum("bcd,cdr->bcr", diff, q_srot)
        return -0.5 * jnp.sum(proj * proj, axis=-1) + q_off

    return log_post


def make_margin_fn(manager, normalization: dict, qda,
                   healthy_class_idx: int):
    """Build the jittable diagnosis-margin program.

    Returns ``margin_fn(params, x)`` with ``x`` raw scan-space [B, N, 3]
    → ``(margin [B], pred_pos [B], ref_pos [B], log_post [B, C],
    mu [B, Z])``, where ``pred_pos``/``ref_pos`` index into
    ``qda.classes`` (NOT the run's class-index space — QDA only fits
    classes present in training). The margin is the predicted-class
    log-posterior minus the reference class's: the healthy class, or the
    runner-up when the prediction IS healthy (see module note).

    ``healthy_class_idx`` is the run's class LABEL index (e.g.
    ``manager.class2idx('n')``); loud when the QDA never saw it.
    ``normalization`` may be None for runs trained with
    ``normalize_data: False`` — the scan is already in model space."""
    import jax.numpy as jnp

    from ..models import encode

    # host-resident geometry copy: these programs close over the
    # tables (self-contained by design), and tracing a TPU-resident
    # constant fetches every array over the tunnel — see manager's
    # geometry_host note
    geom = getattr(manager, "geometry_host", manager.geometry)
    config = manager.net_config
    if normalization is None:
        normalization = {"mean": 0.0, "std": 1.0}
    mean = jnp.asarray(normalization["mean"], jnp.float32)
    std = jnp.asarray(normalization["std"], jnp.float32)
    healthy_pos = qda._class_index(healthy_class_idx)

    _log_post = make_qda_log_posterior(qda)
    n_classes = len(qda.classes)

    def margin_fn(params, x_raw):
        xn = (x_raw - mean) / std
        mu, _ = encode(params, geom, config, jnp.swapaxes(xn, 0, 1))
        lp = _log_post(mu)
        pred = jnp.argmax(lp, axis=1)
        # runner-up = best class other than the prediction; becomes the
        # reference when the prediction IS the healthy class
        is_pred = jnp.arange(n_classes)[None] == pred[:, None]
        runner = jnp.argmax(jnp.where(is_pred, -jnp.inf, lp), axis=1)
        ref = jnp.where(pred == healthy_pos, runner, healthy_pos)

        def take(a, i):
            return jnp.take_along_axis(a, i[:, None], axis=1)[:, 0]

        margin = take(lp, pred) - take(lp, ref)
        return margin, pred.astype(jnp.int32), ref.astype(jnp.int32), \
            lp, mu

    return margin_fn


def make_saliency_fn(manager, normalization: dict, qda,
                     healthy_class_idx: int):
    """Build the jittable saliency program: :func:`make_margin_fn` plus
    one reverse-mode gradient and the per-vertex reduction.

    Returns ``fn(params, x)`` with ``x`` raw scan-space [B, N, 3] →
    ``(saliency [B, N], margin [B], pred_pos [B], ref_pos [B],
    log_post [B, C], mu [B, Z])`` — saliency in nats/mm (see
    :func:`make_margin_fn` for the index spaces)."""
    import jax
    import jax.numpy as jnp

    margin_fn = make_margin_fn(manager, normalization, qda,
                               healthy_class_idx)
    to_mm = float(manager.to_mm_const)

    def fn(params, x):
        def margin_sum(x_raw):
            margin, pred, ref, lp, mu = margin_fn(params, x_raw)
            # samples are independent through encode, so the gradient of
            # the batch SUM is the per-sample gradient stack
            return jnp.sum(margin), (margin, pred, ref, lp, mu)

        grads, (margin, pred, ref, lp, mu) = \
            jax.grad(margin_sum, has_aux=True)(x)
        # raw-space gradient → per-mm: mm = raw · to_mm ⇒ ∂/∂mm = ∂/∂raw
        # / to_mm. L2 over xyz gives one magnitude per vertex.
        saliency = jnp.sqrt(jnp.sum(grads * grads, axis=-1)) / to_mm
        return saliency, margin, pred, ref, lp, mu

    return fn


def region_attribution(saliency, template) -> list:
    """Aggregate a per-vertex saliency map [N] over the template's
    anatomical regions. Returns rows sorted by descending share:
    ``{region, attribute, share, mean_nats_per_mm, n_vertices}`` — share
    is the region's fraction of total saliency mass. ``region`` is the
    region *key* (the vertex-color string, in first-seen order — the
    invariant the latent slices hang on); ``attribute`` is the human
    anatomical name where the color is a known clinical region
    (COLOUR2ATTRIBUTE, reference utils.py:45-61), else the key itself."""
    from ..geometry.template import COLOUR2ATTRIBUTE

    sal = np.asarray(saliency, np.float64).reshape(-1)
    if sal.shape[0] != template.num_vertices:
        raise ValueError(
            f"saliency has {sal.shape[0]} entries for a "
            f"{template.num_vertices}-vertex template")
    total = float(sal.sum())
    rows = []
    for name in template.region_names:
        mask = template.region_vertex_mask(name)
        mass = float(sal[mask].sum())
        rows.append({
            "region": name,
            "attribute": COLOUR2ATTRIBUTE.get(name, name),
            "share": mass / total if total > 0 else 0.0,
            "mean_nats_per_mm": float(sal[mask].mean()) if mask.any()
            else 0.0,
            "n_vertices": int(mask.sum()),
        })
    rows.sort(key=lambda r: r["share"], reverse=True)
    return rows
