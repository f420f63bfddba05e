"""Diagnosis uncertainty via VAE posterior sampling.

A point diagnosis ``argmax_c log p(c | mu(x))`` hides how much the
decision depends on the encoder's posterior spread: the VAE assigns the
scan a whole distribution ``q(z|x) = N(mu, diag(exp(logvar)))``, and
latents inside that posterior may classify differently. This module
propagates the posterior through the QDA head — sample ``z_k ~ q(z|x)``,
classify every sample — and summarizes the spread per scan: the fraction
of samples that agree with the point diagnosis, per-class vote counts,
the mean/std of the class posteriors over samples, and the predictive
entropy of the sample-averaged posterior. Low agreement flags a scan
whose diagnosis is not supported across the encoder's own uncertainty —
exactly the cases a clinician should review rather than trust.

TPU shape: ONE jitted dispatch per batch — normalize → encode → K
reparameterized samples per scan → QDA log-posteriors of all B·K
samples through the padded-einsum closed form
(:func:`analysis.saliency.make_qda_log_posterior`, exactly equal to the
numpy head). The per-scan noise is folded from the PRNG key by ROW index
(``fold_in(key, i)``), so bucket padding can never change a real row's
draw (serving pads requests to static shapes).

Requires a VAE run (``kl_weight > 0``): an AE has no posterior to
sample. New surface beyond the reference, whose diagnosis is a bare
label (demo.ipynb cell 11 / model_manager.py:531-546); the sampling
semantics follow the model's own reparameterization
(models/sdvae.py reparameterize).
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_uncertainty_fn", "summarize_uncertainty",
           "summarize_ensemble"]


def make_uncertainty_fn(manager, normalization: dict, qda,
                        n_samples: int):
    """Build the jittable posterior-sampling diagnosis program.

    Returns ``fn(params, x_raw, key)`` with ``x_raw`` raw scan-space
    [B, N, 3] and ``key`` a jax PRNG key →
    ``(mu [B, Z], lp_mu [B, C], sample_lp [B, K, C], sample_pred [B, K],
    z_samples [B, K, Z])``, where class positions index into
    ``qda.classes`` (the classes the QDA actually saw — NOT the run's
    label-index space). ``sample_pred[b, k]`` is the argmax class of
    sample k; row b's eps block is ``normal(fold_in(key, b), (K, Z))``,
    independent of the batch/bucket size."""
    import jax
    import jax.numpy as jnp

    from ..models import encode
    from .saliency import make_qda_log_posterior

    if not manager.net_config.is_vae:
        raise ValueError(
            "posterior-sampling uncertainty requires a VAE run "
            "(kl_weight > 0) — an AE encoder has no posterior to sample")
    if int(n_samples) < 1:
        raise ValueError(f"n_samples must be >= 1; got {n_samples}")
    # host-resident geometry copy: these programs close over the
    # tables (self-contained by design), and tracing a TPU-resident
    # constant fetches every array over the tunnel — see manager's
    # geometry_host note
    geom = getattr(manager, "geometry_host", manager.geometry)
    config = manager.net_config
    # None for runs trained with normalize_data: False (model-space scans)
    if normalization is None:
        normalization = {"mean": 0.0, "std": 1.0}
    mean = jnp.asarray(normalization["mean"], jnp.float32)
    std = jnp.asarray(normalization["std"], jnp.float32)
    log_post = make_qda_log_posterior(qda)
    k = int(n_samples)

    def fn(params, x_raw, key):
        xn = (x_raw - mean) / std
        mu, logvar = encode(params, geom, config, jnp.swapaxes(xn, 0, 1))
        sigma = jnp.exp(0.5 * logvar)
        zdim = mu.shape[1]

        def row_eps(i):
            return jax.random.normal(jax.random.fold_in(key, i),
                                     (k, zdim), jnp.float32)

        eps = jax.vmap(row_eps)(jnp.arange(mu.shape[0]))     # [B, K, Z]
        z = mu[:, None, :] + eps * sigma[:, None, :]
        sample_lp = log_post(z.reshape(-1, zdim))
        sample_lp = sample_lp.reshape(mu.shape[0], k, -1)    # [B, K, C]
        sample_pred = jnp.argmax(sample_lp, axis=-1).astype(jnp.int32)
        return mu, log_post(mu), sample_lp, sample_pred, z

    return fn


def _softmax(lp: np.ndarray) -> np.ndarray:
    p = np.exp(lp - lp.max(axis=-1, keepdims=True))
    return p / p.sum(axis=-1, keepdims=True)


def summarize_uncertainty(lp_mu, sample_lp, sample_pred, qda_classes,
                          idx2class) -> list:
    """Host-side per-scan uncertainty summaries.

    ``lp_mu`` [B, C] / ``sample_lp`` [B, K, C] / ``sample_pred`` [B, K]
    as returned by the program; ``qda_classes`` the QDA's class-label
    array; ``idx2class`` maps run label index → letter. Returns one dict
    per scan:

    - ``label``: the point (mu) diagnosis — identical to ``diagnose``'s
    - ``label_agreement``: fraction of posterior samples whose argmax
      matches the point diagnosis (1.0 = the decision is stable across
      the encoder's whole posterior)
    - ``sample_votes``: per-class argmax counts over the K samples
    - ``posterior_mean`` / ``posterior_std``: per-class statistics of
      the sample posteriors (softmaxed log-posteriors)
    - ``predictive_entropy_nats``: entropy of the sample-averaged
      posterior — the standard predictive-uncertainty scalar
    - ``n_samples``
    """
    lp_mu = np.asarray(lp_mu, np.float64)
    sample_lp = np.asarray(sample_lp, np.float64)
    if sample_lp.ndim != 3 or sample_lp.shape[0] != lp_mu.shape[0]:
        raise ValueError(
            f"sample_lp must be [B, K, C] matching lp_mu [B, C]; got "
            f"{sample_lp.shape} vs {lp_mu.shape}")
    sample_pred = np.asarray(sample_pred)
    labels = [idx2class[int(c)] for c in np.asarray(qda_classes)]
    n_classes = len(labels)
    k = sample_lp.shape[1]

    point_pos = np.argmax(lp_mu, axis=-1)                    # [B]
    sample_post = _softmax(sample_lp)                        # [B, K, C]
    mean_post = sample_post.mean(axis=1)                     # [B, C]
    std_post = sample_post.std(axis=1)
    entropy = np.maximum(
        -np.sum(mean_post * np.log(np.clip(mean_post, 1e-12, None)),
                axis=-1), 0.0)

    out = []
    for i in range(lp_mu.shape[0]):
        votes = np.bincount(sample_pred[i], minlength=n_classes)
        out.append({
            "label": labels[int(point_pos[i])],
            "label_agreement": float(
                (sample_pred[i] == point_pos[i]).mean()),
            "sample_votes": {labels[c]: int(votes[c])
                             for c in range(n_classes)},
            "posterior_mean": {labels[c]: float(mean_post[i, c])
                               for c in range(n_classes)},
            "posterior_std": {labels[c]: float(std_post[i, c])
                              for c in range(n_classes)},
            "predictive_entropy_nats": float(entropy[i]),
            "n_samples": int(k),
        })
    return out


def summarize_ensemble(member_reports) -> list:
    """Cross-member (deep-ensemble) consensus over per-member diagnosis
    reports.

    ``member_reports`` is [K][B]: for each of K independently-trained
    members (training/ensemble.py), the report list that member's
    ``DiagnosisService.diagnose`` returned for the SAME B scans (each
    report carries ``label`` and the QDA ``posteriors`` dict). Returns
    one consensus dict per scan:

    - ``label``: the majority vote (ties broken to the alphabetically
      first label, deterministically)
    - ``member_agreement``: the majority's fraction of the K votes —
      cross-member disagreement is the epistemic-uncertainty signal
      (what the training data never pinned down), complementary to the
      within-member posterior sampling of :func:`make_uncertainty_fn`
    - ``member_votes``: per-class vote counts
    - ``posterior_mean`` / ``posterior_std``: per-class statistics of
      the member posteriors
    - ``predictive_entropy_nats``: entropy of the member-averaged
      posterior
    - ``n_members``
    """
    k = len(member_reports)
    if k == 0:
        raise ValueError("need at least one member's reports")
    b = len(member_reports[0])
    if any(len(r) != b for r in member_reports):
        raise ValueError("members reported different scan counts: "
                         f"{[len(r) for r in member_reports]}")
    classes = list(member_reports[0][0]["posteriors"])
    out = []
    for i in range(b):
        labels = [member_reports[m][i]["label"] for m in range(k)]
        post = np.array([[member_reports[m][i]["posteriors"][c]
                          for c in classes] for m in range(k)], np.float64)
        votes = {c: labels.count(c) for c in sorted(set(labels))}
        # deterministic tie-break: highest count, then alphabetical
        top = max(votes.values())
        majority = sorted(c for c, n in votes.items() if n == top)[0]
        mean_post = post.mean(axis=0)
        out.append({
            "label": majority,
            "member_agreement": votes[majority] / k,
            "member_votes": {c: votes.get(c, 0) for c in classes},
            "posterior_mean": {c: float(mean_post[j])
                               for j, c in enumerate(classes)},
            "posterior_std": {c: float(post[:, j].std())
                              for j, c in enumerate(classes)},
            "predictive_entropy_nats": float(max(-np.sum(
                mean_post * np.log(np.clip(mean_post, 1e-12, None))), 0.0)),
            "n_members": k,
        })
    return out
