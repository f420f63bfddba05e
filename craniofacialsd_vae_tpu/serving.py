"""Production serving for trained SD-VAE runs.

The reference has no deployment story — inference means re-running its
evaluation notebook against the training workspace. This module loads a
run directory (config snapshot + checkpoint + classifier zoo +
normalization stats) WITHOUT the training dataset and serves the
clinical requests — diagnosis, reconstruction-error screening, latent
encoding, scan fitting, and surgical planning — through TPU-shaped
inference programs:

- **Static batch buckets.** Requests are padded to the next bucket size
  (powers of two up to ``max_batch``) so every request shape hits XLA's
  compiled-program cache; larger batches stream in ``max_batch`` chunks.
  No dynamic shapes ever reach the compiler.
- **One dispatch per request.** Normalize → encode (→ decode →
  un-normalize → per-vertex mm error) is fused into a single jitted
  program, so a request costs one host→device transfer and one fetch —
  the floor on a tunneled chip where each round-trip is ~30 ms.
- **Host-side heads.** The classifier zoo (QDA posteriors, Mahalanobis
  distances, LDA projection) runs closed-form on the fetched latents —
  microseconds of numpy against a [B, Z] array.
- **Mesh-scaled screening.** ``data_parallel=True`` shards every
  bucket's batch axis over all visible devices (params replicated, via
  ``jax.sharding`` — no collectives: the model's gathers run over the
  unsharded vertex axis), so batch throughput scales with the chip
  mesh. Bucket sizes become multiples of the device count.

``tools/serve.py`` wraps this in a stdlib HTTP server. The service is
also directly usable as a library::

    svc = DiagnosisService.from_run_dir("outputs/run1")
    report = svc.diagnose(vertices)          # [B, N, 3] raw scan space

Reference parity notes: diagnosis = encode + QDA over latents
(reference demo.ipynb cell 11 / model_manager.py:531-546); the
normalization applied before encode matches data_loading.py:231-252.
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np


def load_normalization(precomputed_path: str) -> dict:
    """Per-vertex normalization stats from a precomputed dir — our
    ``norm.npz`` or a migrated reference ``norm.pt`` — without touching
    the training dataset (reference data_loading.py:231-252)."""
    norm_path = os.path.join(precomputed_path, "norm.npz")
    ref_norm_path = os.path.join(precomputed_path, "norm.pt")
    if os.path.exists(norm_path):
        z = np.load(norm_path)
        return {"mean": z["mean"], "std": z["std"]}
    if os.path.exists(ref_norm_path):
        from .data.dataset import _import_reference_norm
        mean, std = _import_reference_norm(ref_norm_path)
        return {"mean": mean, "std": std}
    raise FileNotFoundError(
        f"no normalization stats ({norm_path} or norm.pt) — the run's "
        "precomputed dir is required for serving")


def run_normalization(config: dict) -> dict | None:
    """The normalization the RUN's model expects at its input boundary:
    the precomputed stats when it trained with ``normalize_data`` (the
    default), or None when ``normalize_data: False`` — the net consumed
    raw coordinates, and applying the (still-cached) stats would feed it
    data scaled unlike anything it saw. Every inference-program builder
    treats None as identity."""
    if not config["data"].get("normalize_data", True):
        return None
    return load_normalization(config["data"]["precomputed_path"])


def classes_from_split(precomputed_path: str) -> dict:
    """class2idx map re-derived from the run's cached ``data_split.json``
    — the same first-letter labels (with 'b' ordered last) the training
    run used, so served indices match the fitted classifier heads."""
    split_path = os.path.join(precomputed_path, "data_split.json")
    if not os.path.exists(split_path):
        raise FileNotFoundError(
            f"no {split_path} — pass classes= explicitly")
    with open(split_path) as f:
        names = json.load(f)["train"]
    from .data.dataset import compute_class_weights
    from .utils import class_conversions_and_weights
    class2idx, _ = class_conversions_and_weights(
        compute_class_weights(names))
    return class2idx


def build_raw_programs(manager, normalization: dict) -> dict:
    """The three raw-scan-space inference programs every deployment
    surface shares — DiagnosisService jits them per bucket, and
    ``export.py`` serializes them as ahead-of-time StableHLO artifacts.

    Each is a pure ``fn(params, array)`` closing over the geometry
    tables, normalization stats and mm scale:

    - ``encode``:      raw [B, N, 3] → mu [B, Z]
    - ``decode``:      z [B, Z] → raw [B, N, 3]
    - ``reconstruct``: raw [B, N, 3] → (recon raw [B, N, 3],
      per-vertex mm error [B, N], mu [B, Z]) in one dispatch
    """
    import jax.numpy as jnp

    from .models import decode, encode

    # host-resident geometry copy: these programs close over the
    # tables (self-contained by design), and tracing a TPU-resident
    # constant fetches every array over the tunnel — see manager's
    # geometry_host note
    geom = getattr(manager, "geometry_host", manager.geometry)
    config = manager.net_config
    if normalization is None:   # normalize_data: False → identity
        normalization = {"mean": 0.0, "std": 1.0}
    mean = jnp.asarray(normalization["mean"], jnp.float32)
    std = jnp.asarray(normalization["std"], jnp.float32)
    to_mm = float(manager.to_mm_const)

    def _encode_raw(params, x):          # raw [B, N, 3] → mu [B, Z]
        xn = (x - mean) / std
        mu, _ = encode(params, geom, config, jnp.swapaxes(xn, 0, 1))
        return mu

    def _reconstruct_raw(params, x):
        xn = (x - mean) / std
        mu, _ = encode(params, geom, config, jnp.swapaxes(xn, 0, 1))
        out = jnp.swapaxes(decode(params, geom, config, mu), 0, 1)
        recon = out * std + mean
        err = jnp.sqrt(jnp.sum((recon - x) ** 2, axis=-1)) * to_mm
        return recon, err, mu

    def _decode_raw(params, z):          # [B, Z] → raw [B, N, 3]
        out = jnp.swapaxes(decode(params, geom, config, z), 0, 1)
        return out * std + mean

    return {"encode": _encode_raw, "reconstruct": _reconstruct_raw,
            "decode": _decode_raw}


class DiagnosisService:
    """Batched inference over a trained manager. Thread-safe: device
    dispatch is serialized behind one lock (jit programs are shared)."""

    def __init__(self, manager, normalization: dict,
                 healthy_class: str = "n", max_batch: int = 16,
                 data_parallel: bool = False):
        import jax

        from .analysis.tester import TEMPLATE_LANDMARKS_IDX

        self.manager = manager
        self.normalization = normalization
        self.healthy_class = healthy_class
        self.max_batch = int(max_batch)
        # Data-parallel serving: shard the batch axis of every bucket
        # over ALL visible devices (params replicated) — screening
        # throughput scales with the chip mesh; XLA partitions the
        # batch-major programs without collectives (the model's gathers
        # run over the vertex axis, which stays unsharded).
        self.n_devices = jax.device_count() if data_parallel else 1
        if data_parallel and self.max_batch % self.n_devices:
            raise ValueError(
                f"data_parallel serving pads each request to a multiple "
                f"of the {self.n_devices}-device mesh: max_batch "
                f"{self.max_batch} must be a multiple of it")
        # clinical landmark indices valid on this template (the full set
        # belongs to the flagship 17k template; override for others —
        # same contract as Tester.template_landmarks_idx)
        self.landmark_idx = [i for i in TEMPLATE_LANDMARKS_IDX
                             if i < manager.template.num_vertices]
        self.buckets = [b * self.n_devices
                        for b in (1, 2, 4, 8, 16, 32, 64, 128)
                        if b * self.n_devices <= self.max_batch]
        if self.buckets[-1] != self.max_batch:
            self.buckets.append(self.max_batch)
        self._lock = threading.Lock()
        self._latency_ms: list = []        # ring buffer, last 512 requests
        self.n_requests = 0
        self.n_meshes = 0

        jit_kwargs = {}
        self._mesh = None
        if self.n_devices > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            mesh = Mesh(np.array(jax.devices()), ("data",))
            self._mesh = mesh
            # params replicated, request batch split along axis 0; every
            # bucket size is a multiple of the mesh, so shards are even
            jit_kwargs["in_shardings"] = (
                NamedSharding(mesh, PartitionSpec()),
                NamedSharding(mesh, PartitionSpec("data")))

        programs = build_raw_programs(manager, normalization)
        self._jit_encode_raw = jax.jit(programs["encode"], **jit_kwargs)
        self._jit_reconstruct_raw = jax.jit(programs["reconstruct"],
                                            **jit_kwargs)
        self._jit_decode_raw = jax.jit(programs["decode"], **jit_kwargs)
        self._jit_kwargs = jit_kwargs
        self._jit_saliency_raw = None   # built lazily (reverse-mode
        # program; most deployments never request attribution maps)
        self._jit_uncertainty: dict = {}  # lazily, keyed by sample count
        # The service serves a frozen checkpoint: pin the params once in
        # the layout the jits expect. Under data_parallel this replicates
        # them across the mesh ONCE — feeding the manager's single-device
        # arrays would re-transfer the whole network on every request.
        self._serve_params = manager.state.params
        if self.n_devices > 1:
            self._serve_params = jax.device_put(
                manager.state.params, jit_kwargs["in_shardings"][0])

    # ------------------------------------------------------------------
    @classmethod
    def from_run_dir(cls, run_dir: str, classes: dict | None = None,
                     healthy_class: str = "n", max_batch: int = 16,
                     warm: bool = False,
                     data_parallel: bool = False) -> "DiagnosisService":
        """Build a service from ``outputs/<id>/`` alone: config snapshot,
        last checkpoint, classifier zoo, and the precomputed dir's
        normalization stats. The training dataset is NOT needed."""
        from .manager import ModelManager
        from .utils import get_config

        config_path = os.path.join(run_dir, "config.yaml")
        if not os.path.exists(config_path):
            raise FileNotFoundError(f"no config snapshot at {config_path}")
        config = get_config(config_path)
        precomp = config["data"]["precomputed_path"]
        if classes is None:
            classes = classes_from_split(precomp)
        # Size the MLP head from the run's own split cache — the training
        # dataset dir may be gone in deployment, and the manager's
        # directory scan would (rightly) fail loudly on it. Only when the
        # run actually configured classifier heads: injecting a classifier
        # section into a head-less run would send the manager down the
        # mlp_hidden_features path and crash with a KeyError instead of
        # the clear no-zoo error below.
        if config.get("classifier"):
            config["classifier"].setdefault("n_classes", len(classes))

        manager = ModelManager(config, precomputed_storage_path=precomp)
        manager.resume(os.path.join(run_dir, "checkpoints"))
        if manager.classifiers is None or manager.classifiers.qda is None:
            raise RuntimeError(
                f"run at {run_dir} has no fitted classifier zoo — "
                "diagnosis serving needs the trained heads")
        manager.set_class_conversions(classes)

        svc = cls(manager, run_normalization(config),
                  healthy_class=healthy_class, max_batch=max_batch,
                  data_parallel=data_parallel)
        if warm:
            svc.warmup()
        return svc

    # ------------------------------------------------------------------
    def _bucket(self, b: int) -> int:
        for size in self.buckets:
            if b <= size:
                return size
        return self.max_batch

    def _run_bucketed(self, fn, x: np.ndarray):
        """Dispatch [B, ...] through fn at bucket-padded static shapes,
        chunking batches above max_batch; returns outputs trimmed to B."""
        b = x.shape[0]
        params = self._serve_params
        outs = []
        for lo in range(0, b, self.max_batch):
            chunk = x[lo:lo + self.max_batch]
            n = chunk.shape[0]
            size = self._bucket(n)
            if size != n:        # pad by repeating the first mesh
                pad = np.broadcast_to(chunk[:1],
                                      (size - n,) + chunk.shape[1:])
                chunk = np.concatenate([chunk, pad], axis=0)
            res = fn(params, chunk)
            res = res if isinstance(res, tuple) else (res,)
            outs.append(tuple(np.asarray(r)[:n] for r in res))
        merged = tuple(np.concatenate(parts, axis=0)
                       for parts in zip(*outs))
        return merged if len(merged) > 1 else merged[0]

    def _observe(self, b: int, t0: float):
        self.n_requests += 1
        self.n_meshes += b
        self._latency_ms.append((time.perf_counter() - t0) * 1e3)
        if len(self._latency_ms) > 512:
            del self._latency_ms[:256]

    def _as_batch(self, vertices) -> tuple:
        """[N, 3] or [B, N, 3] → ([B, N, 3], was_single). Validates the
        vertex count against the template: a wrong-N input must be a
        clear client error, not a broadcast against the normalization
        stats that returns confident garbage."""
        x = np.asarray(vertices, np.float32)
        single = x.ndim == 2
        x = x[None] if single else x
        n = self.manager.geometry.spirals[0].num_vertices
        if x.ndim != 3 or x.shape[1] != n or x.shape[2] != 3:
            raise ValueError(
                f"vertices must be [N, 3] or [B, N, 3] with N={n} "
                f"(the run's template vertex count); got {x.shape}")
        if x.shape[0] == 0:
            raise ValueError("empty batch (B=0)")
        return x, single

    # ------------------------------------------------------------------
    def warmup(self):
        """Compile every bucket for encode + reconstruct up front so the
        first real request doesn't pay a trace+compile."""
        n = self.manager.geometry.spirals[0].num_vertices
        nz = self.manager.model_latent_size
        with self._lock:
            for size in self.buckets:
                x = np.zeros((size, n, 3), np.float32)
                z = np.zeros((size, nz), np.float32)
                np.asarray(self._jit_encode_raw(self._serve_params, x))
                [np.asarray(r) for r in
                 self._jit_reconstruct_raw(self._serve_params, x)]
                np.asarray(self._jit_decode_raw(self._serve_params, z))

    def warmup_fit(self, scan_points: int = 8192 * 4,
                   iterations: int = 250, n_restarts: int = 16):
        """Compile the fit-intake program up front: the scanned latent
        optimization is the service's largest compile (minutes through a
        remote compile helper), and fit_latent buckets the chamfer
        target to powers of two — warming one bucket serves every scan
        whose subsampled size lands in it. Runs one full fit against a
        template-derived fake scan (result discarded). Like warmup(),
        it does NOT count toward request stats — a multi-minute warmup
        latency sample would dominate p50/p95 until real traffic
        dilutes it."""
        if not self.landmark_idx:
            # non-flagship template with no valid clinical landmark ids:
            # fit needs landmarks, so there is nothing to warm — the
            # operator sets service.landmark_idx first (fit() says so)
            print("warmup_fit: no landmark indices valid on this "
                  "template — skipping fit warmup", flush=True)
            return
        tpl = np.asarray(self.manager.template.pos, np.float32)
        rng = np.random.default_rng(0)
        scan = tpl[rng.integers(0, len(tpl), size=int(scan_points))]
        self.fit(scan, tpl[self.landmark_idx],
                 iterations=int(iterations), n_restarts=int(n_restarts))
        with self._lock:                # undo the warmup's observation
            self.n_requests -= 1
            self.n_meshes -= 1
            if self._latency_ms:
                self._latency_ms.pop()

    def encode(self, vertices) -> np.ndarray:
        """Raw scan-space [B, N, 3] (or [N, 3]) → latents [B, Z]."""
        t0 = time.perf_counter()
        x, single = self._as_batch(vertices)
        with self._lock:
            mu = self._run_bucketed(self._jit_encode_raw, x)
            self._observe(x.shape[0], t0)
        return mu[0] if single else mu

    def decode(self, z) -> np.ndarray:
        """Latents [B, Z] (or [Z]) → raw scan-space vertices."""
        t0 = time.perf_counter()
        z = np.asarray(z, np.float32)
        single = z.ndim == 1
        z = z[None] if single else z
        nz = self.manager.model_latent_size
        if z.ndim != 2 or z.shape[1] != nz:
            raise ValueError(f"latent must be [Z] or [B, Z] with Z={nz}; "
                             f"got {z.shape}")
        if z.shape[0] == 0:
            raise ValueError("empty batch (B=0)")
        with self._lock:
            out = self._run_bucketed(self._jit_decode_raw, z)
            self._observe(z.shape[0], t0)
        return out[0] if single else out

    def diagnose(self, vertices, model: str = "qda",
                 n_samples: int = 0, seed: int = 0) -> list:
        """Raw scans → per-mesh diagnosis reports: predicted label, QDA
        class posteriors, and Mahalanobis distance to the healthy-class
        Gaussian (the planning/assessment metric). `model` picks the
        predicting head (qda/lda/svm/mlp), posteriors are always QDA
        (the only probabilistic head — reference mm.py:516-546).

        With ``n_samples > 0`` (VAE runs only) each report gains an
        ``uncertainty`` block: the encoder posterior q(z|x) is sampled
        ``n_samples`` times, every sample is QDA-classified, and the
        spread is summarized (label agreement, per-class vote counts,
        posterior mean/std, predictive entropy —
        analysis/uncertainty.py). Still ONE device dispatch: the
        sampling program returns mu alongside the sample posteriors.
        Per-scan noise is folded by row index, so results don't depend
        on bucket padding; across `max_batch` chunks the fold restarts
        (chunk-local row ids), which only correlates eps draws BETWEEN
        scans — each scan's own summary is unaffected. ``n_samples`` is
        capped at MAX_UNCERTAINTY_SAMPLES; the compiled program draws
        the next power of two and the summary uses the first
        ``n_samples`` (bounds both the device working set and the
        per-K program cache against client-chosen sample counts)."""
        x, single = self._as_batch(vertices)
        if not n_samples:
            mu = self.encode(x)
            reports = self._diagnosis_reports(mu, model,
                                              include_latent=True)
            return reports[0] if single else reports
        n_samples = int(n_samples)
        if not 1 <= n_samples <= self.MAX_UNCERTAINTY_SAMPLES:
            raise ValueError(
                f"n_samples must be in [1, {self.MAX_UNCERTAINTY_SAMPLES}]"
                f"; got {n_samples}")

        import jax

        from .analysis.uncertainty import summarize_uncertainty

        t0 = time.perf_counter()
        mgr = self.manager
        with self._lock:
            fn = self._uncertainty_jit(
                1 << (n_samples - 1).bit_length())
            key = jax.random.PRNGKey(int(seed))
            mu, lp_mu, sample_lp, sample_pred, _ = self._run_bucketed(
                lambda p, c: fn(p, c, key), x)
            self._observe(x.shape[0], t0)
        reports = self._diagnosis_reports(np.asarray(mu), model,
                                          include_latent=True)
        unc = summarize_uncertainty(lp_mu, sample_lp[:, :n_samples],
                                    sample_pred[:, :n_samples],
                                    mgr.classifiers.qda.classes,
                                    mgr._idx2class_dict)
        for rep, u in zip(reports, unc):
            rep["uncertainty"] = u
        return reports[0] if single else reports

    #: upper bound on diagnose(n_samples=...) — a request-controlled
    #: static shape must not be able to OOM the device or grow the
    #: program cache unboundedly (programs exist only at powers of two)
    MAX_UNCERTAINTY_SAMPLES = 256

    def _uncertainty_jit(self, n_samples: int):
        """Cached jitted posterior-sampling program per sample count
        (each K is a different static shape; callers quantize K to
        powers of two so at most 9 programs ever exist). Caller holds
        the lock."""
        fn = self._jit_uncertainty.get(n_samples)
        if fn is None:
            import jax

            from .analysis.uncertainty import make_uncertainty_fn

            kwargs = dict(self._jit_kwargs)
            if "in_shardings" in kwargs:
                p_sh, x_sh = kwargs["in_shardings"]
                # the PRNG key rides replicated, like the params
                kwargs["in_shardings"] = (p_sh, x_sh, p_sh)
            fn = jax.jit(
                make_uncertainty_fn(self.manager, self.normalization,
                                    self.manager.classifiers.qda,
                                    n_samples), **kwargs)
            self._jit_uncertainty[n_samples] = fn
        return fn

    def _diagnosis_reports(self, mu: np.ndarray, model: str,
                           include_latent: bool) -> list:
        """Per-row diagnosis reports for latents [B, Z]."""
        mgr = self.manager
        # the heads under the same lock as the jits: LDA/QDA/SVM are
        # closed-form numpy, but the MLP head dispatches device work —
        # the class promises serialized device dispatch
        with self._lock:
            labels = mgr.idx2class(mgr.classifiers.predict(mu, model=model))
            log_post = mgr.classifiers.qda.log_posteriors(mu)
        post = np.exp(log_post - log_post.max(axis=1, keepdims=True))
        post = post / post.sum(axis=1, keepdims=True)
        idx2class = mgr._idx2class_dict
        # QDA only fits classes that actually occur in the training
        # labels (e.g. 'b' merges into 'n' upstream), so posterior column
        # j belongs to qda.classes[j], NOT to class index j
        qda_classes = [int(c) for c in mgr.classifiers.qda.classes]
        healthy_idx = mgr.class2idx(self.healthy_class) \
            if self.healthy_class in mgr._class2idx_dict else None
        reports = []
        for i in range(mu.shape[0]):
            rep = {
                "label": labels[i],
                "posteriors": {idx2class[c]: float(post[i, j])
                               for j, c in enumerate(qda_classes)},
            }
            if include_latent:
                rep["latent"] = mu[i].tolist()
            if healthy_idx is not None:
                rep["mahalanobis_to_healthy"] = float(
                    mgr.classifiers.mahalanobis(mu[i], healthy_idx))
            reports.append(rep)
        return reports

    def reconstruct(self, vertices) -> dict:
        """Raw scans → reconstructions + per-vertex/mean error in mm —
        the screening metric (reference test.py:280-301 semantics)."""
        t0 = time.perf_counter()
        x, single = self._as_batch(vertices)
        with self._lock:
            recon, err, mu = self._run_bucketed(
                self._jit_reconstruct_raw, x)
            self._observe(x.shape[0], t0)
        out = {"vertices": recon, "vertex_errors_mm": err,
               "mean_error_mm": err.mean(axis=1), "latent": mu}
        if single:
            out = {k: v[0] for k, v in out.items()}
        return out

    def saliency(self, vertices, include_vertex_saliency: bool = True,
                 model: str = "qda") -> list:
        """Raw scans → diagnosis reports with gradient attribution: which
        vertices (and anatomical regions) drive each QDA prediction away
        from the healthy class (analysis/saliency.py — normalize → encode
        → QDA margin → reverse-mode gradient, one bucketed dispatch).
        Each report extends the `model`-head diagnosis with
        ``saliency_label`` / ``saliency_reference_class`` (the QDA pair
        the margin explains), ``margin_nats``, the sorted per-region
        attribution table, and (unless ``include_vertex_saliency=False``)
        the per-vertex map in nats/mm."""
        import jax

        t0 = time.perf_counter()
        x, single = self._as_batch(vertices)
        mgr = self.manager
        qda = mgr.classifiers.qda
        with self._lock:
            if self._jit_saliency_raw is None:
                from .analysis.saliency import make_saliency_fn
                if self.healthy_class not in mgr._class2idx_dict:
                    raise ValueError(
                        f"healthy class {self.healthy_class!r} is not "
                        f"among the run's classes "
                        f"{sorted(mgr._class2idx_dict)}")
                self._jit_saliency_raw = jax.jit(
                    make_saliency_fn(mgr, self.normalization, qda,
                                     mgr.class2idx(self.healthy_class)),
                    **self._jit_kwargs)
            sal, margin, pred, ref, _, mu = self._run_bucketed(
                self._jit_saliency_raw, x)
            self._observe(x.shape[0], t0)
        from .analysis.saliency import region_attribution
        reports = self._diagnosis_reports(np.asarray(mu), model,
                                          include_latent=False)
        qda_classes = np.asarray(qda.classes)
        for i, rep in enumerate(reports):
            rep["saliency_label"] = mgr.idx2class(int(qda_classes[pred[i]]))
            rep["saliency_reference_class"] = \
                mgr.idx2class(int(qda_classes[ref[i]]))
            rep["margin_nats"] = float(margin[i])
            rep["regions"] = region_attribution(sal[i], mgr.template)
            if include_vertex_saliency:
                rep["vertex_saliency_nats_per_mm"] = \
                    np.asarray(sal[i], np.float32)
        return reports[0] if single else reports

    def fit(self, vertices, landmarks, lr: float = 5e-3,
            iterations: int = 250, n_restarts: int = 16,
            seed: int = 0, model: str = "qda") -> dict:
        """Fit a latent to an UNREGISTERED scan (any vertex count) given
        [K, 3] landmarks picked on it (K = the template landmark set),
        then diagnose the fitted latent — the full clinical intake
        workflow (reference test.py:336-520) as one request. Heavy:
        ~iterations Adam steps over n_restarts latents; clients can trade
        accuracy for latency via the parameters."""
        from .analysis.fitting import fit_latent

        x = np.asarray(vertices, np.float32)
        lnd = np.asarray(landmarks, np.float32)
        if x.ndim != 2 or x.shape[-1] != 3 or x.shape[0] == 0:
            raise ValueError(f"scan must be [M, 3]; got {x.shape}")
        lnd_idx = self.landmark_idx
        if not lnd_idx:
            raise ValueError(
                "no landmark indices valid on this template — set "
                "service.landmark_idx")
        if lnd.shape != (len(lnd_idx), 3):
            raise ValueError(
                f"landmarks must be [{len(lnd_idx)}, 3] matching the "
                f"template landmark set; got {lnd.shape}")
        t0 = time.perf_counter()
        with self._lock:
            # under data_parallel the independent restarts shard across
            # the mesh (fit latency divides by the device count)
            result = fit_latent(self.manager, self.normalization, x, lnd,
                                lnd_idx, lr=lr, iterations=int(iterations),
                                n_restarts=int(n_restarts), seed=int(seed),
                                mesh=self._mesh)
            self._observe(1, t0)
        report = self.diagnose_latent(result["z"], model=model)
        return {"z": result["z"], "vertices": result["vertices"],
                "chamfer_mm2": result["chamfer_mm2"],
                "landmark_mse_mm2": result["landmark_mse_mm2"],
                "aligned_scan": result["aligned_scan"],
                "diagnosis": report}

    def diagnose_latent(self, z, model: str = "qda") -> dict:
        """Diagnosis report for one latent [Z] (host-side heads only)."""
        return self.diagnose_latents(
            np.asarray(z, np.float32).reshape(1, -1), model=model)[0]

    def diagnose_latents(self, z, model: str = "qda") -> list:
        """Diagnosis reports for latents [B, Z] — one batched head call
        (the MLP head dispatches device work; per-row loops would pay a
        dispatch per latent)."""
        z = np.asarray(z, np.float32)
        return self._diagnosis_reports(z.reshape(len(z), -1), model,
                                       include_latent=False)

    def plan(self, vertices=None, latent=None, n_p_to_3std: int = 8,
             n_linspace: int = 5000, model: str = "qda",
             decode_key_meshes: bool = True,
             include_paths: bool = False) -> dict:
        """Surgical planning for ONE patient: walk the latent toward the
        healthy-class QDA Gaussian, return the 3/2/1-std crossing latents,
        the per-procedure latent-distance table, and (by default) the
        decoded target meshes at each crossing — the reference's planning
        experiment (test.py:652-748) as a single deployment request.

        Pass either raw ``vertices`` ([N, 3], registered to the template)
        or a precomputed ``latent`` [Z]. ``include_paths`` additionally
        returns the full all-attributes and per-procedure z walks
        ([n_p_to_3std + 3, Z] each) for clients that decode their own
        frames via /decode."""
        from .analysis.planning import healthy_gaussian, plan_to_healthy

        t0 = time.perf_counter()
        if (vertices is None) == (latent is None):
            raise ValueError("pass exactly one of vertices / latent")
        if vertices is not None:
            x, single = self._as_batch(vertices)
            if not single and x.shape[0] != 1:
                raise ValueError("plan() takes ONE patient mesh")
            # internal dispatch (not self.encode): the whole plan request
            # is observed ONCE at the end — public sub-calls would count
            # it 3x in the request stats
            with self._lock:
                z_p = np.asarray(
                    self._run_bucketed(self._jit_encode_raw, x)[0],
                    np.float32)
        else:
            z_p = np.asarray(latent, np.float32).reshape(-1)
            nz = self.manager.model_latent_size
            if z_p.shape[0] != nz:
                raise ValueError(f"latent must have Z={nz} dims; "
                                 f"got {z_p.shape[0]}")
        mgr = self.manager
        if self.healthy_class not in mgr._class2idx_dict:
            raise ValueError(
                f"healthy class {self.healthy_class!r} is not among the "
                f"run's classes {sorted(mgr._class2idx_dict)}")
        mean_h, cov_h = healthy_gaussian(
            mgr.classifiers.qda, mgr.class2idx(self.healthy_class))
        result = plan_to_healthy(z_p, mean_h, cov_h, mgr.latent_regions,
                                 n_p_to_3std=int(n_p_to_3std),
                                 n_linspace=int(n_linspace))
        out = {
            "diagnosis": self.diagnose_latent(z_p, model=model),
            "z_patient": z_p,
            "z_3std": result["z_3std"], "z_2std": result["z_2std"],
            "z_1std": result["z_1std"],
            "z_mean_target": np.asarray(result["z_mean_target"],
                                        np.float32),
            "procedure_distances": result["procedure_distances"],
        }
        if include_paths:
            out["all_attributes"] = result["all_attributes"]
            out["procedures"] = result["procedures"]
        if decode_key_meshes:
            keys = ["z_3std", "z_2std", "z_1std", "z_mean_target"]
            zs = np.stack([np.asarray(out[k], np.float32) for k in keys])
            with self._lock:            # one bucketed dispatch
                meshes = self._run_bucketed(self._jit_decode_raw, zs)
            out["target_meshes"] = {k[2:]: meshes[i]
                                    for i, k in enumerate(keys)}
        with self._lock:                 # _observe mutates shared state
            self._observe(1, t0)
        return out

    def stats(self) -> dict:
        lat = sorted(self._latency_ms)
        import jax
        return {
            "requests": self.n_requests,
            "meshes": self.n_meshes,
            "p50_ms": lat[len(lat) // 2] if lat else None,
            "p95_ms": lat[int(len(lat) * 0.95)] if lat else None,
            "buckets": self.buckets,
            "n_devices": self.n_devices,
            "platform": jax.devices()[0].platform,
            "classes": dict(self.manager._class2idx_dict),
        }


class EnsembleService:
    """Consensus diagnosis over a trained deep ensemble.

    Wraps one :class:`DiagnosisService` per member run dir (the K
    standard run dirs tools/train_ensemble.py writes) and answers
    ``diagnose`` with the cross-member consensus
    (analysis.uncertainty.summarize_ensemble): majority label, member
    agreement, per-class posterior mean/std over members, predictive
    entropy — the epistemic-uncertainty view a single model cannot give.
    With ``n_samples > 0`` each member additionally samples its own
    encoder posterior, so the per-member blocks carry within-model
    uncertainty alongside the cross-member consensus.

    Only the consensus surface exists here; every single-model request
    (encode / decode / reconstruct / saliency / fit / plan) raises with
    a pointer to the member dirs, so the stock HTTP handler
    (tools/serve.py) serves an ensemble dir unchanged — unsupported
    endpoints surface as clear 400s.
    """

    #: single-model endpoints this service deliberately refuses
    _MEMBER_ONLY = ("encode", "decode", "reconstruct", "saliency", "fit",
                    "plan", "diagnose_latent", "diagnose_latents")

    def __init__(self, services: list):
        if not services:
            raise ValueError("EnsembleService needs at least one member")
        n = {s.manager.geometry.spirals[0].num_vertices for s in services}
        cls_maps = [dict(s.manager._class2idx_dict) for s in services]
        if len(n) != 1 or any(c != cls_maps[0] for c in cls_maps):
            raise ValueError(
                "ensemble members disagree on template vertex count or "
                f"class map (vertex counts {sorted(n)})")
        self.services = list(services)

    @classmethod
    def from_ensemble_dir(cls, run_dir: str, **from_run_dir_kwargs
                          ) -> "EnsembleService":
        """Build from a tools/train_ensemble.py output dir (reads
        ensemble.json; kwargs forward to DiagnosisService.from_run_dir
        for every member)."""
        manifest_path = os.path.join(run_dir, "ensemble.json")
        if not os.path.exists(manifest_path):
            raise FileNotFoundError(
                f"no {manifest_path} — not an ensemble run dir "
                "(train one with tools/train_ensemble.py)")
        with open(manifest_path) as f:
            manifest = json.load(f)
        warm = from_run_dir_kwargs.pop("warm", False)
        services = [DiagnosisService.from_run_dir(
            os.path.join(run_dir, m["dir"]), **from_run_dir_kwargs)
            for m in manifest["members"]]
        svc = cls(services)
        if warm:
            svc.warmup()
        return svc

    @property
    def n_members(self) -> int:
        return len(self.services)

    @property
    def buckets(self):
        return self.services[0].buckets

    def warmup(self):
        for s in self.services:
            s.warmup()

    def diagnose(self, vertices, model: str = "qda", n_samples: int = 0,
                 seed: int = 0, include_members: bool = True):
        """Raw scans → per-scan consensus reports (summarize_ensemble
        fields) + per-member diagnosis blocks (latents dropped; with
        ``n_samples > 0`` each block carries that member's
        posterior-sampling ``uncertainty``). Single [N, 3] input →
        single dict, like DiagnosisService.diagnose."""
        from .analysis.uncertainty import summarize_ensemble

        x, single = self.services[0]._as_batch(vertices)
        member_reports = [svc.diagnose(x, model=model,
                                       n_samples=n_samples, seed=seed)
                          for svc in self.services]
        consensus = summarize_ensemble(member_reports)
        if include_members:
            for i, row in enumerate(consensus):
                row["members"] = [
                    {k: v for k, v in member_reports[m][i].items()
                     if k != "latent"}
                    for m in range(self.n_members)]
        return consensus[0] if single else consensus

    def stats(self) -> dict:
        per = [s.stats() for s in self.services]
        out = dict(per[0])
        out["requests"] = sum(p["requests"] for p in per)
        out["meshes"] = sum(p["meshes"] for p in per)
        out["n_members"] = self.n_members
        return out

    def __getattr__(self, name):
        if name in type(self)._MEMBER_ONLY:
            def refuse(*a, **kw):
                raise ValueError(
                    f"{name} is a single-model request — serve a member "
                    "run dir (outputs/<id>/member_XX) for it; the "
                    "ensemble endpoint answers /diagnose (consensus) "
                    "and /healthz only")
            return refuse
        raise AttributeError(name)
