"""Serving layer: DiagnosisService loads a run dir without the training
dataset and answers encode/decode/diagnose/reconstruct through bucketed
static-shape jits; tools/serve.py wraps it in an HTTP server.

The reference has no deployment path (inference = re-running its eval
notebook in the training workspace); this subsystem is new surface, so
the oracle is internal consistency with the training-side manager —
service.encode(raw) must equal models.encode over the same normalized
batch, and diagnosis must equal the manager's classify_latent.
"""

import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def served_run(tmp_path_factory):
    """A tiny trained run dir: config snapshot + checkpoint + classifier
    zoo + precomputed norm/split caches — everything from_run_dir needs,
    nothing else (the mesh dir stays around only to build it)."""
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.geometry import write_obj, write_ply
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template
    from craniofacialsd_vae_tpu.manager import ModelManager

    root = tmp_path_factory.mktemp("serve_ws")
    tpl = synthetic_template(subdivisions=2, n_regions=3)
    tpl_path = str(root / "template.ply")
    write_ply(tpl_path, tpl.pos, tpl.face, tpl.colors)

    mesh_dir = root / "meshes"
    mesh_dir.mkdir()
    rng = np.random.default_rng(7)
    for c in ["a", "c", "n"]:
        for i in range(8):
            verts = tpl.pos + rng.normal(scale=0.03, size=tpl.pos.shape) \
                + (0.05 if c == "a" else -0.05 if c == "c" else 0.0)
            write_obj(str(mesh_dir / f"{c}_{i}.obj"), verts, tpl.face)

    config = {
        "data": {
            "template_path": tpl_path,
            "dataset_path": str(mesh_dir),
            "precomputed_path": str(root / "precomp"),
            "normalize_data": True,
            "to_mm_constant": 10.0,
            "swap_features": True,
            "stratified_split": True,
            "augmentation_factor": 0,
        },
        "optimization": {
            "epochs": 1, "batch_size": 2, "lr": 1e-3, "weight_decay": 0,
            "laplacian_weight": 0.1, "kl_weight": 1e-4,
            "latent_consistency_weight": 0.5,
            "latent_consistency_eta1": 0.5, "latent_consistency_eta2": 0.5,
        },
        "model": {
            "sampling": {"type": "basic", "sampling_factors": [2, 2]},
            "spirals": {"length": [5, 5], "dilation": [1, 1]},
            "in_channels": 3, "out_channels": [8, 16],
            "latent_size": 6, "pre_z_sigmoid": False,
        },
        "classifier": {
            "main_model_type": "qda", "mlp_training_type": "after",
            "mlp_hidden_features": [8], "mlp_lr": 1e-3, "mlp_epochs": 2,
        },
        "logging_frequency": {"tb_renderings": 100, "save_weights": 1},
    }

    manager = ModelManager(
        config, precomputed_storage_path=config["data"]["precomputed_path"])
    train, val, test, norm, weights = build_datasets(config,
                                                     manager.template)
    manager.set_class_conversions_and_weights(weights)
    it = BatchIterator(train, 2, shuffle=True)
    val_it = BatchIterator(val, 2, shuffle=False, drop_last=False)
    manager.run_epoch(it, train=True)

    run_dir = root / "outputs" / "served"
    ckpt_dir = run_dir / "checkpoints"
    os.makedirs(ckpt_dir)
    manager.save_weights(str(ckpt_dir), epoch=0)
    manager.train_and_validate_classifiers(
        BatchIterator(train, 2, shuffle=False), val_it,
        checkpoint_dir=str(ckpt_dir))
    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    # raw scan-space vertices to serve (denormalized val meshes)
    raw = np.asarray(train.x[:5]) * norm["std"] + norm["mean"]
    return {"run_dir": str(run_dir), "manager": manager, "norm": norm,
            "raw": raw.astype(np.float32), "config": config}


@pytest.fixture(scope="module")
def service(served_run):
    from craniofacialsd_vae_tpu.serving import DiagnosisService
    return DiagnosisService.from_run_dir(served_run["run_dir"],
                                         max_batch=4)


def test_encode_matches_manager(served_run, service):
    """service.encode(raw) == models.encode over the manager-normalized
    batch — the serving path adds normalization + bucketing, nothing
    numeric."""
    mgr, norm = served_run["manager"], served_run["norm"]
    raw = served_run["raw"]
    mu = service.encode(raw)
    xn = (raw - norm["mean"]) / norm["std"]
    mu_ref = np.asarray(mgr.encode(xn))
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-4, atol=1e-5)


def test_bucketing_pads_and_trims(served_run, service):
    """Every batch size dispatches at a bucket shape and returns exactly
    B rows; >max_batch streams in chunks; results are independent of the
    batch split."""
    raw = served_run["raw"]
    assert service.buckets == [1, 2, 4]
    full = service.encode(raw)               # B=5 > max_batch=4 → 4 + 1
    assert full.shape[0] == 5
    for b in (1, 2, 3):
        part = service.encode(raw[:b])
        assert part.shape[0] == b
        np.testing.assert_allclose(part, full[:b], rtol=1e-5, atol=1e-6)
    # single-mesh convenience: [N, 3] in → [Z] out
    one = service.encode(raw[0])
    assert one.ndim == 1
    np.testing.assert_allclose(one, full[0], rtol=1e-5, atol=1e-6)


def test_decode_roundtrip(served_run, service):
    raw = served_run["raw"]
    mu = service.encode(raw[:2])
    out = service.decode(mu)
    assert out.shape == raw[:2].shape
    # decode(encode(x)) lands in raw scan space: same scale as the input
    assert np.abs(out).max() < 10 * np.abs(raw).max() + 1


def test_diagnose_reports(served_run, service):
    mgr = served_run["manager"]
    raw = served_run["raw"]
    reports = service.diagnose(raw[:3])
    assert len(reports) == 3
    classes = set(mgr._class2idx_dict)
    mu = service.encode(raw[:3])
    ref_labels = mgr.classify_latent(mu, "qda")
    for i, rep in enumerate(reports):
        assert rep["label"] in classes
        assert rep["label"] == ref_labels[i]
        post = rep["posteriors"]
        assert set(post) == classes
        assert abs(sum(post.values()) - 1.0) < 1e-6
        assert rep["mahalanobis_to_healthy"] >= 0
        assert len(rep["latent"]) == mu.shape[1]
    single = service.diagnose(raw[0])
    assert single["label"] in classes


def test_saliency_reports(served_run, service):
    """service.saliency extends the diagnosis report with gradient
    attribution; parity with the direct saliency program, invariance to
    bucketing, and the single-input convenience shape."""
    import jax

    from craniofacialsd_vae_tpu.analysis.saliency import (make_saliency_fn,
                                                          region_attribution)

    mgr = served_run["manager"]
    raw = served_run["raw"][:3]
    reports = service.saliency(raw)
    assert len(reports) == 3

    fn = jax.jit(make_saliency_fn(mgr, service.normalization,
                                  mgr.classifiers.qda, mgr.class2idx("n")))
    sal, margin, pred, ref, _, mu = [
        np.asarray(r) for r in fn(mgr.state.params, raw)]
    qda_classes = np.asarray(mgr.classifiers.qda.classes)
    diag = service.diagnose(raw)
    for i, rep in enumerate(reports):
        assert rep["label"] == diag[i]["label"]
        assert rep["saliency_label"] == \
            mgr.idx2class(int(qda_classes[pred[i]]))
        assert rep["saliency_reference_class"] == \
            mgr.idx2class(int(qda_classes[ref[i]]))
        assert rep["margin_nats"] == pytest.approx(float(margin[i]),
                                                   rel=1e-4, abs=1e-5)
        # the service pads B=3 to the 4-bucket — a different XLA program
        # than the unpadded reference run, so values match to float
        # tolerance rather than bit-exactly
        np.testing.assert_allclose(rep["vertex_saliency_nats_per_mm"],
                                   sal[i], rtol=1e-3, atol=1e-6)
        ref_regions = region_attribution(sal[i], mgr.template)
        assert [r["region"] for r in rep["regions"]] == \
            [r["region"] for r in ref_regions]
        np.testing.assert_allclose(
            [r["share"] for r in rep["regions"]],
            [r["share"] for r in ref_regions], rtol=1e-4)
    # bucket invariance: a single-mesh request returns the same map
    one = service.saliency(raw[0])
    assert isinstance(one, dict)
    np.testing.assert_allclose(one["vertex_saliency_nats_per_mm"],
                               sal[0], rtol=1e-4, atol=1e-7)
    # opt-out of the per-vertex payload keeps the region table
    lean = service.saliency(raw[:1], include_vertex_saliency=False)[0]
    assert "vertex_saliency_nats_per_mm" not in lean
    assert [r["region"] for r in lean["regions"]] == \
        [r["region"] for r in reports[0]["regions"]]
    np.testing.assert_allclose(
        [r["share"] for r in lean["regions"]],
        [r["share"] for r in reports[0]["regions"]], rtol=1e-4)


def test_uncertainty_program_oracle(served_run, service):
    """The posterior-sampling program's sample log-posteriors must equal
    the numpy QDA head on the very z samples it drew, mu must match the
    plain encode, samples must follow q(z|x) = N(mu, exp(logvar)), and a
    row's draw must not depend on the batch size (the eps fold is by row
    index — the bucket-padding invariant)."""
    import jax

    from craniofacialsd_vae_tpu.analysis.uncertainty import \
        make_uncertainty_fn

    mgr, norm = served_run["manager"], served_run["norm"]
    raw = served_run["raw"]
    qda = mgr.classifiers.qda
    k = 16
    fn = jax.jit(make_uncertainty_fn(mgr, norm, qda, k))
    key = jax.random.PRNGKey(0)
    mu, lp_mu, sample_lp, sample_pred, z = [
        np.asarray(r) for r in fn(mgr.state.params, raw[:2], key)]
    b, zdim = mu.shape
    assert sample_lp.shape == (b, k, len(qda.classes))
    assert z.shape == (b, k, zdim)

    xn = (raw[:2] - norm["mean"]) / norm["std"]
    np.testing.assert_allclose(mu, np.asarray(mgr.encode(xn)),
                               rtol=1e-4, atol=1e-5)
    # numpy-head parity on the program's own samples
    lp_ref = qda.log_posteriors(z.reshape(-1, zdim)).reshape(b, k, -1)
    np.testing.assert_allclose(sample_lp, lp_ref, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(lp_mu, qda.log_posteriors(mu),
                               rtol=2e-3, atol=1e-3)
    assert (sample_pred == np.argmax(sample_lp, axis=-1)).all()
    # the standardized residuals are the N(0, 1) eps draws: sigma from
    # the model's own logvar head
    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.models import encode as model_encode
    _, logvar = model_encode(mgr.state.params, mgr.geometry,
                             mgr.net_config,
                             jnp.swapaxes(jnp.asarray(xn), 0, 1))
    sigma = np.exp(0.5 * np.asarray(logvar))
    eps_hat = (z - mu[:, None, :]) / sigma[:, None, :]
    # b·k·zdim = 192 draws: loose moment bounds catch scale/shift bugs
    assert abs(eps_hat.mean()) < 0.3
    assert 0.7 < eps_hat.std() < 1.3
    # row draws independent of batch size: same rows inside a bigger batch
    mu4, _, sample_lp4, _, z4 = [
        np.asarray(r) for r in fn(mgr.state.params, raw[:4], key)]
    np.testing.assert_allclose(z4[:2], z, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sample_lp4[:2], sample_lp,
                               rtol=1e-3, atol=1e-3)


def test_uncertainty_requires_vae_and_valid_k(served_run):
    import types

    from craniofacialsd_vae_tpu.analysis.uncertainty import \
        make_uncertainty_fn

    mgr = served_run["manager"]
    fake = types.SimpleNamespace(
        net_config=types.SimpleNamespace(is_vae=False))
    with pytest.raises(ValueError, match="posterior"):
        make_uncertainty_fn(fake, served_run["norm"],
                            mgr.classifiers.qda, 8)
    with pytest.raises(ValueError, match="n_samples"):
        make_uncertainty_fn(mgr, served_run["norm"],
                            mgr.classifiers.qda, 0)


def test_summarize_uncertainty_math():
    """Pure-numpy invariants of the host-side summary: a one-hot sample
    set gives agreement 1 and ~zero entropy; votes always sum to K;
    posterior means are valid distributions."""
    from craniofacialsd_vae_tpu.analysis.uncertainty import \
        summarize_uncertainty

    qda_classes = np.array([0, 2, 3])
    idx2class = {0: "a", 2: "c", 3: "n"}
    # scan 0: all samples agree with the point argmax (class pos 1);
    # scan 1: samples split 2/2 between pos 0 and pos 2, point pos 0
    lp_mu = np.array([[0.0, 5.0, -1.0], [3.0, 0.0, 2.9]])
    big = 50.0
    sample_lp = np.stack([
        np.tile([0.0, big, 0.0], (4, 1)),
        np.array([[big, 0, 0], [0, 0, big], [big, 0, 0], [0, 0, big]]),
    ])
    pred = np.argmax(sample_lp, axis=-1).astype(np.int32)
    reps = summarize_uncertainty(lp_mu, sample_lp, pred, qda_classes,
                                 idx2class)
    assert reps[0]["label"] == "c" and reps[1]["label"] == "a"
    assert reps[0]["label_agreement"] == 1.0
    assert reps[0]["sample_votes"] == {"a": 0, "c": 4, "n": 0}
    assert reps[0]["predictive_entropy_nats"] == pytest.approx(0.0,
                                                               abs=1e-6)
    assert reps[1]["label_agreement"] == 0.5
    assert reps[1]["sample_votes"] == {"a": 2, "c": 0, "n": 2}
    # max-entropy direction: the 2/2 split's entropy is ~ln 2
    assert reps[1]["predictive_entropy_nats"] == pytest.approx(
        np.log(2), rel=1e-3)
    for rep in reps:
        assert sum(rep["sample_votes"].values()) == rep["n_samples"] == 4
        assert sum(rep["posterior_mean"].values()) == pytest.approx(1.0)
        assert all(v >= 0 for v in rep["posterior_std"].values())


def test_diagnose_with_uncertainty(served_run, service):
    """diagnose(n_samples=K) extends each report with the uncertainty
    block in ONE dispatch; deterministic per seed, invariant to bucket
    padding, and the point label agrees with the plain diagnosis."""
    raw = served_run["raw"]
    k = 8
    reports = service.diagnose(raw[:3], n_samples=k, seed=1)
    plain = service.diagnose(raw[:3])
    assert len(reports) == 3
    for rep, ref in zip(reports, plain):
        assert rep["label"] == ref["label"]
        np.testing.assert_allclose(
            sorted(rep["posteriors"].values()),
            sorted(ref["posteriors"].values()), rtol=1e-5)
        unc = rep["uncertainty"]
        assert unc["label"] == rep["label"]  # qda head both ways
        assert 0.0 <= unc["label_agreement"] <= 1.0
        assert sum(unc["sample_votes"].values()) == k
        assert unc["n_samples"] == k
        assert sum(unc["posterior_mean"].values()) == pytest.approx(1.0)
        assert unc["predictive_entropy_nats"] >= -1e-9
    # same seed → identical; padding to the same rows inside a bigger
    # request → identical (row-indexed eps fold)
    again = service.diagnose(raw[:3], n_samples=k, seed=1)
    assert [r["uncertainty"] for r in again] == \
        [r["uncertainty"] for r in reports]
    wider = service.diagnose(raw[:4], n_samples=k, seed=1)
    assert [r["uncertainty"] for r in wider[:3]] == \
        [r["uncertainty"] for r in reports]
    # a different seed draws different samples
    other = service.diagnose(raw[:3], n_samples=k, seed=2)
    assert any(o["uncertainty"]["posterior_mean"] !=
               r["uncertainty"]["posterior_mean"]
               for o, r in zip(other, reports))
    # single-mesh convenience shape. NB only approximate vs the batch-3
    # report: batch 1 pads to a DIFFERENT bucket, i.e. a different XLA
    # program shape, and reassociated reductions (gemv vs gemm) may
    # differ in the last bits — bit-equality is only contracted within
    # one program shape (the bucket), as the batch-3 vs batch-4 padding
    # assertions above pin.
    one = service.diagnose(raw[0], n_samples=k, seed=1)
    assert isinstance(one, dict)
    u1, u3 = one["uncertainty"], reports[0]["uncertainty"]
    assert u1["label"] == u3["label"]
    assert u1["sample_votes"] == u3["sample_votes"]
    for fieldname in ("posterior_mean", "posterior_std"):
        for cls, v in u3[fieldname].items():
            assert u1[fieldname][cls] == pytest.approx(v, abs=1e-5)
    assert u1["predictive_entropy_nats"] == pytest.approx(
        u3["predictive_entropy_nats"], abs=1e-5)
    # a non-power-of-two K runs the next-pow2 program and summarizes the
    # first K samples — votes still sum to the REQUESTED count
    odd = service.diagnose(raw[:1], n_samples=5, seed=1)[0]
    assert sum(odd["uncertainty"]["sample_votes"].values()) == 5
    assert odd["uncertainty"]["n_samples"] == 5
    # request-controlled static shapes are bounded: a huge K must be a
    # clear client error, not a device OOM / unbounded program cache
    from craniofacialsd_vae_tpu.serving import DiagnosisService
    with pytest.raises(ValueError, match="n_samples"):
        service.diagnose(raw[:1],
                         n_samples=DiagnosisService
                         .MAX_UNCERTAINTY_SAMPLES + 1)
    with pytest.raises(ValueError, match="n_samples"):
        service.diagnose(raw[:1], n_samples=-4)
    assert all((key & (key - 1)) == 0
               for key in service._jit_uncertainty), \
        "uncertainty programs must exist only at power-of-two K"


def test_unnormalized_run_normalization_contract(served_run):
    """Runs trained with normalize_data: False must serve IDENTITY
    normalization (the net consumed raw coordinates; the precomputed dir
    still caches real stats that must NOT be applied), and every
    program builder must accept None as identity."""
    import copy

    import jax

    from craniofacialsd_vae_tpu.serving import (build_raw_programs,
                                                run_normalization)

    mgr, norm = served_run["manager"], served_run["norm"]
    cfg = copy.deepcopy(served_run["config"])
    assert run_normalization(cfg) is not None        # default: real stats
    np.testing.assert_allclose(run_normalization(cfg)["mean"],
                               norm["mean"])
    cfg["data"]["normalize_data"] = False
    assert run_normalization(cfg) is None
    # None → identity: encode must see the input untouched
    programs = build_raw_programs(mgr, None)
    x = served_run["raw"][:2]                        # any model-space array
    mu = np.asarray(jax.jit(programs["encode"])(mgr.state.params, x))
    np.testing.assert_allclose(mu, np.asarray(mgr.encode(x)),
                               rtol=1e-4, atol=1e-5)


def test_reconstruct_errors_in_mm(served_run, service):
    raw = served_run["raw"]
    out = service.reconstruct(raw[:2])
    assert out["vertices"].shape == raw[:2].shape
    assert out["vertex_errors_mm"].shape == raw[:2].shape[:2]
    to_mm = served_run["config"]["data"]["to_mm_constant"]
    manual = np.sqrt(((out["vertices"] - raw[:2]) ** 2).sum(-1)) * to_mm
    np.testing.assert_allclose(out["vertex_errors_mm"], manual,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["mean_error_mm"], manual.mean(1),
                               rtol=1e-5)
    stats = service.stats()
    assert stats["requests"] >= 1 and stats["p50_ms"] is not None


def test_input_validation(served_run, service):
    """Wrong vertex counts and empty batches must be clear client errors,
    not broadcasts against the normalization stats (a [1, 3] input would
    otherwise silently broadcast to [N, 3] and return confident garbage)."""
    raw = served_run["raw"]
    with pytest.raises(ValueError, match="template vertex count"):
        service.encode(np.zeros((1, 3), np.float32))
    with pytest.raises(ValueError, match="template vertex count"):
        service.diagnose(np.zeros((2, 10, 3), np.float32))
    with pytest.raises(ValueError, match="empty batch"):
        service.encode(raw[:0])
    with pytest.raises(ValueError, match="latent must be"):
        service.decode(np.zeros((1, 3), np.float32))
    with pytest.raises(ValueError, match="empty batch"):
        service.decode(np.zeros((0, 6), np.float32))


def test_posteriors_label_by_fitted_classes(served_run, service):
    """QDA posterior columns must be labeled through qda.classes, not by
    position: with a class map containing a class absent from training
    (e.g. 'b' merged into 'n'), positional labeling shifts every column."""
    mgr = served_run["manager"]
    rep = service.diagnose(served_run["raw"][0])
    fitted = {mgr.idx2class(int(c)) for c in mgr.classifiers.qda.classes}
    assert set(rep["posteriors"]) == fitted


def test_fit_unregistered_scan(served_run, service):
    """service.fit: an unregistered scan (subset of vertices, scaled off
    the template frame) + landmarks → fitted latent, mesh in scan space,
    mm metrics, and a diagnosis report."""
    mgr = served_run["manager"]
    n = mgr.template.num_vertices
    service.landmark_idx = list(range(0, n, max(n // 6, 1)))[:6]
    scan = served_run["raw"][0] * 1.1            # off-frame "scan"
    landmarks = scan[service.landmark_idx]
    out = service.fit(scan, landmarks, iterations=3, n_restarts=2)
    assert out["z"].shape == (mgr.model_latent_size,)
    assert out["vertices"].shape == (n, 3)
    assert out["aligned_scan"].shape == scan.shape
    assert out["chamfer_mm2"] >= 0 and out["landmark_mse_mm2"] >= 0
    rep = out["diagnosis"]
    assert rep["label"] in set(mgr._class2idx_dict)
    assert abs(sum(rep["posteriors"].values()) - 1.0) < 1e-6
    with pytest.raises(ValueError, match="landmarks must be"):
        service.fit(scan, landmarks[:2], iterations=1, n_restarts=1)
    with pytest.raises(ValueError, match="scan must be"):
        service.fit(scan[None], landmarks, iterations=1, n_restarts=1)


def test_fit_mm2_units(served_run, monkeypatch):
    """chamfer_mm2 / landmark_mse_mm2 are SQUARED distances, so they scale
    with the SQUARE of the linear to_mm constant (regression: they were
    multiplied by the linear constant, under-reporting by ~to_mm×)."""
    from craniofacialsd_vae_tpu.analysis.fitting import fit_latent

    mgr, norm = served_run["manager"], served_run["norm"]
    n = mgr.template.num_vertices
    lnd_idx = list(range(0, n, max(n // 6, 1)))[:6]
    scan = served_run["raw"][0]
    landmarks = scan[lnd_idx]

    vals = {}
    for c in (1.0, 10.0):
        monkeypatch.setattr(mgr, "to_mm_const", c)
        vals[c] = fit_latent(mgr, norm, scan, landmarks, lnd_idx,
                             iterations=2, n_restarts=2, seed=0)
    assert vals[10.0]["chamfer_mm2"] == pytest.approx(
        100.0 * vals[1.0]["chamfer_mm2"], rel=1e-6)
    assert vals[10.0]["landmark_mse_mm2"] == pytest.approx(
        100.0 * vals[1.0]["landmark_mse_mm2"], rel=1e-6)


def test_fit_program_reuse_across_scans(served_run, service):
    """Two scans with DIFFERENT vertex counts in the same chamfer bucket
    must share one compiled optimization program: all request data flows
    through arguments, so the jit cache sees identical shapes (closure
    constants would force a recompile per scan)."""
    from craniofacialsd_vae_tpu.analysis.fitting import _get_fit_run

    mgr = service.manager
    n = mgr.template.num_vertices
    service.landmark_idx = list(range(0, n, max(n // 6, 1)))[:6]
    tpl = np.asarray(mgr.template.pos, np.float32)
    lnd = tpl[service.landmark_idx]
    run = _get_fit_run(mgr, 5e-3, 2)
    base = run._cache_size()
    r1 = service.fit(tpl[: n - 2] + 0.01, lnd, iterations=2, n_restarts=2)
    r2 = service.fit(tpl[: n - 6] - 0.02, lnd, iterations=2, n_restarts=2)
    assert run._cache_size() == base + 1   # one trace serves both scans
    assert r1["z"].shape == r2["z"].shape


def test_warmup_fit(served_run, service):
    """warmup_fit compiles+runs the fit program against a fake
    template-derived scan WITHOUT polluting the request stats (a
    multi-minute warmup latency sample would dominate p50/p95); with no
    valid landmarks it skips instead of crashing server startup."""
    n = service.manager.template.num_vertices
    saved = service.landmark_idx
    try:
        service.landmark_idx = []
        service.warmup_fit(scan_points=50, iterations=1, n_restarts=1)

        service.landmark_idx = list(range(0, n, max(n // 6, 1)))[:6]
        before = service.stats()
        service.warmup_fit(scan_points=200, iterations=2, n_restarts=2)
        after = service.stats()
        assert after["requests"] == before["requests"]
        assert after["meshes"] == before["meshes"]
        assert after["p50_ms"] == before["p50_ms"]
    finally:
        service.landmark_idx = saved


def test_plan_matches_tester(served_run, service, tmp_path):
    """service.plan == Tester.interpolate_syndrome_to_normal on the same
    patient: identical crossing latents and procedure-distance table when
    fed the exact same latent (shared analysis.planning core), and the
    decoded target meshes equal service.decode of the crossing latents."""
    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.geometry import write_obj

    mgr, norm = served_run["manager"], served_run["norm"]
    raw = served_run["raw"]
    patient = tmp_path / "patient.obj"
    write_obj(str(patient), raw[0], np.asarray(mgr.template.face))
    tester = Tester(mgr, norm, None, None, str(tmp_path / "eval"),
                    served_run["config"], lazy_stats=True)
    ref = tester.interpolate_syndrome_to_normal(str(patient),
                                                render=False)

    out = service.plan(latent=ref["z_patient"], include_paths=True)
    for key in ("z_3std", "z_2std", "z_1std", "z_mean_target",
                "all_attributes"):
        np.testing.assert_allclose(out[key], ref[key], rtol=1e-6,
                                    atol=1e-7, err_msg=key)
    assert out["procedure_distances"] == ref["procedure_distances"]
    assert set(out["procedures"]) == set(ref["procedures"])
    # decoded targets come from the same bucketed decode path (batch-4
    # bucket vs batch-1 bucket → different XLA fusions, ~1e-6 noise)
    np.testing.assert_allclose(
        out["target_meshes"]["mean_target"],
        service.decode(out["z_mean_target"]), rtol=1e-4, atol=1e-5)
    assert set(out["target_meshes"]) == {"3std", "2std", "1std",
                                         "mean_target"}

    # vertices-input path: encode noise keeps crossings within one
    # linspace step of the tester's (which encoded the same mesh)
    out_v = service.plan(vertices=raw[0], decode_key_meshes=False)
    step = np.abs(ref["z_mean_target"] - ref["z_patient"]).max() / 5000
    for key in ("z_3std", "z_2std", "z_1std"):
        np.testing.assert_allclose(out_v[key], ref[key],
                                    atol=max(5 * step, 1e-3), rtol=1e-2,
                                    err_msg=key)
    assert out_v["diagnosis"]["label"] in set(mgr._class2idx_dict)

    # crossings are ordered along the walk: 3-std is hit first, so the
    # 1-std point sits closest to the healthy mean
    def d(k):
        return float(np.linalg.norm(out[k] - out["z_mean_target"]))
    assert d("z_1std") <= d("z_2std") + 1e-6
    assert d("z_2std") <= d("z_3std") + 1e-6

    with pytest.raises(ValueError, match="exactly one"):
        service.plan()
    with pytest.raises(ValueError, match="exactly one"):
        service.plan(vertices=raw[0], latent=ref["z_patient"])
    with pytest.raises(ValueError, match="ONE patient"):
        service.plan(vertices=raw[:2])
    # degenerate walk params are a clear client error, not a silently
    # wrong distance table (d3 would equal dm at n_p_to_3std=0)
    with pytest.raises(ValueError, match="n_p_to_3std"):
        service.plan(latent=ref["z_patient"], n_p_to_3std=0)
    with pytest.raises(ValueError, match="n_linspace"):
        service.plan(latent=ref["z_patient"], n_linspace=1)


@pytest.mark.slow
def test_data_parallel_service_parity(served_run, service):
    """data_parallel=True shards each bucket's batch axis over the
    8-device virtual mesh (conftest); every answer must match the
    single-device service — the sharding is a throughput layout, not a
    numeric change."""
    import jax

    from craniofacialsd_vae_tpu.serving import DiagnosisService

    n_dev = jax.device_count()
    assert n_dev == 8
    dp = DiagnosisService.from_run_dir(served_run["run_dir"],
                                       max_batch=16, data_parallel=True)
    assert dp.stats()["n_devices"] == n_dev
    assert dp.buckets == [8, 16]
    assert all(b % n_dev == 0 for b in dp.buckets)

    # the compiled program really spans the mesh: the on-device output
    # of a full 16-bucket lives on all 8 devices
    x16 = np.repeat(served_run["raw"][:2], 8, axis=0)
    mu_dev = dp._jit_encode_raw(dp._serve_params, x16)
    assert len(mu_dev.sharding.device_set) == n_dev
    # the pinned params were replicated across the mesh ONCE at init
    leaf = jax.tree_util.tree_leaves(dp._serve_params)[0]
    assert len(leaf.sharding.device_set) == n_dev

    raw = served_run["raw"]
    mu_dp, mu_1 = dp.encode(raw), service.encode(raw)
    np.testing.assert_allclose(mu_dp, mu_1, rtol=1e-5, atol=1e-6)
    rec_dp, rec_1 = dp.reconstruct(raw), service.reconstruct(raw)
    np.testing.assert_allclose(rec_dp["vertices"], rec_1["vertices"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(rec_dp["mean_error_mm"],
                               rec_1["mean_error_mm"], rtol=1e-4)
    np.testing.assert_allclose(dp.decode(mu_dp), service.decode(mu_1),
                               rtol=1e-5, atol=1e-5)
    # single-mesh request pads to the 8-bucket and trims back
    rep = dp.diagnose(raw[0])
    assert rep["label"] == service.diagnose(raw[0])["label"]

    # fit: restarts shard across the mesh; same seeds → same candidate
    # trajectories → the same best restart as the single-device path
    tpl = np.asarray(dp.manager.template.pos, np.float32)
    n = len(tpl)
    dp.landmark_idx = service.landmark_idx = \
        list(range(0, n, max(n // 6, 1)))[:6]
    scan = tpl[::2] + 0.01
    lnd = tpl[dp.landmark_idx]
    f_dp = dp.fit(scan, lnd, iterations=3, n_restarts=8)
    f_1 = service.fit(scan, lnd, iterations=3, n_restarts=8)
    np.testing.assert_allclose(f_dp["z"], f_1["z"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(f_dp["chamfer_mm2"], f_1["chamfer_mm2"],
                               rtol=1e-4)
    # non-mesh-multiple restart counts round up instead of failing
    f_round = dp.fit(scan, lnd, iterations=2, n_restarts=5)
    assert f_round["z"].shape == f_1["z"].shape

    # max_batch must tile the mesh
    with pytest.raises(ValueError, match="multiple"):
        DiagnosisService.from_run_dir(served_run["run_dir"],
                                      max_batch=4, data_parallel=True)


def test_batch_diagnose_cli(served_run, service, tmp_path):
    """tools/batch_diagnose.py: a directory of scans → diagnoses.csv with
    labels that match the service's own diagnose path, plus a skipped row
    (wrong vertex count → fit-intake note) and saved reconstructions."""
    import csv

    from craniofacialsd_vae_tpu.geometry import read_mesh, write_obj
    from tools.batch_diagnose import main as batch_main

    mgr, raw = served_run["manager"], served_run["raw"]
    faces = np.asarray(mgr.template.face)
    scans = tmp_path / "scans"
    scans.mkdir()
    for i in range(3):
        write_obj(str(scans / f"patient_{i}.obj"), raw[i], faces)
    # unregistered scan: wrong vertex count → reported, not fatal
    write_obj(str(scans / "unregistered.obj"), raw[0][:50],
              np.array([[0, 1, 2]]))
    out = tmp_path / "intake"

    summary = batch_main(["--run_dir", served_run["run_dir"],
                          "--scans", str(scans), "--out", str(out),
                          "--save_recons"])
    assert summary["n_diagnosed"] == 3 and summary["n_skipped"] == 1
    assert sum(summary["labels"].values()) == 3
    assert summary["mean_recon_error_mm"] > 0

    with open(out / "diagnoses.csv") as f:
        rows = {r["file"]: r for r in csv.DictReader(f)}
    assert len(rows) == 4
    assert "unregistered scan" in rows["unregistered.obj"]["error"]
    assert rows["unregistered.obj"]["label"] == ""
    classes = set(mgr._class2idx_dict)
    for i in range(3):
        row = rows[f"patient_{i}.obj"]
        # parity with the service's own single-mesh diagnosis
        assert row["label"] == service.diagnose(raw[i])["label"]
        assert row["label"] in classes
        post = [float(row[f"p_{c}"]) for c in classes
                if f"p_{c}" in row and row[f"p_{c}"] != ""]
        np.testing.assert_allclose(sum(post), 1.0, atol=1e-4)
        recon = read_mesh(str(out / f"patient_{i}_recon.obj"))
        assert recon.vertices.shape == raw[i].shape


@pytest.mark.slow
def test_serve_cli_subprocess(served_run):
    """tools/serve.py end-to-end as a real process: arg parsing, run-dir
    loading, bucket warmup, the startup banner (port announcement), a
    live /healthz + /diagnose round-trip, and clean termination."""
    import subprocess
    import sys
    import urllib.request

    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--run_dir",
         served_run["run_dir"], "--platform", "cpu", "--port", "0",
         "--max_batch", "4"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        url = None
        for _ in range(600):                 # bounded startup wait
            line = proc.stdout.readline()
            if "serving" in line and "http://" in line:
                url = line.split()[3]
                break
            assert proc.poll() is None, "server exited during startup"
        assert url, "startup banner with the bound port never appeared"

        h = json.loads(urllib.request.urlopen(url + "/healthz",
                                              timeout=60).read())
        assert h["ok"] and h["buckets"] == [1, 2, 4]
        body = json.dumps(
            {"vertices": served_run["raw"][0].tolist()}).encode()
        req = urllib.request.Request(
            url + "/diagnose", data=body,
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert out["reports"]["label"] in \
            set(served_run["manager"]._class2idx_dict)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_serve_cli_data_parallel_subprocess(served_run):
    """serve.py --data_parallel --warm_fit on an 8-device virtual mesh:
    DP bucket layout in healthz and a live batched diagnose."""
    import subprocess
    import sys
    import urllib.request

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--run_dir",
         served_run["run_dir"], "--platform", "cpu", "--port", "0",
         "--max_batch", "16", "--data_parallel", "--no_warmup",
         "--warm_fit"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        url = None
        for _ in range(600):
            line = proc.stdout.readline()
            if "serving" in line and "http://" in line:
                url = line.split()[3]
                break
            assert proc.poll() is None, "server exited during startup"
        assert url, "startup banner never appeared"
        h = json.loads(urllib.request.urlopen(url + "/healthz",
                                              timeout=60).read())
        assert h["n_devices"] == 8 and h["buckets"] == [8, 16]
        assert h["requests"] == 0          # warm_fit didn't count
        body = json.dumps(
            {"vertices": served_run["raw"][:3].tolist()}).encode()
        req = urllib.request.Request(
            url + "/diagnose", data=body,
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert len(out["reports"]) == 3
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_concurrent_requests_are_correct(served_run, service):
    """8 threads hammering encode/diagnose concurrently must each get the
    same answers as the serial path (device dispatch serializes behind
    the service lock; stats counters stay consistent)."""
    import concurrent.futures

    raw = served_run["raw"]
    serial = service.encode(raw[:2])
    before = service.n_requests

    def one(i):
        if i % 2 == 0:
            return np.asarray(service.encode(raw[:2]))
        return service.diagnose(raw[0])["label"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, range(16)))
    serial_label = service.diagnose(raw[0])["label"]
    for i, r in enumerate(results):
        if i % 2 == 0:
            np.testing.assert_allclose(r, serial, rtol=1e-6)
        else:
            assert r == serial_label
    assert service.n_requests > before


def test_from_run_dir_without_dataset(served_run, tmp_path):
    """The service must come up from run dir + precomputed dir alone —
    the training mesh dir may be gone in deployment."""
    from craniofacialsd_vae_tpu.serving import DiagnosisService

    cfg = dict(served_run["config"])
    cfg["data"] = dict(cfg["data"],
                       dataset_path=str(tmp_path / "gone"))
    run2 = tmp_path / "run2"
    os.makedirs(run2)
    os.symlink(os.path.join(served_run["run_dir"], "checkpoints"),
               run2 / "checkpoints")
    with open(run2 / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    svc = DiagnosisService.from_run_dir(str(run2), max_batch=2)
    mu = svc.encode(served_run["raw"][:2])
    assert mu.shape[0] == 2


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, service):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from http.server import ThreadingHTTPServer

        from serve import make_handler
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_port}"
        srv.shutdown()
        srv.server_close()

    def _post(self, url, payload, ctype="application/json"):
        data = payload if isinstance(payload, bytes) else \
            json.dumps(payload).encode()
        req = urllib.request.Request(url, data=data,
                                     headers={"Content-Type": ctype})
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz") as resp:
            out = json.loads(resp.read())
        assert out["ok"] and out["buckets"] == [1, 2, 4]

    def test_encode_json(self, served_run, service, server):
        raw = served_run["raw"][:2]
        out = self._post(server + "/encode", {"vertices": raw.tolist()})
        np.testing.assert_allclose(np.asarray(out["latent"]),
                                   service.encode(raw), rtol=1e-5,
                                   atol=1e-6)

    def test_encode_npy_body(self, served_run, service, server):
        raw = served_run["raw"][:2]
        buf = io.BytesIO()
        np.save(buf, raw)
        out = self._post(server + "/encode", buf.getvalue(),
                         ctype="application/octet-stream")
        np.testing.assert_allclose(np.asarray(out["latent"]),
                                   service.encode(raw), rtol=1e-5,
                                   atol=1e-6)

    def test_diagnose_and_decode(self, served_run, server):
        raw = served_run["raw"][:1]
        out = self._post(server + "/diagnose", {"vertices": raw.tolist()})
        rep = out["reports"][0]
        assert "label" in rep and "posteriors" in rep
        dec = self._post(server + "/decode", {"latent": [rep["latent"]]})
        assert np.asarray(dec["vertices"]).shape == raw.shape

    def test_diagnose_uncertainty_endpoint(self, served_run, service,
                                           server):
        raw = served_run["raw"][:2]
        out = self._post(server + "/diagnose",
                         {"vertices": raw.tolist(), "n_samples": 4,
                          "seed": 3})
        reps = out["reports"]
        assert len(reps) == 2
        direct = service.diagnose(raw, n_samples=4, seed=3)
        for rep, ref in zip(reps, direct):
            assert rep["label"] == ref["label"]
            assert rep["uncertainty"] == ref["uncertainty"]

    def test_saliency_endpoint(self, served_run, service, server):
        raw = served_run["raw"][:2]
        out = self._post(server + "/saliency",
                         {"vertices": raw.tolist(),
                          "include_vertex_saliency": False})
        reps = out["reports"]
        assert len(reps) == 2
        direct = service.saliency(raw, include_vertex_saliency=False)
        for rep, ref in zip(reps, direct):
            assert rep["label"] == ref["label"]
            assert rep["saliency_label"] == ref["saliency_label"]
            assert [r["region"] for r in rep["regions"]] == \
                [r["region"] for r in ref["regions"]]
            assert "vertex_saliency_nats_per_mm" not in rep
        one = self._post(server + "/saliency",
                         {"vertices": raw[0].tolist()})
        n = served_run["manager"].template.num_vertices
        assert len(one["reports"]["vertex_saliency_nats_per_mm"]) == n

    def test_fit_endpoint(self, served_run, service, server):
        mgr = served_run["manager"]
        n = mgr.template.num_vertices
        service.landmark_idx = list(range(0, n, max(n // 6, 1)))[:6]
        scan = served_run["raw"][0] * 1.1
        out = self._post(server + "/fit", {
            "vertices": scan.tolist(),
            "landmarks": scan[service.landmark_idx].tolist(),
            "iterations": 2, "n_restarts": 2})
        assert np.asarray(out["vertices"]).shape == (n, 3)
        assert "label" in out["diagnosis"]

    def test_plan_endpoint(self, served_run, service, server):
        raw = served_run["raw"][0]
        out = self._post(server + "/plan", {
            "vertices": raw.tolist(), "n_linspace": 500,
            "include_paths": True})
        assert out["diagnosis"]["label"] in \
            set(served_run["manager"]._class2idx_dict)
        n = served_run["manager"].template.num_vertices
        for k in ("3std", "2std", "1std", "mean_target"):
            assert np.asarray(out["target_meshes"][k]).shape == (n, 3)
        assert len(out["procedure_distances"]) > 0
        assert {"procedure", "d3", "d2", "d1", "dm"} <= \
            set(out["procedure_distances"][0])
        zdim = served_run["manager"].model_latent_size
        assert np.asarray(out["all_attributes"]).shape == (8 + 3, zdim)
        # latent-input variant round-trips through JSON too
        out2 = self._post(server + "/plan", {
            "latent": out["z_patient"], "n_linspace": 500,
            "decode_key_meshes": False})
        np.testing.assert_allclose(np.asarray(out2["z_3std"]),
                                   np.asarray(out["z_3std"]), rtol=1e-6)
        assert "target_meshes" not in out2

    def test_error_surfaces_as_400(self, server):
        req = urllib.request.Request(server + "/encode",
                                     data=b'{"vertices": "nope"}',
                                     headers={"Content-Type":
                                              "application/json"})
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
            assert "error" in json.loads(e.read())
        assert raised

    def test_unknown_path_404(self, server):
        try:
            urllib.request.urlopen(server + "/nope")
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 404
        assert raised


# --------------------------------------------------------------- export
# Ahead-of-time StableHLO artifacts (craniofacialsd_vae_tpu/export.py):
# the serialized programs must answer exactly like the live service —
# same build_raw_programs, so the oracle is bit-level parity — while
# needing nothing from the run dir after export.


@pytest.fixture(scope="module")
def exported(served_run, tmp_path_factory):
    from craniofacialsd_vae_tpu.export import export_run_dir, load_exported
    out = str(tmp_path_factory.mktemp("export") / "artifact")
    manifest = export_run_dir(served_run["run_dir"], out, buckets=(1, 2, 4))
    return {"dir": out, "manifest": manifest, "model": load_exported(out)}


def test_export_matches_service(served_run, service, exported):
    """Serialized encode/decode/reconstruct == the live jitted programs
    (identical fn + identical params ⇒ identical numerics)."""
    raw = served_run["raw"][:2]
    model = exported["model"]
    mu = model.encode(raw)
    np.testing.assert_allclose(mu, service.encode(raw), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(model.decode(mu), service.decode(mu),
                               rtol=1e-5, atol=1e-6)
    rec = model.reconstruct(raw)
    rec_live = service.reconstruct(raw)
    np.testing.assert_allclose(rec["recon"], rec_live["vertices"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rec["error_mm"],
                               rec_live["vertex_errors_mm"],
                               rtol=1e-5, atol=1e-5)


def test_export_bucket_pad_trim_and_chunking(served_run, exported):
    """A batch above the largest bucket streams in chunks; every row must
    equal its single-mesh answer (padding rows never leak)."""
    model = exported["model"]
    raw = served_run["raw"]  # 5 meshes > largest bucket 4 → chunks 4+1
    mu = model.encode(raw)
    assert mu.shape == (5, model.latent_size)
    for i in range(raw.shape[0]):
        np.testing.assert_allclose(mu[i], model.encode(raw[i]),
                                   rtol=1e-5, atol=1e-6)
    # single-input convenience shapes
    rec = model.reconstruct(raw[0])
    assert rec["recon"].shape == raw[0].shape
    assert rec["error_mm"].shape == (model.n_vertices,)
    assert model.decode(mu[0]).shape == raw[0].shape


def test_export_is_self_contained(served_run, exported, tmp_path):
    """The artifact dir must run with the run dir gone: copy it away and
    load from a process-fresh ExportedModel (no manager, no checkpoint,
    no precomputed geometry on the path)."""
    import shutil

    from craniofacialsd_vae_tpu.export import load_exported
    moved = str(tmp_path / "deployed")
    shutil.copytree(exported["dir"], moved)
    model = load_exported(moved)
    raw = served_run["raw"][:1]
    np.testing.assert_allclose(model.encode(raw),
                               exported["model"].encode(raw),
                               rtol=1e-6, atol=1e-7)
    man = exported["manifest"]
    assert man["buckets"] == [1, 2, 4]
    assert set(man["programs"]) == {
        f"{p}_b{b}" for p in ("encode", "decode", "reconstruct")
        for b in (1, 2, 4)}
    assert man["n_vertices"] == model.n_vertices
    assert man["to_mm_constant"] == served_run["config"]["data"][
        "to_mm_constant"]


def test_export_input_validation(exported, tmp_path):
    from craniofacialsd_vae_tpu.export import load_exported
    model = exported["model"]
    with pytest.raises(FileNotFoundError, match="export directory"):
        load_exported(str(tmp_path))
    with pytest.raises(ValueError, match="vertices"):
        model.encode(np.zeros((2, 5, 3), np.float32))
    with pytest.raises(ValueError, match="latent"):
        model.decode(np.zeros((2, 3), np.float32))
    with pytest.raises(ValueError, match="empty"):
        model.encode(np.zeros((0, model.n_vertices, 3), np.float32))


@pytest.mark.slow
def test_export_cli_subprocess(served_run, tmp_path):
    """tools/export_model.py end-to-end: export + --verify in a fresh
    process, then load the artifacts back here."""
    import subprocess
    import sys as _sys

    from craniofacialsd_vae_tpu.export import load_exported
    out = str(tmp_path / "cli_artifact")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "export_model.py"),
         "--run_dir", served_run["run_dir"], "--out", out,
         "--buckets", "1", "2", "--platform", "cpu", "--verify"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "verification passed" in proc.stdout
    model = load_exported(out)
    raw = served_run["raw"][:2]
    assert model.encode(raw).shape == (2, model.latent_size)
