"""Diagnostic saliency (analysis/saliency.py): gradient attribution of
the QDA diagnosis onto the scan surface.

New surface beyond the reference (which offers no explanation of its
classifier outputs), so the oracles are mathematical: the padded jnp
log-posterior form must equal the numpy QDA head exactly, and the
reverse-mode margin gradient must match central finite differences of
the same jitted margin. Serving-side parity lives in test_serving.py.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def saliency_ws(tmp_path_factory):
    """A tiny trained manager + fitted QDA zoo + iterators over a
    synthetic 3-region workspace (same shape as the serving fixture, no
    checkpoint needed)."""
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.geometry import write_obj, write_ply
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template
    from craniofacialsd_vae_tpu.manager import ModelManager

    root = tmp_path_factory.mktemp("saliency_ws")
    tpl = synthetic_template(subdivisions=2, n_regions=3)
    tpl_path = str(root / "template.ply")
    write_ply(tpl_path, tpl.pos, tpl.face, tpl.colors)

    mesh_dir = root / "meshes"
    mesh_dir.mkdir()
    rng = np.random.default_rng(3)
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
    manager.run_epoch(BatchIterator(train, 2, shuffle=True), train=True)
    manager.train_and_validate_classifiers(
        BatchIterator(train, 2, shuffle=False),
        BatchIterator(val, 2, shuffle=False, drop_last=False))

    raw = (np.asarray(test.x) * norm["std"] + norm["mean"]) \
        .astype(np.float32)
    return {"manager": manager, "norm": norm, "raw": raw,
            "config": config, "train": train, "test": test}


def test_qda_constants_match_numpy_log_posteriors():
    """The padded einsum form must reproduce QDAClassifier.log_posteriors
    exactly — including a rank-deficient class (fewer samples than dims),
    where the zero-padded rotation columns must contribute nothing."""
    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.analysis.classifiers import QDAClassifier
    from craniofacialsd_vae_tpu.analysis.saliency import \
        qda_log_posterior_constants

    rng = np.random.default_rng(0)
    d = 6
    # class 2 gets 4 samples < d+1 → auto-shrinkage + possibly reduced rank
    x = np.concatenate([rng.normal(size=(30, d)) + 2.0,
                        rng.normal(size=(25, d)) - 1.0,
                        rng.normal(size=(4, d))]).astype(np.float64)
    y = np.array([0] * 30 + [1] * 25 + [2] * 4)
    qda = QDAClassifier().fit(x, y)

    consts = qda_log_posterior_constants(qda)
    z = rng.normal(size=(11, d)).astype(np.float32)
    diff = z[:, None, :] - consts["means"][None]
    proj = np.einsum("bcd,cdr->bcr", diff, consts["scaled_rot"])
    lp = -0.5 * np.sum(proj ** 2, axis=-1) + consts["log_offsets"]
    lp_ref = qda.log_posteriors(z)
    np.testing.assert_allclose(lp, lp_ref, rtol=2e-4, atol=1e-4)
    # and through jnp (what the jitted program runs)
    lp_j = np.asarray(-0.5 * jnp.sum(
        jnp.einsum("bcd,cdr->bcr",
                   jnp.asarray(z)[:, None, :] - consts["means"][None],
                   consts["scaled_rot"]) ** 2, axis=-1)
        + consts["log_offsets"])
    np.testing.assert_allclose(lp_j, lp_ref, rtol=2e-3, atol=1e-3)


def test_saliency_fn_outputs_and_units(saliency_ws):
    import jax

    from craniofacialsd_vae_tpu.analysis.saliency import make_saliency_fn

    mgr, norm, raw = (saliency_ws["manager"], saliency_ws["norm"],
                      saliency_ws["raw"])
    fn = jax.jit(make_saliency_fn(mgr, norm, mgr.classifiers.qda,
                                  mgr.class2idx("n")))
    sal, margin, pred, ref, lp, mu = [np.asarray(r)
                                      for r in fn(mgr.state.params, raw)]
    b, n = raw.shape[:2]
    assert sal.shape == (b, n) and margin.shape == (b,)
    assert lp.shape == (b, len(mgr.classifiers.qda.classes))
    # mu is the same encode the rest of the stack uses
    xn = (raw - norm["mean"]) / norm["std"]
    np.testing.assert_allclose(mu, np.asarray(mgr.encode(xn)),
                               rtol=1e-4, atol=1e-5)
    # margins are argmax-vs-other log-posterior gaps: non-negative, and
    # the reference class is never the prediction itself
    assert (margin >= -1e-6).all()
    assert (pred != ref).all()
    healthy_pos = mgr.classifiers.qda._class_index(mgr.class2idx("n"))
    assert ((pred == healthy_pos) | (ref == healthy_pos)).all()
    assert (sal >= 0).all() and np.isfinite(sal).all()
    # units: saliency is per-mm — scaling to_mm_constant by k scales the
    # map by 1/k (same raw gradient, different mm)
    mgr.to_mm_const *= 2.0
    try:
        fn2 = jax.jit(make_saliency_fn(mgr, norm, mgr.classifiers.qda,
                                       mgr.class2idx("n")))
        sal2 = np.asarray(fn2(mgr.state.params, raw)[0])
    finally:
        mgr.to_mm_const /= 2.0
    np.testing.assert_allclose(sal2, sal / 2.0, rtol=1e-5, atol=1e-8)


def test_margin_gradient_matches_finite_difference(saliency_ws):
    """Central finite differences of the jitted margin along random
    vertex-displacement directions must match the reverse-mode saliency
    gradient (the scan is far from any argmax decision boundary at these
    epsilons — pred/ref are asserted stable)."""
    import jax

    from craniofacialsd_vae_tpu.analysis.saliency import make_saliency_fn

    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.analysis.saliency import make_margin_fn

    mgr, norm, raw = (saliency_ws["manager"], saliency_ws["norm"],
                      saliency_ws["raw"])
    x = raw[:1]
    margin_fn = jax.jit(make_margin_fn(mgr, norm, mgr.classifiers.qda,
                                       mgr.class2idx("n")))
    fn = jax.jit(make_saliency_fn(mgr, norm, mgr.classifiers.qda,
                                  mgr.class2idx("n")))

    def margin_of(xx):
        m, p, r, _, _ = margin_fn(mgr.state.params, xx)
        return float(m[0]), int(p[0]), int(r[0])

    m0, p0, r0 = margin_of(x)
    grad_fn = jax.jit(jax.grad(
        lambda xx: jnp.sum(margin_fn(mgr.state.params, xx)[0])))
    g = np.asarray(grad_fn(jnp.asarray(x)))[0]        # [N, 3] raw units

    # the packaged saliency program reduces exactly this gradient
    sal = np.asarray(fn(mgr.state.params, x)[0])[0]
    np.testing.assert_allclose(
        sal, np.linalg.norm(g, axis=-1) / mgr.to_mm_const,
        rtol=1e-5, atol=1e-9)

    rng = np.random.default_rng(1)
    eps = 2e-3 * float(np.abs(x).mean())
    for _ in range(4):
        d = rng.normal(size=x[0].shape).astype(np.float32)
        d /= np.linalg.norm(d)
        mp, pp, rp = margin_of(x + eps * d[None])
        mm, pm, rm = margin_of(x - eps * d[None])
        assert (pp, rp) == (p0, r0) and (pm, rm) == (p0, r0), \
            "decision flipped under the FD epsilon — shrink eps"
        fd = (mp - mm) / (2 * eps)
        an = float(np.sum(g * d))
        assert np.isfinite(fd) and np.isfinite(an)
        np.testing.assert_allclose(fd, an, rtol=5e-2,
                                   atol=5e-3 * max(1.0, abs(an)))


def test_healthy_prediction_falls_back_to_runner_up(saliency_ws):
    """Force every prediction to the healthy class (a synthetic QDA whose
    healthy Gaussian is centered on the test meshes' actual latents): the
    margin's reference must become the runner-up, margins stay
    non-negative, and the saliency map stays non-degenerate."""
    import jax

    from craniofacialsd_vae_tpu.analysis.classifiers import QDAClassifier
    from craniofacialsd_vae_tpu.analysis.saliency import make_saliency_fn

    mgr, norm, raw = (saliency_ws["manager"], saliency_ws["norm"],
                      saliency_ws["raw"])
    mu = np.asarray(mgr.encode((raw - norm["mean"]) / norm["std"]))
    center, scale = mu.mean(axis=0), float(mu.std()) + 1e-3
    rng = np.random.default_rng(5)
    d = mu.shape[1]
    xs, ys = [], []
    for label, shift in [("n", 0.0), ("a", 12.0), ("c", -12.0)]:
        xs.append(center + shift * scale
                  + rng.normal(size=(40, d)) * 2.0 * scale)
        ys.extend([mgr.class2idx(label)] * 40)
    qda = QDAClassifier().fit(np.concatenate(xs), np.asarray(ys))
    healthy_pos = qda._class_index(mgr.class2idx("n"))
    assert (qda.predict(mu) == mgr.class2idx("n")).all()

    fn = jax.jit(make_saliency_fn(mgr, norm, qda, mgr.class2idx("n")))
    sal, margin, pred, ref, _, _ = [np.asarray(r)
                                    for r in fn(mgr.state.params, raw)]
    assert (pred == healthy_pos).all()
    assert (ref != healthy_pos).all()
    assert (margin >= -1e-6).all()
    assert (sal.max(axis=1) > 0).all()


def test_region_attribution_shares(saliency_ws):
    from craniofacialsd_vae_tpu.analysis.saliency import region_attribution

    tpl = saliency_ws["manager"].template
    n = tpl.num_vertices
    # uniform saliency → each region's share is its vertex fraction of
    # the segmented set
    rows = region_attribution(np.ones(n), tpl)
    assert [set(r) for r in rows] == [
        {"region", "attribute", "share", "mean_nats_per_mm",
         "n_vertices"}] * len(rows)
    covered = sum(r["n_vertices"] for r in rows)
    assert covered <= n
    np.testing.assert_allclose(sum(r["share"] for r in rows), covered / n,
                               rtol=1e-12)
    shares = [r["share"] for r in rows]
    assert shares == sorted(shares, reverse=True)
    # mass concentrated in one region → that region ranks first with
    # (near-)unit share
    name = tpl.region_names[0]
    sal = np.zeros(n)
    sal[tpl.region_vertex_mask(name)] = 1.0
    rows = region_attribution(sal, tpl)
    assert rows[0]["region"] == name
    np.testing.assert_allclose(rows[0]["share"], 1.0, rtol=1e-12)
    with pytest.raises(ValueError):
        region_attribution(np.ones(n + 1), tpl)


def test_region_attribution_flagship_attribute_names():
    """On the reference template the attribution rows carry the clinical
    anatomical names alongside the color-string region keys (which stay
    the keys — latent slices hang on their first-seen order)."""
    from tests.conftest import TEMPLATE_PLY, has_demo_files
    if not has_demo_files():
        pytest.skip("reference demo_files not mounted")
    from craniofacialsd_vae_tpu.analysis.saliency import region_attribution
    from craniofacialsd_vae_tpu.geometry import load_template
    from craniofacialsd_vae_tpu.geometry.template import COLOUR2ATTRIBUTE

    tpl = load_template(TEMPLATE_PLY)
    rows = region_attribution(np.ones(tpl.num_vertices), tpl)
    assert {r["attribute"] for r in rows} == set(COLOUR2ATTRIBUTE.values())
    for r in rows:
        assert COLOUR2ATTRIBUTE[r["region"]] == r["attribute"]


def test_tester_diagnosis_uncertainty(saliency_ws, tmp_path):
    """Tester.diagnosis_uncertainty: reports for the first test meshes
    with the summary invariants, threshold-driven flagging, and the JSON
    artifact; deterministic per seed."""
    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.data.dataset import BatchIterator

    mgr = saliency_ws["manager"]
    out_dir = str(tmp_path / "out")
    tester = Tester(mgr, saliency_ws["norm"],
                    BatchIterator(saliency_ws["train"], 2, shuffle=False),
                    BatchIterator(saliency_ws["test"], 2, shuffle=False,
                                  drop_last=False),
                    out_dir, saliency_ws["config"], lazy_stats=True)
    k = 12
    reports = tester.diagnosis_uncertainty(n_meshes=3, n_samples=k,
                                           seed=4)
    assert len(reports) == min(3, len(saliency_ws["test"].x))
    classes = set(mgr._class2idx_dict)
    for i, rep in enumerate(reports):
        assert rep["mesh"] == i
        assert rep["label"] in classes
        assert 0.0 <= rep["label_agreement"] <= 1.0
        assert sum(rep["sample_votes"].values()) == k
        assert rep["flagged"] == (rep["label_agreement"] < 0.9)
        assert abs(sum(rep["posterior_mean"].values()) - 1.0) < 1e-9
    with open(os.path.join(out_dir, "uncertainty", "report.json")) as f:
        assert json.load(f) == reports
    # everything-flagged at an impossible threshold; deterministic per seed
    again = tester.diagnosis_uncertainty(n_meshes=3, n_samples=k, seed=4,
                                         agreement_threshold=1.1,
                                         save_artifacts=False)
    assert all(r["flagged"] for r in again)
    for a, b in zip(again, reports):
        assert a["posterior_mean"] == b["posterior_mean"]


def test_tester_unnormalized_run_and_multibatch(saliency_ws, tmp_path):
    """normalize_data: False runs must NOT re-normalize before encode
    (the scan is already model-space — tester passes None, the programs
    skip the (x-mean)/std), and saliency_maps must accumulate batches
    past the first when n_meshes exceeds the iterator batch size."""
    import jax

    from craniofacialsd_vae_tpu.analysis.saliency import make_margin_fn
    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.data.dataset import BatchIterator

    mgr = saliency_ws["manager"]
    test_set = saliency_ws["test"]
    tester = Tester(mgr, saliency_ws["norm"],
                    BatchIterator(saliency_ws["train"], 2, shuffle=False),
                    BatchIterator(test_set, 2, shuffle=False,
                                  drop_last=False),
                    str(tmp_path / "out"), saliency_ws["config"],
                    lazy_stats=True)
    # multi-batch accumulation: ask for every test mesh at batch size 2
    n = len(test_set.x)
    reports = tester.saliency_maps(n_meshes=n, save_artifacts=False)
    assert len(reports) == n, \
        f"saliency_maps returned {len(reports)} of {n} requested meshes"

    # unnormalized run: simulate normalize_data False — the test arrays
    # ARE the model-space inputs; the margin program with normalization
    # None must reproduce the tester's labels/margins
    tester._normalized = False
    try:
        rep_un = tester.saliency_maps(n_meshes=2, save_artifacts=False)
    finally:
        tester._normalized = True
    x = np.asarray(test_set.x[:2], np.float32)
    fn = jax.jit(make_margin_fn(mgr, None, mgr.classifiers.qda,
                                mgr.class2idx("n")))
    margin, pred, _, _, _ = [np.asarray(r)
                             for r in fn(mgr.state.params, x)]
    qda_classes = np.asarray(mgr.classifiers.qda.classes)
    for i, rep in enumerate(rep_un):
        assert rep["label"] == mgr.idx2class(int(qda_classes[pred[i]]))
        assert rep["margin_nats"] == pytest.approx(float(margin[i]),
                                                   rel=1e-4, abs=1e-5)


def test_tester_saliency_maps_artifacts(saliency_ws, tmp_path):
    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.data.dataset import BatchIterator

    mgr = saliency_ws["manager"]
    out_dir = str(tmp_path / "out")
    tester = Tester(mgr, saliency_ws["norm"],
                    BatchIterator(saliency_ws["train"], 2, shuffle=False),
                    BatchIterator(saliency_ws["test"], 2, shuffle=False,
                                  drop_last=False),
                    out_dir, saliency_ws["config"], lazy_stats=True)
    reports = tester.saliency_maps(n_meshes=2)
    assert len(reports) == 2
    classes = set(mgr._class2idx_dict)
    for rep in reports:
        assert rep["label"] in classes
        assert rep["reference_class"] in classes
        assert rep["label"] != rep["reference_class"]
        assert rep["margin_nats"] >= -1e-6
        shares = [r["share"] for r in rep["regions"]]
        assert shares == sorted(shares, reverse=True)
    sal_dir = os.path.join(out_dir, "saliency")
    for i in range(2):
        assert os.path.exists(os.path.join(sal_dir, f"{i}_saliency.ply"))
    assert os.path.exists(os.path.join(sal_dir, "saliency_maps.png"))
    with open(os.path.join(sal_dir, "report.json")) as f:
        assert json.load(f) == reports
