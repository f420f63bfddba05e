"""ModelManager integration: the full orchestration cycle — geometry
precompute, epochs, checkpointing, resume, encode_all, classifier zoo —
on a tiny synthetic template (CPU platform)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from craniofacialsd_vae_tpu.geometry import write_obj, write_ply
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template

    root = tmp_path_factory.mktemp("ws")
    tpl = synthetic_template(subdivisions=2, n_regions=3)
    tpl_path = str(root / "template.ply")
    write_ply(tpl_path, tpl.pos, tpl.face, tpl.colors)

    mesh_dir = root / "meshes"
    mesh_dir.mkdir()
    rng = np.random.default_rng(0)
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
            "epochs": 2, "batch_size": 2, "lr": 1e-3, "weight_decay": 0,
            "laplacian_weight": 0.1, "kl_weight": 1e-4,
            "latent_consistency_weight": 0.5,
            "latent_consistency_eta1": 0.5, "latent_consistency_eta2": 0.5,
        },
        "model": {
            "sampling": {"type": "basic", "sampling_factors": [2, 2]},
            "spirals": {"length": [5, 5], "dilation": [1, 1]},
            "in_channels": 3, "out_channels": [8, 16],
            # divisible by the synthetic template's region count (3)
            "latent_size": 6, "pre_z_sigmoid": False,
        },
        "classifier": {
            "main_model_type": "qda", "mlp_training_type": "after",
            "mlp_hidden_features": [8], "mlp_lr": 1e-3, "mlp_epochs": 3,
        },
        "logging_frequency": {"tb_renderings": 100, "save_weights": 1},
    }
    return root, config


def test_full_cycle(workspace):
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager
    from craniofacialsd_vae_tpu.viz.logging import JsonlWriter

    root, config = workspace
    manager = ModelManager(
        config, precomputed_storage_path=config["data"]["precomputed_path"])
    train, val, test, norm, weights = build_datasets(
        config, manager.template)
    manager.set_class_conversions_and_weights(weights)

    it = BatchIterator(train, 2, shuffle=True)
    val_it = BatchIterator(val, 2, shuffle=False, drop_last=False)

    losses1 = manager.run_epoch(it, train=True)
    assert np.isfinite(losses1["tot"])
    manager.run_epoch(it, train=True)
    eval_losses = manager.run_epoch(val_it, train=False)
    assert np.isfinite(eval_losses["reconstruction"])

    # checkpoint → fresh manager → resume → identical encodings
    ckpt_dir = str(root / "ckpt")
    manager.save_weights(ckpt_dir, epoch=1)
    x = train.x[:2]
    z_before = np.asarray(manager.encode(x))

    manager2 = ModelManager(
        config, precomputed_storage_path=config["data"]["precomputed_path"])
    epoch = manager2.resume(ckpt_dir)
    assert epoch == 2
    z_after = np.asarray(manager2.encode(x))
    np.testing.assert_allclose(z_before, z_after, rtol=1e-6)

    # classifiers end to end
    writer = JsonlWriter(str(root / "logs"))
    accs = manager.train_and_validate_classifiers(
        BatchIterator(train, 2, shuffle=False), val_it, writer, ckpt_dir)
    assert set(accs) == {"mlp", "svm", "lda", "qda"}
    assert os.path.exists(os.path.join(ckpt_dir, "classifiers.npz"))

    # latent region map matches the template's surviving regions (tiny
    # spheres can dissolve a thin all-contour band during extraction)
    assert len(manager.latent_regions) == \
        len(manager.template.region_names)
    assert config["model"]["latent_size"] % \
        len(manager.latent_regions) == 0
    pred = manager.classify_latent(z_before, "qda")
    assert all(p in ("a", "c", "n") for p in pred)

    # rendering path (tiny image)
    imgs = manager.render(np.asarray(manager.generate(z_before)),
                          image_size=32)
    assert imgs.shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_run_epochs_scanned_matches_sequential(workspace):
    """manager.run_epochs_scanned (E epochs + validation in one dispatch)
    must produce the same parameters and losses as sequential
    run_epoch(train)/run_epoch(val) calls on device-resident iterators."""
    import jax
    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.data.dataset import (DeviceBatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager

    root, config = workspace

    def fresh():
        m = ModelManager(
            config,
            precomputed_storage_path=config["data"]["precomputed_path"])
        train, val, *_ = build_datasets(config, m.template)
        ti = DeviceBatchIterator(train, 2, shuffle=True, seed=3)
        vi = DeviceBatchIterator(val, 2, shuffle=True, seed=4)
        return m, ti, vi

    m1, t1, v1 = fresh()
    assert m1.can_scan_epochs(t1, v1)
    tr_list, va_list = m1.run_epochs_scanned(t1, v1, 2)
    assert len(tr_list) == len(va_list) == 2

    m2, t2, v2 = fresh()
    seq = []
    for _ in range(2):
        seq.append(dict(m2.run_epoch(t2, train=True)))
        m2.run_epoch(v2, train=False)

    for e in range(2):
        np.testing.assert_allclose(tr_list[e]["tot"], seq[e]["tot"],
                                   rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        m1.state.params, m2.state.params)
    # validation losses surface like the sequential path (val averages):
    # m2's last run_epoch was validation, so its _losses are the oracle
    for k in ("reconstruction", "tot"):
        np.testing.assert_allclose(m1._losses[k], m2._losses[k],
                                   rtol=1e-5, err_msg=k)


@pytest.mark.slow
def test_data_parallel_scanned_epoch_matches_per_step(workspace):
    """Under enable_data_parallel, run_epoch with a device-resident
    iterator takes the shard_map'd scanned path (one dispatch/epoch) and
    must match the per-step shard_map path (host BatchIterator) update
    for update."""
    import jax

    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     DeviceBatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager

    root, config = workspace
    n_dev = 2

    def fresh(make_iter):
        m = ModelManager(
            config,
            precomputed_storage_path=config["data"]["precomputed_path"])
        m.enable_data_parallel(n_dev)
        train, *_ = build_datasets(config, m.template)
        it = make_iter(train, m.batch_size * n_dev, shuffle=True, seed=5)
        return m, it

    m1, it1 = fresh(DeviceBatchIterator)
    losses_scan = dict(m1.run_epoch(it1, train=True))

    m2, it2 = fresh(BatchIterator)
    losses_step = dict(m2.run_epoch(it2, train=True))

    assert it1.batch_size == m1._global_batch_size
    np.testing.assert_allclose(losses_scan["tot"], losses_step["tot"],
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        m1.state.params, m2.state.params)


def test_fit_mesh_artifacts(workspace, tmp_path):
    """fit_mesh(save_artifacts=True) exports the fitted mesh + aligned
    scan + scalar JSON (reference test.py:477-483 writes *_fit.obj /
    *_aligned.obj)."""
    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.geometry.mesh_io import read_mesh, write_obj
    from craniofacialsd_vae_tpu.manager import ModelManager

    root, config = workspace
    manager = ModelManager(
        config, precomputed_storage_path=config["data"]["precomputed_path"])
    train, val, test, norm, weights = build_datasets(
        config, manager.template)
    out_dir = str(tmp_path / "fit_out")
    tester = Tester(manager, norm,
                    BatchIterator(train, 2, shuffle=False), None,
                    out_dir, config)
    # landmark indices valid on the tiny synthetic template
    n = manager.template.num_vertices
    tester.template_landmarks_idx = list(range(0, n, max(n // 6, 1)))[:6]

    scan_path = str(tmp_path / "scan.obj")
    write_obj(scan_path, manager.template.pos * 1.1, manager.template.face)
    landmarks = manager.template.pos[tester.template_landmarks_idx] * 1.1

    result = tester.fit_mesh(scan_path, landmarks, iterations=3,
                             n_restarts=2, save_artifacts=True)
    assert "artifacts" in result
    fit_path, aligned_path = result["artifacts"]
    assert os.path.exists(fit_path) and os.path.exists(aligned_path)
    assert os.path.exists(os.path.join(out_dir, "fit", "scan_fit.json"))
    fitted = read_mesh(fit_path)
    assert fitted.vertices.shape == (n, 3)
    aligned = read_mesh(aligned_path)
    assert aligned.vertices.shape == (n, 3)
    # the aligned scan must land near the template frame (procrustes
    # undoes the 1.1 scale)
    assert np.abs(aligned.vertices - manager.template.pos).max() < 1e-3


def test_midtrain_traversals_transient_for_ae(workspace, tmp_path):
    """Mid-training traversals on an AE config (kl 0, e.g. body.yaml) need
    data-derived latent ranges — but must be TRANSIENT: no z_stats.npz,
    no manager._train_latents fill (the final classifier fit would reuse
    half-trained latents), and no shuffle-RNG draw from the train
    iterator (subsequent epoch plans must be unchanged)."""
    import copy

    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager

    root, config = workspace
    cfg = copy.deepcopy(config)
    cfg["optimization"]["kl_weight"] = 0.0
    manager = ModelManager(
        cfg, precomputed_storage_path=cfg["data"]["precomputed_path"])
    assert not manager.is_vae
    train, val, _, norm, weights = build_datasets(cfg, manager.template)
    manager.set_class_conversions_and_weights(weights)

    it = BatchIterator(train, 2, shuffle=True, seed=7)
    val_it = BatchIterator(val, 2, shuffle=False, drop_last=False)
    out = str(tmp_path / "midtrain")
    tester = Tester(manager, norm, it, val_it, out, cfg, lazy_stats=True)

    state_before = copy.deepcopy(it._rng.bit_generator.state)
    tester.latent_traversals(use_z_stats=False, render_videos=False,
                             save_suffix="5")
    assert it._rng.bit_generator.state == state_before
    assert not os.path.exists(os.path.join(out, "z_stats.npz"))
    assert manager._train_latents is None
    assert tester._latent_stats is None
