"""Dataset pipeline tests: discovery, splits, normalization caching,
augmentation modes, class weights, batching."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh_dir(tmp_path_factory):
    """A tiny synthetic dataset of class-prefixed OBJs sharing a template."""
    from craniofacialsd_vae_tpu.geometry import write_obj
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template

    tpl = synthetic_template(subdivisions=2, n_regions=3)
    root = tmp_path_factory.mktemp("meshes")
    rng = np.random.default_rng(0)
    for c in ["a", "c", "m", "n", "b"]:
        for i in range(6):
            verts = tpl.pos + rng.normal(scale=0.02,
                                         size=tpl.pos.shape)
            write_obj(str(root / f"{c}_{i}.obj"), verts, tpl.face)
    return str(root), tpl


def _config(root, precomp, **data_overrides):
    data = {"dataset_path": root, "precomputed_path": precomp,
            "normalize_data": True, "stratified_split": True,
            "augmentation_factor": 0, "swap_features": True}
    data.update(data_overrides)
    return {"data": data, "optimization": {"batch_size": 2}}


class TestSplits:
    def test_split_caching_and_shapes(self, mesh_dir, tmp_path):
        from craniofacialsd_vae_tpu.data.dataset import build_datasets

        root, tpl = mesh_dir
        cfg = _config(root, str(tmp_path))
        train, val, test, norm, weights = build_datasets(cfg, tpl)
        assert len(train) + len(val) + len(test) == 30
        assert train.x.shape[1:] == (tpl.num_vertices, 3)
        # split cached
        assert os.path.exists(tmp_path / "data_split.json")
        with open(tmp_path / "data_split.json") as f:
            split = json.load(f)
        assert sorted(split["train"]) == sorted(train.names)
        # second build reuses the cache identically
        train2, *_ = build_datasets(cfg, tpl)
        assert train2.names == train.names

    def test_labels_merge_b_into_n(self, mesh_dir, tmp_path):
        from craniofacialsd_vae_tpu.data.dataset import build_datasets

        root, tpl = mesh_dir
        cfg = _config(root, str(tmp_path))
        train, val, test, _, weights = build_datasets(cfg, tpl)
        all_labels = set(train.y) | set(val.y) | set(test.y)
        assert "b" not in all_labels           # merged into 'n'
        assert "b" in weights                  # but stays a weight class

    def test_normalization_stats(self, mesh_dir, tmp_path):
        from craniofacialsd_vae_tpu.data.dataset import build_datasets
        from craniofacialsd_vae_tpu.geometry import read_mesh

        root, tpl = mesh_dir
        cfg = _config(root, str(tmp_path))
        train, *_ , norm, _ = build_datasets(cfg, tpl)
        # normalized train split should be ~zero-mean
        assert abs(train.x.mean()) < 0.2
        raw = read_mesh(os.path.join(root, train.names[0])).vertices
        recon = train.x[0] * norm["std"] + norm["mean"]
        np.testing.assert_allclose(recon, raw, rtol=1e-4, atol=1e-5)

    def test_reference_precomputed_dir_migrates(self, mesh_dir, tmp_path):
        """A reference precomputed dir (data_split.json + torch norm.pt,
        reference data_loading.py:180-252) is consumed as-is: the split
        lists and normalization stats are honored bit-for-bit and the .pt
        stays the cache — no norm.npz is written next to it."""
        import torch

        from craniofacialsd_vae_tpu.data.dataset import build_datasets

        root, tpl = mesh_dir
        # first, our own build in a scratch dir to get ground-truth stats
        own = _config(root, str(tmp_path / "own"))
        train0, val0, test0, norm0, _ = build_datasets(own, tpl)

        migrated = tmp_path / "migrated"
        migrated.mkdir()
        with open(tmp_path / "own" / "data_split.json") as f:
            split = json.load(f)
        with open(migrated / "data_split.json", "w") as f:
            json.dump(split, f)
        # perturb the stats slightly so we can tell .pt was actually read
        mean = torch.tensor(norm0["mean"] + 0.5)
        std = torch.tensor(norm0["std"] * 2.0)
        torch.save({"mean": mean, "std": std}, migrated / "norm.pt")

        cfg = _config(root, str(migrated))
        train, val, test, norm, _ = build_datasets(cfg, tpl)
        assert train.names == train0.names
        np.testing.assert_array_equal(norm["mean"], mean.numpy())
        np.testing.assert_array_equal(norm["std"], std.numpy())
        # the migrated dir is read-only: NOTHING of ours lands in it —
        # no norm.npz and no training/test/val split caches
        assert sorted(os.listdir(migrated)) == ["data_split.json", "norm.pt"]
        # and the normalization used the imported stats
        np.testing.assert_allclose(
            train.x[0] * norm["std"] + norm["mean"],
            train0.x[0] * norm0["std"] + norm0["mean"], rtol=1e-4, atol=1e-4)
        # second build re-reads meshes (no stale cache) and matches
        train2, *_ = build_datasets(cfg, tpl)
        np.testing.assert_array_equal(train.x, train2.x)

    def test_real_reference_norm_pt(self, tmp_path):
        """The ACTUAL reference norm.pt (17,039-vertex stats shipped with
        demo_files) loads and normalizes the shipped demo meshes."""
        import shutil

        from tests.conftest import DEMO_FILES, has_demo_files

        if not has_demo_files():
            pytest.skip("reference demo_files not mounted")
        import torch

        from craniofacialsd_vae_tpu.data.dataset import build_datasets
        from craniofacialsd_vae_tpu.geometry import load_template, read_mesh

        tpl = load_template(os.path.join(DEMO_FILES, "template.ply"))
        shutil.copy(os.path.join(DEMO_FILES, "norm.pt"), tmp_path / "norm.pt")
        cfg = _config(os.path.join(DEMO_FILES, "meshes"), str(tmp_path),
                      stratified_split=False)
        train, val, test, norm, _ = build_datasets(cfg, tpl)
        ref = torch.load(os.path.join(DEMO_FILES, "norm.pt"),
                         map_location="cpu", weights_only=True)
        np.testing.assert_array_equal(
            norm["mean"], ref["mean"].numpy().astype(np.float32))
        assert sorted(os.listdir(tmp_path)) == ["data_split.json", "norm.pt"]
        raw = read_mesh(os.path.join(
            DEMO_FILES, "meshes", train.names[0])).vertices
        np.testing.assert_allclose(train.x[0] * norm["std"] + norm["mean"],
                                   raw, rtol=1e-3, atol=1e-4)

    def test_deterministic_modulo_split(self, mesh_dir, tmp_path):
        from craniofacialsd_vae_tpu.data.dataset import split_files

        root, _ = mesh_dir
        names = sorted(os.listdir(root))
        train, test, val = split_files(names, stratified=False)
        # reference rule: i%100<=5 test, <=10 val, else train
        assert test == names[:6]
        assert val == names[6:11]
        assert train == names[11:]


class TestAugmentation:
    def test_interpolate_mode(self, mesh_dir, tmp_path):
        from craniofacialsd_vae_tpu.data.augmentation import augment_pairs

        root, tpl = mesh_dir
        rng = np.random.default_rng(1)
        x1 = np.stack([tpl.pos, tpl.pos * 1.1]).astype(np.float32)
        x2 = np.stack([tpl.pos * 0.9, tpl.pos]).astype(np.float32)
        out, tags = augment_pairs("interpolate", x1, x2, rng)
        assert out.shape == x1.shape
        # each output lies between its pair
        lo = np.minimum(x1, x2) - 1e-5
        hi = np.maximum(x1, x2) + 1e-5
        assert ((out >= lo) & (out <= hi)).all()
        assert all(t.startswith("_interp") for t in tags)

    def test_spectral_interp_mode(self, mesh_dir):
        from craniofacialsd_vae_tpu.data.augmentation import augment_pairs
        from craniofacialsd_vae_tpu.ops.eigh import \
            laplacian_eigendecomposition

        root, tpl = mesh_dir
        _, eigvecs = laplacian_eigendecomposition(tpl, k=40,
                                                  backend="scipy")
        rng = np.random.default_rng(2)
        x1 = tpl.pos[None].astype(np.float32)
        x2 = (tpl.pos * 1.2)[None].astype(np.float32)
        out, tags = augment_pairs("spectral_interp", x1, x2, rng, eigvecs)
        assert out.shape == x1.shape
        assert np.isfinite(out).all()
        # output differs from both inputs but stays in a sane range
        assert not np.allclose(out, x1) and not np.allclose(out, x2)
        assert np.abs(out).max() < 10 * np.abs(x1).max()

    def test_spectral_comb_mode(self, mesh_dir):
        """spectral_comb swaps a random third of the first 30 coefficients
        (reference utils.py:244-253): every output coefficient must equal
        either x1's or x2's, and coefficients beyond the first 30 must be
        untouched (always x1's)."""
        from craniofacialsd_vae_tpu.data.augmentation import (SWAP_UNTIL,
                                                              augment_pairs)
        from craniofacialsd_vae_tpu.ops.eigh import \
            laplacian_eigendecomposition

        root, tpl = mesh_dir
        _, eigvecs = laplacian_eigendecomposition(tpl, k=40,
                                                  backend="scipy")
        rng = np.random.default_rng(3)
        x1 = tpl.pos[None].astype(np.float32)
        # perturb every spectral coefficient so the "which parent" test is
        # unambiguous per coefficient
        x2 = (tpl.pos + eigvecs @ rng.normal(
            size=(eigvecs.shape[1], 3)) * 0.05)[None].astype(np.float32)
        out, tags = augment_pairs("spectral_comb", x1, x2, rng, eigvecs)
        assert tags == ["_spectral_comb"]
        assert np.isfinite(out).all()

        s1 = np.einsum("nk,nc->kc", eigvecs, x1[0])
        s2 = np.einsum("nk,nc->kc", eigvecs, x2[0])
        s_out = np.einsum("nk,nc->kc", eigvecs, out[0])
        scale = np.abs(s1).max()
        from1 = np.abs(s_out - s1).max(axis=1) < 1e-4 * scale
        from2 = np.abs(s_out - s2).max(axis=1) < 1e-4 * scale
        assert (from1 | from2).all()                  # each coeff is a swap
        assert from1[SWAP_UNTIL:].all()               # tail untouched
        assert from2[:SWAP_UNTIL].sum() == SWAP_UNTIL // 3  # exactly 1/3

    def test_single_mesh_lift(self, mesh_dir):
        """The spectral augmentations accept an unbatched [N, 3] mesh and
        must lift it to [1, N, 3] (np.atleast_3d appends the new axis at
        the END, which fed [N, 3, 1] into the batched einsums)."""
        from craniofacialsd_vae_tpu.data.augmentation import (
            spectral_combination, spectral_interpolation)
        from craniofacialsd_vae_tpu.ops.eigh import \
            laplacian_eigendecomposition

        root, tpl = mesh_dir
        _, eigvecs = laplacian_eigendecomposition(tpl, k=40,
                                                  backend="scipy")
        x1 = tpl.pos.astype(np.float32)
        x2 = (tpl.pos * 1.2).astype(np.float32)
        for fn in (spectral_combination, spectral_interpolation):
            single = fn(eigvecs, x1, x2, np.random.default_rng(7))
            batched = fn(eigvecs, x1[None], x2[None],
                         np.random.default_rng(7))
            assert single.shape == (1,) + x1.shape
            np.testing.assert_allclose(single, batched, rtol=1e-6)

    def test_offline_augmentation_writes_files(self, mesh_dir,
                                               tmp_path_factory):
        from craniofacialsd_vae_tpu.data.dataset import build_datasets

        root, tpl = mesh_dir
        # fresh precomp dir + isolated copy of the dataset (augmentation
        # writes into <root>/augmented)
        import shutil
        root2 = str(tmp_path_factory.mktemp("meshes_aug"))
        for f in os.listdir(root):
            shutil.copy(os.path.join(root, f), root2)
        precomp = str(tmp_path_factory.mktemp("precomp"))
        cfg = _config(root2, precomp, augmentation_factor=2,
                      augmentation_mode="interpolate",
                      augmentation_balanced=True)
        train, *_ = build_datasets(cfg, tpl)
        aug_dir = os.path.join(root2, "augmented")
        assert os.path.isdir(aug_dir) and len(os.listdir(aug_dir)) > 0
        assert any("aug" in n for n in train.names)
        assert train.augmented.sum() == len(os.listdir(aug_dir))


class TestBatchIterator:
    def test_drop_last_and_labels(self, mesh_dir, tmp_path):
        from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                         build_datasets)

        root, tpl = mesh_dir
        cfg = _config(root, str(tmp_path))
        train, *_ = build_datasets(cfg, tpl)
        class2idx = {"a": 0, "c": 1, "m": 2, "n": 3, "b": 4}
        it = BatchIterator(train, 4, shuffle=True, class2idx=class2idx)
        batches = list(it)
        assert len(batches) == len(train) // 4
        for b in batches:
            assert b["x"].shape[0] == 4
            assert b["labels"].shape == (4,)
            assert all(l in (0, 1, 2, 3) for l in b["labels"])


class TestBodiesVariant:
    """data_type='bodies' end-to-end: DatasetSummary's PID / 'Face Used'
    column path (reference utils.py:193-231 for the body dataset), csv
    summary (no xlsx engine needed), and a training epoch under the
    body.yaml hyperparameter shape (AE mode, kl 0)."""

    def test_summary_pid_face_used_path(self, tmp_path):
        import pandas as pd

        from craniofacialsd_vae_tpu.data.dataset import DatasetSummary

        df = pd.DataFrame({
            "Dataset": ["LSFM", "LSFM", "Apert"],
            "PID": [1, 2, 3],
            "AgeYears": [2.0, 30.0, np.nan],
            "Gender": ["F", "M", "F"],
            "Face Used": ["y", "n", "y"],
        })
        path = str(tmp_path / "summary.csv")
        df.to_csv(path, index=False)
        s = DatasetSummary.load(path, data_type="bodies")
        # PID (not ID) keys the mesh names; Face Used filters
        assert s.used == ["n_1", "a_3"]
        age, gender = s.age_and_gender("n_1")
        assert age == 2.0 * 12 + 6 and gender == "F"     # years → months
        assert s.age_and_gender("a_3")[0] == -1          # NaN age kept -1

    def test_summary_without_age_columns(self, tmp_path):
        """A sheet with neither AgeMonths nor AgeYears must degrade to
        age=-1 like every other missing-age path (row.get('AgeYears')
        returns None and `None == None` is True, so the NaN guard alone
        would send None into the years→months arithmetic)."""
        import pandas as pd

        from craniofacialsd_vae_tpu.data.dataset import DatasetSummary

        df = pd.DataFrame({
            "Dataset": ["LSFM"], "PID": [1],
            "Gender": ["M"], "Face Used": ["y"],
        })
        path = str(tmp_path / "summary.csv")
        df.to_csv(path, index=False)
        s = DatasetSummary.load(path, data_type="bodies")
        assert s.age_and_gender("n_1") == (-1.0, "M")

    def test_bodies_end_to_end_epoch(self, mesh_dir, tmp_path):
        import pandas as pd

        from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                         build_datasets)
        from craniofacialsd_vae_tpu.manager import ModelManager
        from craniofacialsd_vae_tpu.geometry import write_ply

        root, tpl = mesh_dir
        # summary marks all meshes used, via the bodies columns
        rows = []
        for c in ["a", "c", "m", "n", "b"]:
            ds = {"a": "Apert", "c": "Crouzon", "m": "Muenke",
                  "n": "LSFM", "b": "Paeds"}[c]
            for i in range(6):
                rows.append({"Dataset": ds, "PID": i,
                             "AgeYears": 20.0, "Gender": "F",
                             "Face Used": "y"})
        summary = str(tmp_path / "bodies.csv")
        pd.DataFrame(rows).to_csv(summary, index=False)
        tpl_path = str(tmp_path / "body_template.ply")
        write_ply(tpl_path, tpl.pos, tpl.face, tpl.colors)

        config = {
            "data": {
                "template_path": tpl_path, "dataset_path": root,
                "dataset_summary_path": summary,
                "precomputed_path": str(tmp_path / "precomp"),
                "data_type": "bodies", "normalize_data": True,
                "to_mm_constant": 100.0, "swap_features": True,
                "stratified_split": True, "augmentation_factor": 0,
            },
            "optimization": {
                "epochs": 1, "batch_size": 2, "lr": 1e-4,
                "weight_decay": 0, "laplacian_weight": 1.0,
                "kl_weight": 0.0,            # body.yaml: AE mode
                "latent_consistency_weight": 1.0,
                "latent_consistency_eta1": 0.5,
                "latent_consistency_eta2": 0.5,
            },
            "model": {
                "sampling": {"type": "basic", "sampling_factors": [2, 2]},
                "spirals": {"length": [5, 5], "dilation": [1, 1]},
                "in_channels": 3, "out_channels": [8, 16],
                "latent_size": 6, "pre_z_sigmoid": False,
            },
            "logging_frequency": {"tb_renderings": 5, "save_weights": 20},
        }
        manager = ModelManager(
            config,
            precomputed_storage_path=config["data"]["precomputed_path"])
        assert not manager.is_vae                        # kl 0 → AE
        train, val, test, norm, weights = build_datasets(
            config, manager.template)
        assert len(train) + len(val) + len(test) == 30
        assert all(a == 20 * 12 + 6 for a in train.age)  # summary applied
        manager.set_class_conversions_and_weights(weights)
        losses = manager.run_epoch(
            BatchIterator(train, 2, shuffle=True), train=True)
        assert np.isfinite(losses["tot"]) and losses["kl"] == 0.0


class TestCacheInvalidation:
    """Regenerating the dataset must invalidate the split/norm/npz caches
    in precomputed_path (they would otherwise silently serve the previous
    dataset — observed live in round 4's hard-benchmark retrain); legacy
    splits without a fingerprint stamp (reference migrations, read-only
    precomputed dirs) stay trusted as-is."""

    def _workspace(self, tmp_path, scale):
        import time

        from craniofacialsd_vae_tpu.geometry import write_obj
        from craniofacialsd_vae_tpu.geometry.synthetic import \
            synthetic_template

        tpl = synthetic_template(subdivisions=1, n_regions=3)
        mesh_dir = tmp_path / "meshes"
        mesh_dir.mkdir(exist_ok=True)
        rng = np.random.default_rng(0)
        for c in ["a", "n"]:
            for i in range(6):
                write_obj(str(mesh_dir / f"{c}_{i}.obj"),
                          tpl.pos * scale + rng.normal(
                              scale=0.01, size=tpl.pos.shape), tpl.face)
        return tpl, {
            "data": {"dataset_path": str(mesh_dir),
                     "precomputed_path": str(tmp_path / "precomp"),
                     "normalize_data": True, "stratified_split": False,
                     "augmentation_factor": 0},
        }

    def test_regenerated_dataset_invalidates_caches(self, tmp_path):
        from craniofacialsd_vae_tpu.data.dataset import build_datasets

        tpl, config = self._workspace(tmp_path, scale=1.0)
        _, _, _, norm1, _ = build_datasets(config, tpl)

        import time
        time.sleep(0.01)               # ensure mtime_ns moves
        tpl, config = self._workspace(tmp_path, scale=2.0)  # regenerate
        _, _, _, norm2, _ = build_datasets(config, tpl)
        # the norm cache was rebuilt from the NEW meshes (~2x template):
        # with stale caches norm2 would equal norm1 bit-for-bit
        assert not np.allclose(norm2["mean"], norm1["mean"])
        np.testing.assert_allclose(norm2["mean"], 2 * tpl.pos, atol=0.05)

    def test_legacy_split_without_stamp_is_trusted(self, tmp_path):
        import json

        from craniofacialsd_vae_tpu.data.dataset import build_datasets

        tpl, config = self._workspace(tmp_path, scale=1.0)
        build_datasets(config, tpl)
        split_path = tmp_path / "precomp" / "data_split.json"
        with open(split_path) as f:
            split = json.load(f)
        assert "dataset_fingerprint" in split
        del split["dataset_fingerprint"]     # simulate a migrated dir
        with open(split_path, "w") as f:
            json.dump(split, f)
        import time
        time.sleep(0.01)
        self._workspace(tmp_path, scale=3.0)  # dataset changes...
        build_datasets(config, tpl)
        with open(split_path) as f:
            again = json.load(f)
        # ...but the unstamped split was trusted and left untouched
        assert "dataset_fingerprint" not in again
