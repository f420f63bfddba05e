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
