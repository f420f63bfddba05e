"""Smoke tests for the round-2 Tester parity tail: figure overlays,
classify_and_project, per-variable interpolation plumbing, per-syndrome
angle boxplots, and legacy-figure loading (reference test.py:544-637,
771-833, 872-904, 906-970)."""

import os
import pickle

import numpy as np
import pytest

from tests.conftest import DEMO_FILES, requires_demo


REGIONS = {"k1": (0, 3), "k2": (3, 6)}


class StubZoo:
    def __init__(self):
        from craniofacialsd_vae_tpu.analysis import (LDAClassifier,
                                                     QDAClassifier)

        rng = np.random.default_rng(0)
        z = np.concatenate([rng.normal(size=(30, 6)),
                            rng.normal(size=(30, 6)) + 3.0,
                            rng.normal(size=(30, 6)) - 3.0])
        y = np.repeat([0, 1, 2], 30)
        self.lda = LDAClassifier().fit(z, y)
        self.qda = QDAClassifier().fit(z, y)
        self.region_ldas = {k: LDAClassifier().fit(z[:, lo:hi], y)
                            for k, (lo, hi) in REGIONS.items()}
        self.region_qdas = {k: QDAClassifier().fit(z[:, lo:hi], y)
                            for k, (lo, hi) in REGIONS.items()}

    def mahalanobis(self, z, idx, region="all"):
        zz = np.asarray(z).reshape(-1)
        if region == "all":
            return self.qda.mahalanobis(zz, idx)
        lo, hi = REGIONS[region]
        if zz.shape[0] == 6:
            zz = zz[lo:hi]
        return self.region_qdas[region].mahalanobis(zz, idx)


class StubManager:
    def __init__(self):
        self.latent_regions = dict(REGIONS)
        self.classifiers = StubZoo()
        self.model_latent_size = 6

    def lda_project_latents_in_2d(self, z):
        return np.atleast_2d(np.asarray(z))[:, :2]

    def classify_latent(self, z, model="qda"):
        return ["n"] * len(np.atleast_2d(z))

    def class2idx(self, c):
        return 0


@pytest.fixture()
def tester(tmp_path, monkeypatch):
    """A Tester wired to a stub manager with pre-made pickled figures."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.geometry import template as tmod

    # the stub regions must resolve through COLOUR2ATTRIBUTE for the grid
    monkeypatch.setitem(tmod.COLOUR2ATTRIBUTE, "k1", "k1")
    monkeypatch.setitem(tmod.COLOUR2ATTRIBUTE, "k2", "k2")

    out = str(tmp_path)
    fig = plt.figure()
    plt.scatter([0, 1], [0, 1])
    with open(os.path.join(out, "lda_emb_distributions.pkl"), "wb") as f:
        pickle.dump(fig, f)
    plt.close(fig)

    df = pd.DataFrame({"x1": np.random.default_rng(0).normal(size=20),
                       "x2": np.random.default_rng(1).normal(size=20),
                       "region": ["k1"] * 10 + ["k2"] * 10})
    g = sns.FacetGrid(df, col="region")
    g.map(plt.scatter, "x1", "x2")
    with open(os.path.join(out, "emb_all_train_dist.pkl"), "wb") as f:
        pickle.dump(g, f)
    plt.close("all")

    t = Tester.__new__(Tester)
    t._manager = StubManager()
    t._out_dir = out
    t._norm = {"mean": np.zeros(3), "std": np.ones(3)}
    t._normalized = True
    return t


class TestFigureOverlays:
    def test_global_overlay_and_video(self, tester, tmp_path):
        z = np.random.default_rng(2).normal(size=(4, 6))
        tester._overlay_on_global_figure(z, str(tmp_path), "traj_emb",
                                         video_name="traj_emb_interp")
        assert (tmp_path / "traj_emb.svg").exists()
        assert any((tmp_path / f"traj_emb_interp.{ext}").exists()
                   for ext in ("avi", "gif", "mp4"))

    def test_region_grid_overlay(self, tester, tmp_path):
        z = np.random.default_rng(3).normal(size=(3, 6))
        tester._overlay_on_region_grid(z, str(tmp_path), "traj_emb_r",
                                       video=True)
        assert (tmp_path / "traj_emb_r.svg").exists()
        assert any((tmp_path / f"traj_emb_r.{ext}").exists()
                   for ext in ("avi", "gif", "mp4"))

    def test_classify_and_project(self, tester, monkeypatch):
        z_fix = np.random.default_rng(4).normal(size=(1, 6))
        monkeypatch.setattr(tester, "_load_and_encode",
                            lambda path: z_fix)
        label = tester.classify_and_project("/fake/patient_x.obj")
        assert label == ["n"]
        interp = os.path.join(tester._out_dir, "interpolations")
        assert os.path.exists(os.path.join(interp, "patient_x_emb.svg"))
        assert os.path.exists(os.path.join(interp, "patient_x_emb_r.svg"))


class TestPrePostCovlessQDA:
    def test_pair_with_imported_covless_heads(self, tester, monkeypatch):
        """evaluate_pre_post_pair must go through class_covariance so that
        QDA heads imported from store_covariance=False sklearn pickles
        (covs=None) still evaluate instead of TypeError-ing on covs[i]."""
        zoo = tester._manager.classifiers
        zoo.qda.covs = None
        for rq in zoo.region_qdas.values():
            rq.covs = None

        rng = np.random.default_rng(11)
        monkeypatch.setattr(
            tester, "_load_and_encode",
            lambda path: rng.normal(size=(1, 6)).astype(np.float32))
        from craniofacialsd_vae_tpu.analysis import tester as tmodule
        monkeypatch.setitem(tmodule.PROCEDURES2ATTRIBUTES, "monobloc",
                            ["k1", "k2"])

        out = tester.evaluate_pre_post_pair("a.obj", "b.obj", "p1",
                                            procedure="monobloc")
        assert np.isfinite(out["global_metric"])
        assert np.isfinite(out["global_metric_l2"])
        assert np.isfinite(out["global_metric_directional"])
        assert set(out["region_metrics"]) == {"k1", "k2"}


class TestConfusionMatrixLabels:
    def test_region_confmats_with_unseen_prediction(self, tester):
        """A region head predicting a class absent from the test labels
        must not crash the heatmap (matrix built without labels= had one
        more row than the tick-label list)."""
        # latents near the class-2 mean (-3) while test labels only cover
        # classes 0/1 → the stub QDA predicts '2' for some rows
        mgr = tester._manager
        mgr.idx2class = lambda idx: [["n", "a", "c"][int(i)] for i in
                                     np.atleast_1d(idx)]
        ts_z = np.concatenate([
            np.zeros((3, 6), np.float32),            # class 0 region
            np.full((3, 6), -3.0, np.float32),       # class 2 region
        ])
        ts_ly = np.array(["n", "n", "n", "a", "a", "a"])
        tester.confusion_matrices_per_region(ts_z, ts_ly)
        assert os.path.exists(os.path.join(tester._out_dir,
                                           "region_confmats_qda.svg"))


class TestPrePostBatchDriver:
    def test_angle_boxplots_per_syndrome(self, tester, tmp_path,
                                         monkeypatch):
        """The batch driver consumes region_rows_a into per-syndrome
        angle-metric boxplots (reference test.py:952-971)."""
        import pandas as pd

        rng = np.random.default_rng(5)
        monkeypatch.setattr(
            tester, "_load_and_encode",
            lambda path: rng.normal(size=(1, 6)).astype(np.float32))

        pairs = pd.DataFrame({
            "PID": ["p1", "p2", "p3"],
            "Pre name": ["a.obj"] * 3,
            "Post name": ["b.obj"] * 3,
            "Surgery regions": ["monobloc"] * 3,
            "Procedure": ["monobloc", "monobloc", "le_fort_III"],
            "Syndrome": ["Apert", "Crouzon", "Apert"],
        })
        csv = tmp_path / "pairs.csv"
        pairs.to_csv(csv, index=False)

        # monobloc's affected regions must intersect the stub regions
        from craniofacialsd_vae_tpu.geometry import template as tmod
        monkeypatch.setitem(tmod.PROCEDURES2ATTRIBUTES, "monobloc",
                            ["k1", "k2"])
        monkeypatch.setitem(tmod.PROCEDURES2ATTRIBUTES, "le_fort_III",
                            ["k2"])
        from craniofacialsd_vae_tpu.analysis import tester as tmodule
        monkeypatch.setitem(tmodule.PROCEDURES2ATTRIBUTES, "monobloc",
                            ["k1", "k2"])
        monkeypatch.setitem(tmodule.PROCEDURES2ATTRIBUTES, "le_fort_III",
                            ["k2"])

        tester.evaluate_all_pre_post_pairs_in_excel(str(tmp_path),
                                                    str(csv))
        out = os.path.join(tester._out_dir, "pre_post_eval_plots")
        assert os.path.exists(os.path.join(
            out, "region_metrics_distances.svg"))
        assert os.path.exists(os.path.join(
            out, "region_metrics_with_angles_apert.svg"))
        assert os.path.exists(os.path.join(
            out, "region_metrics_with_angles_crouzon.svg"))
        assert os.path.exists(os.path.join(out, "pairs_with_results.csv"))


@requires_demo
class TestLegacyFigureLoading:
    """The reference's shipped figures were pickled by matplotlib 3.4 /
    seaborn 0.11; load_pickled_figure must repair them for overlays."""

    def test_global_figure(self, tmp_path):
        from craniofacialsd_vae_tpu.viz.plots import load_pickled_figure

        fig = load_pickled_figure(
            os.path.join(DEMO_FILES, "lda_emb_distributions.pkl"))
        fig.gca().scatter([0.0], [0.0], c=["#e881a7"])
        fig.savefig(str(tmp_path / "legacy_global.svg"))
        assert (tmp_path / "legacy_global.svg").stat().st_size > 0

    def test_region_facetgrid(self, tmp_path):
        from craniofacialsd_vae_tpu.viz.plots import load_pickled_figure

        g = load_pickled_figure(
            os.path.join(DEMO_FILES, "emb_all_train_dist.pkl"))
        assert len(g.axes_dict) == 15
        first = g.axes_dict[list(g.axes_dict)[0]]
        first.scatter([0.0], [0.0], c=["#e881a7"])
        g.fig.savefig(str(tmp_path / "legacy_regions.svg"))
        assert (tmp_path / "legacy_regions.svg").stat().st_size > 0
