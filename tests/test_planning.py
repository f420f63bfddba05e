"""Unit tests for analysis/planning.py on a controlled Gaussian.

The serving/tester parity test (tests/test_serving.py) runs the planning
math end-to-end, but on the synthetic-trained runs the healthy-class
Gaussian is near-point-mass, so every 3/2/1-std crossing degenerates to
the healthy mean and the crossing search itself is never exercised.
Here the Gaussian is isotropic with a known sigma, so the k-std
crossings have closed-form locations (|z - mean| = k * sigma) that the
walk must hit to within one linspace step (reference semantics:
/root/reference/test.py:652-748).
"""

import numpy as np
import pytest

from craniofacialsd_vae_tpu.analysis.classifiers import QDAClassifier
from craniofacialsd_vae_tpu.analysis.planning import (healthy_gaussian,
                                                      plan_to_healthy)
from craniofacialsd_vae_tpu.geometry.template import PROCEDURES2ATTRIBUTES

D = 12
SIGMA = 2.0
N_LINSPACE = 4000


@pytest.fixture(scope="module")
def plan():
    mean_h = np.zeros(D, np.float32)
    cov_h = (SIGMA ** 2) * np.eye(D)
    # patient along the all-ones diagonal, 10 sigma out — every latent
    # dim differs from the healthy mean, so every mapped slice moves
    z_p = np.full(D, 10.0 * SIGMA / np.sqrt(D), np.float32)
    # two real procedure attributes get latent slices; the rest of the
    # latent is unmapped and must never move in procedure walks
    regions = {"[194 109  97 255]": (0, 4),     # genioplasty
               "[237 109  93 255]": (4, 8)}     # rhinoplasty
    out = plan_to_healthy(z_p, mean_h, cov_h, regions,
                          n_p_to_3std=8, n_linspace=N_LINSPACE)
    return z_p, mean_h, regions, out


def test_crossings_at_known_radii(plan):
    """For an isotropic Gaussian the k-std neg-log-pdf threshold is the
    sphere |z - mean| = k*sigma; the first walk point inside it must sit
    within one linspace step of that radius, strictly inside."""
    z_p, mean_h, _, out = plan
    step = np.linalg.norm(z_p - mean_h) / (N_LINSPACE - 1)
    for k in (3, 2, 1):
        r = np.linalg.norm(out[f"z_{k}std"] - mean_h)
        assert r <= k * SIGMA + 1e-5, f"{k}-std point outside the sphere"
        assert r > k * SIGMA - step - 1e-5, \
            f"{k}-std point overshot by more than one linspace step"


def test_crossing_order_and_path(plan):
    z_p, mean_h, _, out = plan
    d = {k: np.linalg.norm(out[f"z_{k}std"] - mean_h) for k in (3, 2, 1)}
    assert d[3] > d[2] > d[1] > 0.0
    path = out["all_attributes"]
    assert path.shape == (8 + 3, D)
    np.testing.assert_allclose(path[0], z_p, rtol=1e-6)
    np.testing.assert_allclose(path[7], out["z_3std"], rtol=1e-6)
    np.testing.assert_allclose(path[8], out["z_2std"], rtol=1e-6)
    np.testing.assert_allclose(path[9], out["z_1std"], rtol=1e-6)
    np.testing.assert_allclose(path[10], mean_h, atol=1e-7)


def test_procedure_walks_move_only_mapped_slices(plan):
    z_p, mean_h, regions, out = plan
    assert set(out["procedures"]) == set(PROCEDURES2ATTRIBUTES)
    moved_cols = {"genioplasty": set(range(0, 4)),
                  "rhinoplasty": set(range(4, 8)),
                  # mandibular_ost includes the genioplasty attribute
                  "mandibular_ost": set(range(0, 4)),
                  # calvarial maps no region in this latent layout
                  "calvarial": set()}
    for proc, grid in out["procedures"].items():
        assert grid.shape == (8 + 3, D)
        np.testing.assert_allclose(grid[0], z_p, rtol=1e-6,
                                   err_msg=f"{proc} start")
        changed = set(np.where(
            np.any(grid != z_p[None, :], axis=0))[0].tolist())
        if proc in moved_cols:
            assert changed == moved_cols[proc], proc
        # unmapped latent dims never move, for every procedure
        assert changed <= set(range(0, 8)), proc
        # final stop: mapped slices at the healthy mean, rest at patient
        for attr, (lo, hi) in regions.items():
            if attr in PROCEDURES2ATTRIBUTES.get(proc, []):
                np.testing.assert_allclose(grid[-1, lo:hi],
                                           mean_h[lo:hi], atol=1e-7)


def test_distance_table_monotone(plan):
    _, _, _, out = plan
    rows = {r["procedure"]: r for r in out["procedure_distances"]}
    assert set(rows) == set(PROCEDURES2ATTRIBUTES)
    for proc, r in rows.items():
        assert r["d3"] >= r["d2"] >= r["d1"] >= r["dm"] >= 0.0, proc
    # genioplasty (4 dims toward health) must end closer than calvarial
    # (no mapped dims: the patient never moves)
    assert rows["genioplasty"]["dm"] < rows["calvarial"]["dm"]
    # the unmapped patient offset dominates calvarial's distances: all
    # four stops equal the patient's own mean-squared distance
    z_p, mean_h = out["z_patient"], out["z_mean_target"]
    d_patient = float(np.mean((z_p - mean_h) ** 2))
    for key in ("d3", "d2", "d1", "dm"):
        np.testing.assert_allclose(rows["calvarial"][key], d_patient,
                                   rtol=1e-5)


def test_patient_inside_one_std_takes_first_point():
    """A patient already inside the 1-std sphere crosses every threshold
    at the walk's first point: all crossings equal the patient latent."""
    mean_h = np.zeros(D, np.float32)
    cov_h = (SIGMA ** 2) * np.eye(D)
    z_p = np.full(D, 0.1, np.float32)     # |z| ~ 0.35 << sigma
    out = plan_to_healthy(z_p, mean_h, cov_h, {}, n_linspace=100)
    for k in (3, 2, 1):
        np.testing.assert_allclose(out[f"z_{k}std"], z_p, rtol=1e-6)


def test_healthy_gaussian_lookup_and_factor_reconstruction():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 1, (40, D)),
                        rng.normal(3, 2, (40, D))]).astype(np.float64)
    y = np.concatenate([np.zeros(40, np.int64), np.ones(40, np.int64)])
    qda = QDAClassifier(reg_param=0.0).fit(x, y)
    mean1, cov1 = healthy_gaussian(qda, 1)
    np.testing.assert_allclose(mean1, x[40:].mean(0), rtol=1e-6)

    # covs=None (migrated store_covariance=False pickles): the Gaussian
    # is reconstructed from the rotation/scaling factorization
    qda._ensure_factors()
    qda.covs = None
    mean1f, cov1f = healthy_gaussian(qda, 1)
    np.testing.assert_allclose(mean1f, mean1, rtol=1e-12)
    np.testing.assert_allclose(cov1f, cov1, rtol=1e-6, atol=1e-8)

    with pytest.raises(ValueError, match="not among"):
        healthy_gaussian(qda, 7)
