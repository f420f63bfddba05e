"""The CLI entry points driven as real subprocesses (CPU platform).

train.py: the full main() wiring — config load, dataset build,
scanned-epoch training, the in-training eval cadence (image grids +
latent traversals at save_weights), checkpointing, classifier fitting,
latent-stats caching — on a tiny synthetic dataset. A second variant
exercises --data_parallel over virtual devices through the same CLI (the
shard_map'd scanned-epoch path end-to-end).

test.py: the evaluation CLI against the trained smoke run — the standard
suite (checkpoint resume, classifier reload, eval_metrics.json) plus the
interpolate experiment (reference test.py:544-567 semantics).

visualize_in_batch.py: the swap-visualization utility end-to-end.

The round-3 review found bugs precisely in this wiring (mid-training
stats caching, multihost eval gating) that no unit test could see —
the entry-point main() functions had zero test coverage.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess e2e (~4 min)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# cli_workspace (synthetic dataset + 2-level config) lives in conftest.py,
# shared with the migration e2e in test_torch_import.py


def _run_cli(root, cfg_path, run_id, extra_args=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # the CLI provisions its own devices
    proc = subprocess.run(
        [sys.executable, "train.py", "--config", cfg_path,
         "--id", run_id, "--output_path", str(root),
         "--platform", "cpu", *extra_args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, \
        f"train.py failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    return proc, os.path.join(str(root), "outputs", run_id)


def _assert_artifacts(out_dir):
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))
    ckpts = os.listdir(os.path.join(out_dir, "checkpoints"))
    assert any(c.startswith("model_") for c in ckpts), ckpts
    assert any(c.startswith("classifier") or "qda" in c or "lda" in c
               for c in ckpts) or len(ckpts) >= 2
    # in-training cadence: traversal artifacts with the epoch suffix
    arts = os.listdir(out_dir)
    assert any(a.startswith("latent_exploration") and "2" in a
               for a in arts), arts
    # end-of-training latent stats cached for the evaluation suite
    assert os.path.exists(os.path.join(out_dir, "z_stats.npz"))
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))


@pytest.fixture(scope="module")
def smoke_run(cli_workspace):
    """One trained run shared by the single-chip assertion and the eval-CLI
    tests (training it once keeps the module's subprocess budget sane)."""
    root, cfg_path = cli_workspace
    return _run_cli(root, cfg_path, "cli_smoke")


def test_train_cli_single_chip(smoke_run):
    proc, out_dir = smoke_run
    _assert_artifacts(out_dir)
    assert "validation accuracy" in proc.stdout


def _run_eval_cli(root, run_id, experiment, extra_args=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "test.py", "--id", run_id,
         "--output_path", str(root), "--experiment", experiment,
         "--platform", "cpu", *extra_args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, \
        f"test.py {experiment} failed:\n{proc.stdout[-3000:]}\n" \
        f"{proc.stderr[-3000:]}"
    return proc, os.path.join(str(root), "outputs", run_id)


def test_eval_cli_standard(cli_workspace, smoke_run):
    """test.py --experiment=standard through the real CLI: config-snapshot
    load, checkpoint + classifier resume, full quantitative suite,
    eval_metrics.json on disk and the metrics JSON on stdout."""
    root, _ = cli_workspace
    proc, out_dir = _run_eval_cli(root, "cli_smoke", "standard")
    import json
    with open(os.path.join(out_dir, "eval_metrics.json")) as f:
        metrics = json.load(f)
    assert "recon_errors" in metrics and "diversity" in metrics, metrics
    assert "recon_errors" in proc.stdout
    # the suite's figure/render artifacts landed next to the metrics
    arts = os.listdir(out_dir)
    assert any(a.startswith("latent_exploration") for a in arts), arts


def test_eval_cli_interpolate(cli_workspace, smoke_run):
    root, _ = cli_workspace
    proc, out_dir = _run_eval_cli(root, "cli_smoke", "interpolate")
    assert "interpolations written" in proc.stdout
    # reference test.py:544-637 artifact set
    assert os.path.exists(os.path.join(out_dir,
                                       "interpolate_per_feature.png"))


def test_eval_cli_refit_classifiers(cli_workspace, smoke_run):
    """test.py --experiment=refit_classifiers through the real CLI — the
    path that regenerated the round-5 hard-benchmark record after the
    Ledoit-Wolf QDA change: refits the zoo from the resumed model's
    latents, PERSISTS it (classifiers.npz rewritten), and regenerates
    accuracies.json."""
    import json

    root, _ = cli_workspace
    out_dir = os.path.join(str(root), "outputs", "cli_smoke")
    npz = os.path.join(out_dir, "checkpoints", "classifiers.npz")
    before = os.path.getmtime(npz)
    proc, out_dir = _run_eval_cli(root, "cli_smoke", "refit_classifiers")
    assert os.path.getmtime(npz) > before, \
        "refit did not persist the classifier zoo"
    assert "validation accuracy" in proc.stdout
    with open(os.path.join(out_dir, "accuracies.json")) as f:
        accs = json.load(f)
    assert set(accs) >= {"accuracy_mlp", "accuracy_svm",
                         "accuracy_lda", "accuracy_qda"}, accs
    for v in accs.values():
        assert 0.0 <= v <= 1.0


def test_eval_cli_saliency(cli_workspace, smoke_run):
    """test.py --experiment=saliency through the real CLI: per-mesh
    attribution JSON on stdout and the colormap artifacts on disk."""
    import json

    root, _ = cli_workspace
    proc, out_dir = _run_eval_cli(root, "cli_smoke", "saliency")
    assert "saliency PLYs/renders written" in proc.stdout
    sal_dir = os.path.join(out_dir, "saliency")
    with open(os.path.join(sal_dir, "report.json")) as f:
        reports = json.load(f)
    assert reports and all("regions" in r and "label" in r
                           for r in reports)
    assert os.path.exists(os.path.join(sal_dir, "0_saliency.ply"))
    assert os.path.exists(os.path.join(sal_dir, "saliency_maps.png"))


def test_visualize_in_batch_cli(cli_workspace):
    """visualize_in_batch.py end-to-end on the synthetic template: 16
    swapped colored PLYs (one per swap-grid cell)."""
    root, _ = cli_workspace
    tpl_path = str(root / "template.ply")
    out = str(root / "swap_viz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "visualize_in_batch.py", "--template", tpl_path,
         "--out", out, "--region", "1", "--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, \
        f"visualize_in_batch.py failed:\n{proc.stdout[-2000:]}\n" \
        f"{proc.stderr[-2000:]}"
    plys = [f for f in os.listdir(out) if f.endswith(".ply")]
    assert len(plys) == 16, plys


def test_train_cli_mixed_policy(cli_workspace):
    """The shipped flagship activation policy through the real CLI:
    compute_dtype: mixed (level-0 fp32 / deep bf16, incl. the out-gather
    final conv — the craniofacial.yaml default) trains end-to-end and the
    quantitative eval suite runs against its checkpoint. The other CLI
    tests keep fp32 so the migration e2e's torch parity stays exact."""
    import json

    import yaml

    root, cfg_path = cli_workspace
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["compute_dtype"] = "mixed"
    mixed_path = str(root / "cli_mixed.yaml")
    with open(mixed_path, "w") as f:
        yaml.safe_dump(cfg, f)
    _, out_dir = _run_cli(root, mixed_path, "cli_mixed")
    _assert_artifacts(out_dir)
    proc, _ = _run_eval_cli(root, "cli_mixed", "recon")
    metrics = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert np.isfinite(metrics["mean"]) and metrics["mean"] > 0, metrics


def test_train_cli_data_parallel(cli_workspace):
    """--data_parallel over 2 virtual CPU devices: the shard_map'd
    scanned-epoch path through the real CLI (global batch 4 = 2 dev × 2,
    sharded index plans, psum'd gradients)."""
    root, cfg_path = cli_workspace
    proc, out_dir = _run_cli(
        root, cfg_path, "cli_dp",
        extra_args=("--data_parallel", "--virtual_devices", "2"))
    _assert_artifacts(out_dir)
    assert "validation accuracy" in proc.stdout
