"""Deep-ensemble training (training/ensemble.py + tools/train_ensemble.py).

The load-bearing oracle: member i of the vmapped ensemble must reproduce
``ModelManager(config, seed=base_seed+i)``'s scanned training EXACTLY —
same init split, same epoch-key stream, same step-id fold schedule over
the same epoch plans — so "K members in one dispatch" is provably K
independent train.py runs, not an approximation of them.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EPOCHS = 2


def _fresh_iters(config, manager):
    from craniofacialsd_vae_tpu.data.dataset import (DeviceBatchIterator,
                                                     build_datasets)

    train_set, val_set, _, norm, weights = build_datasets(config,
                                                          manager.template)
    manager.set_class_conversions_and_weights(weights)
    bs = manager.batch_size
    return (DeviceBatchIterator(train_set, bs, shuffle=True,
                                class2idx=manager._class2idx_dict),
            DeviceBatchIterator(val_set, bs, shuffle=True,
                                class2idx=manager._class2idx_dict))


@pytest.fixture(scope="module")
def single_runs(cli_workspace):
    """Two single-model scanned trainings with seeds 0 and 1 — the parity
    references for ensemble members 0 and 1."""
    from craniofacialsd_vae_tpu.manager import ModelManager
    from craniofacialsd_vae_tpu.utils import get_config

    root, cfg_path = cli_workspace
    config = get_config(cfg_path)
    runs = []
    for seed in (0, 1):
        mgr = ModelManager(
            config,
            precomputed_storage_path=config["data"]["precomputed_path"],
            seed=seed)
        train_iter, val_iter = _fresh_iters(config, mgr)
        tr_list, va_list = mgr.run_epochs_scanned(train_iter, val_iter,
                                                  N_EPOCHS)
        runs.append({"manager": mgr, "va": va_list})
    return {"config": config, "runs": runs, "root": root,
            "cfg_path": cfg_path}


def test_member_parity_vs_single_runs(single_runs):
    """Ensemble members 0/1 (one vmapped dispatch) == single scanned runs
    with seeds 0/1, parameter-for-parameter and loss-for-loss."""
    import jax
    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.training import LOSS_KEYS
    from craniofacialsd_vae_tpu.training.ensemble import (
        ensemble_epoch_keys, init_ensemble_state,
        make_ensemble_scanned_epochs, member_state, n_members)

    config = single_runs["config"]
    mgr0 = single_runs["runs"][0]["manager"]
    train_iter, val_iter = _fresh_iters(config, mgr0)

    state = init_ensemble_state(mgr0.net_config, mgr0.geometry,
                                mgr0.optimizer, 2, base_seed=0)
    assert n_members(state) == 2
    keys = ensemble_epoch_keys(2, base_seed=0)
    ens_fn = make_ensemble_scanned_epochs(
        mgr0.net_config, mgr0.loss_weights, mgr0.optimizer,
        mgr0.batch_size, swap=mgr0.swap_features,
        clf_optimizer=mgr0.clf_optimizer)

    # plan assembly — manager.run_epochs_scanned's, verbatim
    tr_plans = [train_iter.epoch_plan() for _ in range(N_EPOCHS)]
    va_plans = [val_iter.epoch_plan() for _ in range(N_EPOCHS)]
    tr_idx = np.stack([p[1] for p in tr_plans])
    va_idx = np.stack([p[1] for p in va_plans])
    st, sv = tr_idx.shape[1], va_idx.shape[1]
    per = st + sv
    e_ar = np.arange(N_EPOCHS)[:, None]
    tr_sid = 1 + e_ar * per + np.arange(st)[None]
    va_sid = 1 + e_ar * per + st + np.arange(sv)[None]

    state, tr_m, va_m = ens_fn(
        state, mgr0.geometry, tr_plans[0][0], va_plans[0][0],
        jnp.asarray(tr_idx), jnp.asarray(tr_sid.astype(np.int32)),
        jnp.asarray(va_idx), jnp.asarray(va_sid.astype(np.int32)),
        None, None, mgr0._class_weights, keys)
    va_m = jax.device_get(va_m)

    for i, run in enumerate(single_runs["runs"]):
        member = member_state(state, i)
        ref_params = run["manager"].state.params
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
        flat_mem = dict(jax.tree_util.tree_leaves_with_path(member.params))
        for path, leaf in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat_mem[path]), np.asarray(leaf),
                rtol=2e-5, atol=1e-6,
                err_msg=f"member {i} param {path}")
        for e in range(N_EPOCHS):
            for k in LOSS_KEYS:
                assert float(va_m[k][i][e]) == pytest.approx(
                    run["va"][e][k], rel=1e-4, abs=1e-6), \
                    f"member {i} epoch {e} val {k}"
    # the two members are genuinely different models
    l0 = np.asarray(jax.tree_util.tree_leaves(
        member_state(state, 0).params)[0])
    l1 = np.asarray(jax.tree_util.tree_leaves(
        member_state(state, 1).params)[0])
    assert not np.allclose(l0, l1)


def test_member_state_bounds(single_runs):
    from craniofacialsd_vae_tpu.training.ensemble import (
        init_ensemble_state, member_state)

    mgr0 = single_runs["runs"][0]["manager"]
    state = init_ensemble_state(mgr0.net_config, mgr0.geometry,
                                mgr0.optimizer, 2, base_seed=0)
    with pytest.raises(IndexError):
        member_state(state, 2)
    with pytest.raises(ValueError):
        init_ensemble_state(mgr0.net_config, mgr0.geometry,
                            mgr0.optimizer, 0)


def test_summarize_ensemble_math():
    from craniofacialsd_vae_tpu.analysis.uncertainty import \
        summarize_ensemble

    def rep(label, pa, pc, pn):
        return {"label": label, "posteriors": {"a": pa, "c": pc, "n": pn}}

    # scan 0: members agree on 'c'; scan 1: 1-1 tie 'a'/'n' → alphabetical
    members = [
        [rep("c", 0.1, 0.8, 0.1), rep("a", 0.9, 0.05, 0.05)],
        [rep("c", 0.2, 0.7, 0.1), rep("n", 0.05, 0.05, 0.9)],
    ]
    out = summarize_ensemble(members)
    assert out[0]["label"] == "c"
    assert out[0]["member_agreement"] == 1.0
    assert out[0]["member_votes"] == {"a": 0, "c": 2, "n": 0}
    np.testing.assert_allclose(out[0]["posterior_mean"]["c"], 0.75)
    np.testing.assert_allclose(out[0]["posterior_std"]["c"], 0.05)
    assert out[1]["label"] == "a"            # deterministic tie-break
    assert out[1]["member_agreement"] == 0.5
    assert out[1]["member_votes"] == {"a": 1, "c": 0, "n": 1}
    for row in out:
        assert row["n_members"] == 2
        assert sum(row["posterior_mean"].values()) == pytest.approx(1.0)
        assert row["predictive_entropy_nats"] >= 0.0
    with pytest.raises(ValueError):
        summarize_ensemble([])
    with pytest.raises(ValueError):
        summarize_ensemble([members[0], members[1][:1]])


@pytest.fixture(scope="module")
def ensemble_run(cli_workspace):
    """tools/train_ensemble.py driven once as a real subprocess; shared
    by the artifact assertions and the EnsembleService tests."""
    root, cfg_path = cli_workspace
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "tools/train_ensemble.py", "--config", cfg_path,
         "--id", "cli_ens", "--output_path", str(root), "--members", "2",
         "--epochs", "2", "--chunk_epochs", "2", "--platform", "cpu",
         # member-parallel path: 2 members sharded over 2 virtual devices
         # (parity with the unsharded dispatch is pinned separately in
         # test_member_sharding.py; here the flag runs end-to-end)
         "--shard_members", "--virtual_devices", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, \
        f"train_ensemble.py failed:\n{proc.stdout[-3000:]}" \
        f"\n{proc.stderr[-3000:]}"
    return os.path.join(str(root), "outputs", "cli_ens")


@pytest.mark.slow
def test_train_ensemble_cli(cli_workspace, ensemble_run):
    """tools/train_ensemble.py artifacts: K standard run dirs, each
    servable (DiagnosisService.from_run_dir + diagnose), plus the
    manifest; cross-member consensus via summarize_ensemble."""
    root, cfg_path = cli_workspace
    out_dir = ensemble_run
    with open(os.path.join(out_dir, "ensemble.json")) as f:
        manifest = json.load(f)
    assert [m["dir"] for m in manifest["members"]] == \
        ["member_00", "member_01"]
    assert manifest["seeds"] == [0, 1]

    from craniofacialsd_vae_tpu.analysis.uncertainty import \
        summarize_ensemble
    from craniofacialsd_vae_tpu.serving import DiagnosisService

    with open(cfg_path) as f:
        config = yaml.safe_load(f)
    member_reports = []
    raw = None
    for m in manifest["members"]:
        mdir = os.path.join(out_dir, m["dir"])
        assert os.path.exists(os.path.join(mdir, "config.yaml"))
        assert os.path.exists(os.path.join(mdir, "z_stats.npz"))
        ckpts = os.listdir(os.path.join(mdir, "checkpoints"))
        assert any(c.startswith("model_") for c in ckpts), ckpts
        svc = DiagnosisService.from_run_dir(mdir, max_batch=4)
        if raw is None:
            norm = svc.normalization
            tpl = svc.manager.template.pos
            rng = np.random.default_rng(0)
            raw = np.stack([
                tpl + rng.normal(scale=0.02, size=tpl.shape)
                for _ in range(3)]).astype(np.float32)
        member_reports.append(svc.diagnose(raw))
    # the two members' nets differ (different seeds) but serve the same
    # template geometry/classes
    consensus = summarize_ensemble(member_reports)
    assert len(consensus) == 3
    classes = set(member_reports[0][0]["posteriors"])
    for row in consensus:
        assert row["label"] in classes
        assert sum(row["member_votes"].values()) == 2
    # member params actually differ
    p0 = np.concatenate([np.ravel(v) for v in np.load(
        os.path.join(out_dir, "member_00", "z_stats.npz")).values()])
    p1 = np.concatenate([np.ravel(v) for v in np.load(
        os.path.join(out_dir, "member_01", "z_stats.npz")).values()])
    assert not np.allclose(p0, p1)


def _ensemble_probe_batch(svc, n=3):
    tpl = svc.services[0].manager.template.pos
    rng = np.random.default_rng(0)
    return np.stack([tpl + rng.normal(scale=0.02, size=tpl.shape)
                     for _ in range(n)]).astype(np.float32)


@pytest.mark.slow
def test_ensemble_service(ensemble_run):
    """EnsembleService: consensus == summarize_ensemble over the members'
    own diagnose reports, member blocks attached (latents dropped),
    single-model endpoints refused, per-member posterior sampling rides
    through n_samples."""
    from craniofacialsd_vae_tpu.analysis.uncertainty import \
        summarize_ensemble
    from craniofacialsd_vae_tpu.serving import EnsembleService

    svc = EnsembleService.from_ensemble_dir(ensemble_run, max_batch=4)
    assert svc.n_members == 2
    raw = _ensemble_probe_batch(svc)
    consensus = svc.diagnose(raw)
    member_reports = [s.diagnose(raw) for s in svc.services]
    expected = summarize_ensemble(member_reports)
    assert len(consensus) == 3
    for row, exp in zip(consensus, expected):
        for key in ("label", "member_agreement", "member_votes",
                    "posterior_mean", "posterior_std",
                    "predictive_entropy_nats", "n_members"):
            assert row[key] == exp[key], key
        assert len(row["members"]) == 2
        for block in row["members"]:
            assert "label" in block and "posteriors" in block
            assert "latent" not in block
    # single-mesh convenience shape
    one = svc.diagnose(raw[0])
    assert isinstance(one, dict) and one["label"] == consensus[0]["label"]
    # member-only endpoints refuse with a pointer, never compute
    for name in ("encode", "reconstruct", "saliency", "plan", "fit"):
        with pytest.raises(ValueError, match="single-model"):
            getattr(svc, name)(raw)
    stats = svc.stats()
    assert stats["n_members"] == 2 and stats["requests"] >= 2
    # per-member posterior sampling composes with the consensus
    unc = svc.diagnose(raw[:1], n_samples=4, seed=1)
    assert "uncertainty" in unc[0]["members"][0]
    assert sum(unc[0]["members"][0]["uncertainty"]
               ["sample_votes"].values()) == 4


@pytest.mark.slow
def test_ensemble_service_rejects_non_ensemble_and_mismatch(ensemble_run):
    from craniofacialsd_vae_tpu.serving import (DiagnosisService,
                                                EnsembleService)

    with pytest.raises(FileNotFoundError, match="ensemble.json"):
        EnsembleService.from_ensemble_dir(
            os.path.join(ensemble_run, "member_00"))
    with pytest.raises(ValueError, match="at least one"):
        EnsembleService([])
    svc = DiagnosisService.from_run_dir(
        os.path.join(ensemble_run, "member_00"), max_batch=4)
    same = EnsembleService([svc, svc])          # consistent → accepted
    assert same.n_members == 2


@pytest.mark.slow
def test_serve_cli_ensemble_subprocess(ensemble_run):
    """tools/serve.py on an ensemble dir: auto-detects ensemble.json,
    answers /healthz (n_members) and consensus /diagnose, and 400s a
    single-model endpoint with the member-dir pointer."""
    import urllib.error
    import urllib.request

    proc = subprocess.Popen(
        [sys.executable, "tools/serve.py", "--run_dir", ensemble_run,
         "--platform", "cpu", "--port", "0", "--max_batch", "4"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
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
        assert h["ok"] and h["n_members"] == 2

        from craniofacialsd_vae_tpu.serving import EnsembleService
        svc = EnsembleService.from_ensemble_dir(ensemble_run, max_batch=4)
        raw = _ensemble_probe_batch(svc, n=1)
        body = json.dumps({"vertices": raw[0].tolist()}).encode()
        req = urllib.request.Request(
            url + "/diagnose", data=body,
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        rep = out["reports"]
        assert rep["n_members"] == 2 and len(rep["members"]) == 2
        assert rep["label"] == svc.diagnose(raw[0])["label"]

        req = urllib.request.Request(
            url + "/encode", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=60)
        assert err.value.code == 400
        assert "single-model" in err.value.read().decode()
    finally:
        proc.terminate()
        proc.wait(timeout=30)
