"""Hyperparameter sweeps (training/sweep.py + tools/sweep.py).

The load-bearing oracle: variant i of the vmapped sweep must reproduce a
solo scanned run configured with variant i's hyperparameters,
parameter-for-parameter — including a variant whose 0.0 loss weight the
solo build skips STRUCTURALLY while the shared sweep program computes it
(trainer._structurally_active: a 0-weighted term contributes exactly-zero
loss and gradient), and a variant whose weight_decay > 0 exercises the
coupled-Adam chain with traced hyperparameters.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = {
    "data": {"swap_features": True},
    "optimization": {
        "lr": 1e-3, "weight_decay": 0.0, "kl_weight": 1e-4,
        "laplacian_weight": 0.1, "latent_consistency_weight": 0.5,
        "latent_consistency_eta1": 0.5, "latent_consistency_eta2": 0.5,
    },
}
OVERRIDES = [
    {},                                                      # base
    {"lr": 3e-3, "weight_decay": 1e-3, "kl_weight": 1e-3},   # coupled decay
    {"laplacian_weight": 0.0, "latent_consistency_eta1": 0.2},  # 0-weight
]
N_EPOCHS, ST, SV, B = 2, 3, 1, 2


@pytest.fixture(scope="module")
def sweep_setup():
    """Tiny geometry + a 3-variant sweep trained in one dispatch, plus
    the shared epoch plan every solo comparison replays."""
    import jax
    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.geometry import precompute_geometry
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template
    from craniofacialsd_vae_tpu.models import SDVAEConfig, SpiralGeometry
    from craniofacialsd_vae_tpu.training.sweep import (
        build_variants, init_sweep_state, make_sweep_scanned_epochs,
        stack_hyperparams)

    tpl = synthetic_template(subdivisions=2, n_regions=3)
    bundle = precompute_geometry(tpl, [2, 2], [5, 5], [1, 1])
    geom = SpiralGeometry.from_bundle(bundle)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    assert config.is_vae

    variants = build_variants(BASE, OVERRIDES)
    hp = stack_hyperparams(variants)
    state = init_sweep_state(config, geom, len(variants), seed=0)
    fn = make_sweep_scanned_epochs(config, batch_size=B, swap=True)

    n = tpl.num_vertices
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(8, n, 3)).astype(np.float32))
    tr_idx = jnp.asarray(rng.integers(0, 8, size=(N_EPOCHS, ST, B))
                         .astype(np.int32))
    va_idx = jnp.asarray(rng.integers(0, 8, size=(N_EPOCHS, SV, B))
                         .astype(np.int32))
    per = ST + SV
    e_ar = np.arange(N_EPOCHS)[:, None]
    tr_sid = jnp.asarray((1 + e_ar * per + np.arange(ST)[None])
                         .astype(np.int32))
    va_sid = jnp.asarray((1 + e_ar * per + ST + np.arange(SV)[None])
                         .astype(np.int32))
    key = jax.random.PRNGKey(1)
    plan = (geom, data, tr_idx, tr_sid, va_idx, va_sid, key)

    state, tr_m, va_m = fn(state, hp, geom, data, data, tr_idx, tr_sid,
                           va_idx, va_sid, None, None, None, key)
    va_m = jax.device_get(va_m)
    return {"config": config, "variants": variants, "state": state,
            "va_m": va_m, "plan": plan}


def _solo_run(setup, i):
    """A solo scanned run configured exactly as variant i (ModelManager's
    seed/optimizer contract: split(PRNGKey(0)) init, coupled_adam)."""
    import jax

    from craniofacialsd_vae_tpu.models import init_sdvae
    from craniofacialsd_vae_tpu.training import (LossWeights, coupled_adam,
                                                 create_train_state,
                                                 make_scanned_train_epochs)

    o = setup["variants"][i]["optimization"]
    opt = coupled_adam(o["lr"], o["weight_decay"])
    k_net, _ = jax.random.split(jax.random.PRNGKey(0))
    params = init_sdvae(k_net, setup["config"], setup["plan"][0])
    st = create_train_state(params, opt)
    solo_fn = make_scanned_train_epochs(setup["config"],
                                        LossWeights.from_config(o), opt, B,
                                        swap=True)
    geom, data, tr_idx, tr_sid, va_idx, va_sid, key = setup["plan"]
    st, _, va = solo_fn(st, geom, data, data, tr_idx, tr_sid, va_idx,
                        va_sid, None, None, None, key)
    return st, jax.device_get(va), o


@pytest.mark.parametrize("i", [1, 2])
def test_variant_matches_solo_run(sweep_setup, i):
    """Variant i of the one-dispatch sweep == a solo scanned run with
    variant i's hyperparameters (params + weighted metrics). i=1 covers
    weight_decay > 0 (coupled chain), i=2 covers a 0.0 loss weight the
    solo build skips structurally."""
    import jax

    from craniofacialsd_vae_tpu.training.sweep import variant_state

    st, va, o = _solo_run(sweep_setup, i)
    vs = variant_state(sweep_setup["state"], i, o["weight_decay"])
    flat_solo = jax.tree_util.tree_leaves_with_path(st.params)
    flat_var = dict(jax.tree_util.tree_leaves_with_path(vs.params))
    for path, leaf in flat_solo:
        np.testing.assert_allclose(
            np.asarray(flat_var[path]), np.asarray(leaf),
            rtol=2e-5, atol=1e-6, err_msg=f"variant {i} param {path}")
    # opt_state converts to the structure the variant's own config builds
    assert jax.tree_util.tree_structure(vs.opt_state) == \
        jax.tree_util.tree_structure(st.opt_state)
    # weighted metrics agree; the 0-weighted laplacian metric is the one
    # documented difference (solo reports 0.0, sweep the unweighted value)
    for k in ("tot", "reconstruction", "kl"):
        for e in range(N_EPOCHS):
            assert float(sweep_setup["va_m"][k][i][e]) == pytest.approx(
                float(va[k][e]), rel=1e-4, abs=1e-6), f"v{i} {k} ep{e}"
    if o["laplacian_weight"] == 0.0:
        assert float(va["laplacian"][-1]) == 0.0
        assert float(sweep_setup["va_m"]["laplacian"][i][-1]) > 0.0
    # variants genuinely differ from each other
    l0 = np.asarray(jax.tree_util.tree_leaves(
        variant_state(sweep_setup["state"], 0).params)[0])
    li = np.asarray(jax.tree_util.tree_leaves(vs.params)[0])
    assert not np.allclose(l0, li)


def test_build_variants_validation():
    from craniofacialsd_vae_tpu.training.sweep import (build_variants,
                                                       stack_hyperparams)

    with pytest.raises(ValueError, match="at least one"):
        build_variants(BASE, [])
    with pytest.raises(ValueError, match="non-sweepable"):
        build_variants(BASE, [{"batch_size": 8}])
    # VAE head cannot appear mid-sweep over an AE base
    ae = {"data": {"swap_features": True},
          "optimization": dict(BASE["optimization"], kl_weight=0.0)}
    with pytest.raises(ValueError, match="AE"):
        build_variants(ae, [{"kl_weight": 1e-4}])
    # ... and a VAE base cannot sweep kl to 0: the variant would train
    # with the logvar head but its config snapshot would rebuild an AE
    with pytest.raises(ValueError, match="VAE base"):
        build_variants(BASE, [{"kl_weight": 0.0}])
    # latent consistency needs the swap grid
    noswap = {"data": {"swap_features": False},
              "optimization": dict(BASE["optimization"],
                                   latent_consistency_weight=0.0)}
    with pytest.raises(ValueError, match="swap_features"):
        build_variants(noswap, [{"latent_consistency_weight": 0.5}])
    # hyperparameter stacking carries each variant's own values
    hp = stack_hyperparams(build_variants(BASE, OVERRIDES))
    np.testing.assert_allclose(np.asarray(hp["lr"]), [1e-3, 3e-3, 1e-3])
    np.testing.assert_allclose(np.asarray(hp["weights"].laplacian),
                               [0.1, 0.1, 0.0])
    np.testing.assert_allclose(np.asarray(hp["weights"].eta1),
                               [0.5, 0.5, 0.2])


def test_parse_vary():
    """CLI grid parsing: product of axes, duplicate-key rejection (a
    silently-collapsed duplicate would train the wrong grid), numeric
    validation."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sweep_cli", os.path.join(REPO, "tools", "sweep.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    grid = cli.parse_vary(["lr=1e-4,3e-4", "optimization.kl_weight=0,1"])
    assert len(grid) == 4
    assert {tuple(sorted(g.items())) for g in grid} == \
        {(("kl_weight", 0.0), ("lr", 1e-4)),
         (("kl_weight", 0.0), ("lr", 3e-4)),
         (("kl_weight", 1.0), ("lr", 1e-4)),
         (("kl_weight", 1.0), ("lr", 3e-4))}
    with pytest.raises(SystemExit, match="given twice"):
        cli.parse_vary(["lr=1e-4", "lr=3e-4"])
    with pytest.raises(SystemExit, match="non-numeric"):
        cli.parse_vary(["lr=fast"])
    with pytest.raises(SystemExit, match="key=v1"):
        cli.parse_vary(["lr"])
    with pytest.raises(SystemExit, match="at least one"):
        cli.parse_vary([])


def test_state_bounds(sweep_setup):
    from craniofacialsd_vae_tpu.training.sweep import (init_sweep_state,
                                                       n_variants,
                                                       variant_state)

    assert n_variants(sweep_setup["state"]) == 3
    with pytest.raises(IndexError):
        variant_state(sweep_setup["state"], 3)
    with pytest.raises(ValueError):
        init_sweep_state(sweep_setup["config"], sweep_setup["plan"][0], 0)


@pytest.mark.slow
def test_sweep_cli(cli_workspace):
    """tools/sweep.py end-to-end: grid of 2 lr values → 2 standard run
    dirs whose config.yaml snapshots carry the overridden values, each
    servable, plus sweep.json ranking by validation reconstruction."""
    root, cfg_path = cli_workspace
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "tools/sweep.py", "--config", cfg_path,
         "--id", "cli_sweep", "--output_path", str(root),
         "--vary", "lr=1e-3,3e-3", "--vary", "weight_decay=0,1e-3",
         # DEFAULT unsharded dispatch — the path a single-device user
         # runs. The sharded CLI flow is covered end-to-end by
         # test_ensemble.py (--shard_members there), so between the two
         # tools both code paths get a real subprocess e2e (ADVICE r3).
         "--epochs", "2", "--chunk_epochs", "2", "--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, \
        f"sweep.py failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    out_dir = os.path.join(str(root), "outputs", "cli_sweep")
    with open(os.path.join(out_dir, "sweep.json")) as f:
        manifest = json.load(f)
    assert len(manifest["variants"]) == 4          # 2×2 grid
    assert manifest["select"] == "reconstruction"
    best = manifest["best"]
    vals = [v["val"]["reconstruction"] for v in manifest["variants"]]
    assert vals == sorted(vals), "manifest must list variants ranked"
    assert best["val"]["reconstruction"] == min(vals)

    from craniofacialsd_vae_tpu.serving import DiagnosisService
    from craniofacialsd_vae_tpu.utils import get_config

    seen = set()
    for v in manifest["variants"]:
        vdir = os.path.join(out_dir, v["dir"])
        cfg = get_config(os.path.join(vdir, "config.yaml"))
        # the snapshot carries THIS variant's hyperparameters
        assert cfg["optimization"]["lr"] == v["overrides"]["lr"]
        assert cfg["optimization"]["weight_decay"] == \
            v["overrides"]["weight_decay"]
        seen.add((cfg["optimization"]["lr"],
                  cfg["optimization"]["weight_decay"]))
        assert any(c.startswith("model_") for c in
                   os.listdir(os.path.join(vdir, "checkpoints")))
    assert len(seen) == 4
    # a variant run dir is a standard run dir: it serves
    svc = DiagnosisService.from_run_dir(
        os.path.join(out_dir, best["dir"]), max_batch=4)
    tpl = svc.manager.template.pos
    rep = svc.diagnose(np.asarray(tpl, np.float32))
    assert "label" in rep and "posteriors" in rep
