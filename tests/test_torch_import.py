"""Reference torch-checkpoint interop (training/torch_import.py).

The oracle is a torch module tree replicating the reference's exact
module/state-dict naming and forward semantics (reference model.py:11-182:
SpiralConv as index_select + nn.Linear, Enblock conv→ELU→pool, Deblock
pool→conv→ELU, the mu/logvar Linear-ordering quirk under is_vae). A
random reference checkpoint imported into our param tree must produce the
same forward outputs, and export→import must round-trip bit-for-bit."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess/e2e migration (~2 min)

torch = pytest.importorskip("torch")

from tests.test_training import _tiny_geometry  # noqa: E402


class _SpiralConvT(torch.nn.Module):
    def __init__(self, cin, cout, idx):
        super().__init__()
        # plain attribute, like the reference (model.py:18) — buffers would
        # leak 'indices' keys into the state dict
        self.indices = torch.tensor(np.asarray(idx), dtype=torch.long)
        self.layer = torch.nn.Linear(cin * idx.shape[1], cout)

    def forward(self, x):
        bs, n = x.size(0), self.indices.size(0)
        g = torch.index_select(x, 1, self.indices.view(-1)).view(bs, n, -1)
        return self.layer(g)


class _BlockT(torch.nn.Module):
    """SpiralEnblock/SpiralDeblock both expose the conv as `.conv`."""

    def __init__(self, cin, cout, idx):
        super().__init__()
        self.conv = _SpiralConvT(cin, cout, idx)


class _RefModel(torch.nn.Module):
    """State-dict-compatible stand-in for the reference Model
    (model.py:88-182)."""

    def __init__(self, bundle, config):
        super().__init__()
        chans = [config.in_channels] + list(config.out_channels)
        L = len(config.out_channels)
        self.is_vae = config.is_vae
        self.downs = [torch.tensor(d.to_dense(), dtype=torch.float32)
                      for d in bundle.down_transforms]
        self.ups = [torch.tensor(u.to_dense(), dtype=torch.float32)
                    for u in bundle.up_transforms]
        sp = bundle.spirals
        self.num_vert = self.downs[-1].shape[0]
        flat = self.num_vert * chans[-1]

        self.en_layers = torch.nn.ModuleList(
            [_BlockT(chans[i], chans[i + 1], sp[i]) for i in range(L)])
        self.en_layers.append(torch.nn.Linear(flat, config.latent_size))
        if self.is_vae:
            self.en_layers.append(torch.nn.Linear(flat, config.latent_size))

        oc = config.out_channels
        self.de_layers = torch.nn.ModuleList(
            [torch.nn.Linear(config.latent_size, flat)])
        for idx in range(L):
            cin = oc[-idx - 1] if idx == 0 else oc[-idx]
            self.de_layers.append(_BlockT(cin, oc[-idx - 1], sp[-idx - 1]))
        self.de_layers.append(
            _SpiralConvT(oc[0], config.in_channels, sp[0]))

    def forward(self, x):                     # [B, N, 3], eval: z = mu
        L = len(self.downs)
        h = x
        for i in range(L):
            h = torch.nn.functional.elu(self.en_layers[i].conv(h))
            h = torch.matmul(self.downs[i], h)
        hflat = h.reshape(x.size(0), -1)
        # reference model.py:152-158: en_layers[-1] is mu in BOTH modes
        # (under is_vae the first-appended Linear ends up as logvar)
        mu = self.en_layers[-1](hflat)
        logvar = self.en_layers[-2](hflat) if self.is_vae else None
        z = mu
        h = self.de_layers[0](z).view(x.size(0), self.num_vert, -1)
        for i in range(1, L + 1):
            h = torch.matmul(self.ups[L - i], h)
            h = torch.nn.functional.elu(self.de_layers[i].conv(h))
        out = self.de_layers[-1](h)
        return out, mu, logvar


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(3)
    geom, bundle = _tiny_geometry(rng, return_bundle=True)
    return geom, bundle, rng


@pytest.mark.parametrize("is_vae", [True, False])
def test_import_forward_parity(tiny, tmp_path, is_vae):
    """torch.save a random reference-named checkpoint, import it, and
    assert the JAX forward matches the torch forward."""
    from craniofacialsd_vae_tpu.models import SDVAEConfig, forward
    from craniofacialsd_vae_tpu.training import import_reference_checkpoint

    geom, bundle, rng = tiny
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6, is_vae=is_vae)
    torch.manual_seed(7 + is_vae)
    ref = _RefModel(bundle, config)
    path = str(tmp_path / "model_00000600.pt")
    torch.save({"model": ref.state_dict()}, path)

    params = import_reference_checkpoint(path, config)

    n = geom.region_masks.shape[1]
    x = rng.normal(size=(4, n, 3)).astype(np.float32)
    with torch.no_grad():
        t_out, t_mu, t_logvar = ref(torch.tensor(x))
    x_vm = jnp.asarray(np.transpose(x, (1, 0, 2)))       # vertex-major
    out, z, mu, logvar = forward(params, geom, config, x_vm)

    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(),
                               rtol=1e-5, atol=1e-5)
    if is_vae:
        np.testing.assert_allclose(np.asarray(logvar), t_logvar.numpy(),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (1, 0, 2)),
                               t_out.numpy(), rtol=1e-5, atol=1e-5)


def test_export_import_roundtrip(tiny, tmp_path):
    """export_reference_checkpoint → import_reference_checkpoint is the
    identity on every leaf, and the exported file loads into the torch
    oracle via load_state_dict (strict)."""
    from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
    from craniofacialsd_vae_tpu.training import (export_reference_checkpoint,
                                                 import_reference_checkpoint)

    geom, bundle, _ = tiny
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    path = str(tmp_path / "exported.pt")
    export_reference_checkpoint(params, config, path)

    ref = _RefModel(bundle, config)
    sd = torch.load(path, map_location="cpu", weights_only=True)["model"]
    ref.load_state_dict(sd, strict=True)

    back = import_reference_checkpoint(path, config)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(back),
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_rejects_architecture_mismatch(tiny, tmp_path):
    from craniofacialsd_vae_tpu.models import SDVAEConfig
    from craniofacialsd_vae_tpu.training import import_reference_checkpoint

    _, bundle, _ = tiny
    ae_cfg = SDVAEConfig(out_channels=(8, 16), latent_size=6, is_vae=False)
    vae_cfg = SDVAEConfig(out_channels=(8, 16), latent_size=6, is_vae=True)
    torch.manual_seed(0)
    path = str(tmp_path / "ae.pt")
    torch.save({"model": _RefModel(bundle, ae_cfg).state_dict()}, path)
    # an AE checkpoint has no second latent Linear → VAE import must fail
    with pytest.raises(KeyError):
        import_reference_checkpoint(path, vae_cfg)
    # and a VAE checkpoint has an extra Linear the AE config can't consume
    path2 = str(tmp_path / "vae.pt")
    torch.save({"model": _RefModel(bundle, vae_cfg).state_dict()}, path2)
    with pytest.raises(ValueError):
        import_reference_checkpoint(path2, ae_cfg)


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_import_optimizer_continuation(tiny, tmp_path, weight_decay):
    """Exact mid-training continuation: pre-train the torch oracle 3 Adam
    steps, convert model+optimizer, take ONE more step on each side with
    the identical loss — the updated parameters must match. This only
    passes if exp_avg/exp_avg_sq landed on the right leaves with the right
    transposes AND the coupled-L2 semantics line up."""
    from craniofacialsd_vae_tpu.models import SDVAEConfig, forward
    from craniofacialsd_vae_tpu.training import (coupled_adam,
                                                 import_reference_checkpoint,
                                                 import_reference_optimizer)
    import optax

    geom, bundle, rng = tiny
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6, is_vae=True)
    torch.manual_seed(21)
    ref = _RefModel(bundle, config)
    n = geom.region_masks.shape[1]
    x = rng.normal(size=(4, n, 3)).astype(np.float32)
    target = rng.normal(size=(4, n, 3)).astype(np.float32)
    xt, tt = torch.tensor(x), torch.tensor(target)

    def torch_loss():
        out, mu, logvar = ref(xt)
        # recon + a small KL so every parameter (incl. the logvar head)
        # receives a gradient, like real reference training
        return torch.mean((out - tt) ** 2) - 1e-4 * 0.5 * torch.mean(
            1 + logvar - mu ** 2 - logvar.exp())

    opt = torch.optim.Adam(ref.parameters(), lr=1e-2,
                           weight_decay=weight_decay)
    for _ in range(3):
        opt.zero_grad()
        torch_loss().backward()
        opt.step()

    model_path = str(tmp_path / "model_00000003.pt")
    torch.save({"model": ref.state_dict()}, model_path)
    opt_path = str(tmp_path / "optimizer.pt")
    torch.save({"optimizer": opt.state_dict()}, opt_path)

    opt.zero_grad()
    torch_loss().backward()
    opt.step()
    after = {k: v.detach().numpy().copy()
             for k, v in ref.state_dict().items()}

    params = import_reference_checkpoint(model_path, config)
    optimizer = coupled_adam(1e-2, weight_decay)
    opt_state = import_reference_optimizer(opt_path, params, config,
                                           optimizer)
    x_vm = jnp.asarray(np.transpose(x, (1, 0, 2)))
    t_vm = jnp.asarray(np.transpose(target, (1, 0, 2)))

    def loss_fn(p):
        out, z, mu, logvar = forward(p, geom, config, x_vm)
        return jnp.mean((out - t_vm) ** 2) - 1e-4 * 0.5 * jnp.mean(
            1 + logvar - mu ** 2 - jnp.exp(logvar))

    grads = jax.grad(loss_fn)(params)
    updates, _ = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    def check(prefix, leaf):
        np.testing.assert_allclose(
            np.asarray(leaf["w"]), after[prefix + ".weight"].T,
            rtol=2e-4, atol=2e-6, err_msg=prefix)
        np.testing.assert_allclose(
            np.asarray(leaf["b"]), after[prefix + ".bias"],
            rtol=2e-4, atol=2e-6, err_msg=prefix)

    L = len(config.out_channels)
    for i in range(L):
        check(f"en_layers.{i}.conv.layer", new_params["en_convs"][i])
    check(f"en_layers.{L}", new_params["logvar"])
    check(f"en_layers.{L + 1}", new_params["mu"])
    check("de_layers.0", new_params["de_dense"])
    for j in range(L):
        check(f"de_layers.{j + 1}.conv.layer", new_params["de_convs"][j])
    check(f"de_layers.{L + 1}.layer", new_params["final_conv"])


def test_export_optimizer_roundtrip(tiny, tmp_path):
    """export_reference_optimizer inverts import_reference_optimizer: a
    torch Adam state survives torch → ours → torch bit-for-bit and loads
    into a live torch.optim.Adam that can step."""
    from craniofacialsd_vae_tpu.models import SDVAEConfig
    from craniofacialsd_vae_tpu.training import (coupled_adam,
                                                 export_reference_optimizer,
                                                 import_reference_checkpoint,
                                                 import_reference_optimizer)

    geom, bundle, rng = tiny
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6, is_vae=True)
    torch.manual_seed(31)
    ref = _RefModel(bundle, config)
    n = geom.region_masks.shape[1]
    xt = torch.tensor(rng.normal(size=(3, n, 3)).astype(np.float32))
    opt = torch.optim.Adam(ref.parameters(), lr=5e-3, weight_decay=0.02)
    for _ in range(2):
        opt.zero_grad()
        out, mu, logvar = ref(xt)
        (out.square().mean() - 1e-4 * 0.5 * torch.mean(
            1 + logvar - mu ** 2 - logvar.exp())).backward()
        opt.step()

    model_path = str(tmp_path / "model_00000002.pt")
    torch.save({"model": ref.state_dict()}, model_path)
    opt_path = str(tmp_path / "optimizer.pt")
    torch.save({"optimizer": opt.state_dict()}, opt_path)

    params = import_reference_checkpoint(model_path, config)
    optimizer = coupled_adam(5e-3, 0.02)
    state = import_reference_optimizer(opt_path, params, config, optimizer)
    back_path = str(tmp_path / "optimizer_back.pt")
    export_reference_optimizer(state, config, back_path,
                               lr=5e-3, weight_decay=0.02)

    orig = opt.state_dict()
    back = torch.load(back_path, map_location="cpu",
                      weights_only=True)["optimizer"]
    assert sorted(int(k) for k in orig["state"]) == sorted(back["state"])
    for k in orig["state"]:
        for f in ("exp_avg", "exp_avg_sq"):
            np.testing.assert_array_equal(
                orig["state"][k][f].numpy(), back["state"][int(k)][f].numpy())
        assert int(orig["state"][k]["step"]) == int(back["state"][int(k)]
                                                    ["step"])
    # and a live torch Adam accepts it and steps
    opt2 = torch.optim.Adam(ref.parameters(), lr=5e-3, weight_decay=0.02)
    opt2.load_state_dict(back)
    opt2.zero_grad()
    out, mu, logvar = ref(xt)
    out.square().mean().backward()
    opt2.step()


def test_import_reference_mlp(tmp_path):
    """Reference MLPClassifier state dict (Sequential Linear/ReLU pairs,
    reference model.py:191-203) → our head; logits and labels match."""
    from craniofacialsd_vae_tpu.models.mlp import mlp_apply
    from craniofacialsd_vae_tpu.training import import_reference_mlp

    torch.manual_seed(11)
    feats = [6, 8, 4]
    seq = []
    for i in range(1, len(feats)):
        seq += [torch.nn.Linear(feats[i - 1], feats[i]), torch.nn.ReLU()]
    ref = torch.nn.Module()
    ref.model = torch.nn.Sequential(*seq)
    path = str(tmp_path / "classifier_mlp.pt")
    torch.save({"model": ref.state_dict()}, path)

    layers = import_reference_mlp(path)
    x = np.random.default_rng(0).normal(size=(5, 6)).astype(np.float32)
    with torch.no_grad():
        t_logits = ref.model(torch.tensor(x))
    logits, labels = mlp_apply(layers, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               rtol=1e-5, atol=1e-6)
    t_labels = torch.max(torch.log_softmax(t_logits, dim=1), dim=1)[1]
    np.testing.assert_array_equal(np.asarray(labels), t_labels.numpy())


def test_full_reference_run_migration(cli_workspace, tmp_path):
    """Capstone migration e2e: simulate a COMPLETE reference run — trained
    torch net, sklearn classifier pickles, z_stats.pkl, config snapshot —
    convert the net with the CLI, drop everything into an outputs/<id> dir,
    and run our evaluation CLI over it. Exercises the converter, the
    manager's sklearn-pickle classifier fallback, and test.py end-to-end
    on reference-made artifacts."""
    import json
    import pickle
    import shutil
    import subprocess
    import sys

    from sklearn.discriminant_analysis import (
        LinearDiscriminantAnalysis, QuadraticDiscriminantAnalysis)

    from craniofacialsd_vae_tpu.geometry import (load_template,
                                                 precompute_geometry)
    from craniofacialsd_vae_tpu.models import SDVAEConfig

    root, cfg_path = cli_workspace
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # the "reference side": a trained net on the SAME template/hierarchy
    tpl = load_template(str(root / "template.ply"))
    bundle = precompute_geometry(tpl, [2, 2], [5, 5], [1, 1])
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6, is_vae=True)
    torch.manual_seed(13)
    ref = _RefModel(bundle, config)
    torch_path = str(tmp_path / "model_00000002.pt")
    torch.save({"model": ref.state_dict()}, torch_path)
    # one torch step so the saved Adam state has real moments
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    out, mu, logvar = ref(torch.zeros(2, tpl.num_vertices, 3))
    (out.square().mean() - 1e-4 * 0.5 * torch.mean(
        1 + logvar - mu ** 2 - logvar.exp())).backward()
    opt.step()
    opt_path = str(tmp_path / "optimizer.pt")
    torch.save({"optimizer": opt.state_dict()}, opt_path)
    torch.save({"model": ref.state_dict()}, torch_path)

    run_dir = root / "outputs" / "migrated"
    ckpt_dir = str(run_dir / "checkpoints")
    run = subprocess.run(
        [sys.executable, "tools/convert_torch_checkpoint.py",
         "--torch_model", torch_path, "--config", cfg_path,
         "--out", ckpt_dir, "--torch_opt", opt_path],
        cwd=repo, capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stdout + run.stderr
    assert os.path.exists(os.path.join(ckpt_dir, "optimizer.ckpt"))

    # reference-made classifiers (all four kinds) + z_stats.pkl
    from sklearn.svm import LinearSVC

    rng = np.random.default_rng(9)
    z = rng.normal(size=(30, 6))
    y = np.repeat(np.arange(3), 10)
    with open(os.path.join(ckpt_dir, "lda_classifier.pkl"), "wb") as f:
        pickle.dump(LinearDiscriminantAnalysis(
            solver="svd", store_covariance=True).fit(z, y), f)
    with open(os.path.join(ckpt_dir, "qda_classifier.pkl"), "wb") as f:
        pickle.dump(QuadraticDiscriminantAnalysis().fit(z, y), f)
    with open(os.path.join(ckpt_dir, "svm_classifier.pkl"), "wb") as f:
        pickle.dump(LinearSVC(class_weight="balanced").fit(z, y), f)
    mlp = torch.nn.Module()
    mlp.model = torch.nn.Sequential(torch.nn.Linear(6, 8), torch.nn.ReLU(),
                                    torch.nn.Linear(8, 3), torch.nn.ReLU())
    torch.save({"model": mlp.state_dict()},
               os.path.join(ckpt_dir, "mlp_classifier.pt"))
    with open(run_dir / "z_stats.pkl", "wb") as f:
        pickle.dump({"means": torch.zeros(6), "stds": torch.ones(6),
                     "mins": -torch.ones(6), "maxs": torch.ones(6)}, f)
    shutil.copy(cfg_path, run_dir / "config.yaml")

    run = subprocess.run(
        [sys.executable, "test.py", "--id", "migrated",
         "--output_path", str(root), "--experiment", "classifiers",
         "--platform", "cpu"],
        cwd=repo, capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "loaded from reference sklearn pickles" in run.stdout
    with open(run_dir / "accuracies.json") as f:
        accs = json.load(f)
    for name in ("lda", "qda", "svm", "mlp"):
        assert f"accuracy_{name}" in accs, (name, accs)

    # ... and training CONTINUES from the migrated net + Adam moments
    run = subprocess.run(
        [sys.executable, "train.py", "--config", cfg_path,
         "--id", "migrated", "--output_path", str(root),
         "--resume", "--epochs", "4", "--platform", "cpu"],
        cwd=repo, capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, run.stdout[-3000:] + run.stderr[-3000:]
    ckpts = os.listdir(ckpt_dir)
    assert any(c > "model_00000002.ckpt" and c.startswith("model_")
               for c in ckpts), ckpts


def test_convert_cli_roundtrip(tiny, tmp_path):
    """tools/convert_torch_checkpoint.py end-to-end: torch → our ckpt dir
    (resumable, optimizer included) and --reverse back to torch files with
    identical tensors."""
    import subprocess
    import sys

    import yaml

    from craniofacialsd_vae_tpu.models import SDVAEConfig

    geom, bundle, _ = tiny
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)
    torch.manual_seed(5)
    ref = _RefModel(bundle, config)
    # one step so the optimizer has real state to round-trip
    n = geom.region_masks.shape[1]
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    out, mu, logvar = ref(torch.zeros(2, n, 3))
    (out.square().mean() - 1e-4 * 0.5 * torch.mean(
        1 + logvar - mu ** 2 - logvar.exp())).backward()
    opt.step()
    torch_path = str(tmp_path / "model_00000042.pt")
    torch.save({"model": ref.state_dict()}, torch_path)
    opt_path = str(tmp_path / "optimizer.pt")
    torch.save({"optimizer": opt.state_dict()}, opt_path)

    cfg = {
        "model": {
            "sampling": {"type": "basic", "sampling_factors": [2, 2]},
            "spirals": {"length": [5, 5], "dilation": [1, 1]},
            "in_channels": 3, "out_channels": [8, 16],
            "latent_size": 6, "pre_z_sigmoid": False,
        },
        "optimization": {"kl_weight": 1e-4},
    }
    cfg_path = str(tmp_path / "arch.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "checkpoints")
    run = subprocess.run(
        [sys.executable, "tools/convert_torch_checkpoint.py",
         "--torch_model", torch_path, "--config", cfg_path,
         "--out", out_dir, "--torch_opt", opt_path],
        cwd=repo, capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stdout + run.stderr
    assert os.path.exists(os.path.join(out_dir, "model_00000042.ckpt"))
    assert os.path.exists(os.path.join(out_dir, "optimizer.ckpt"))

    back_path = str(tmp_path / "back.pt")
    run = subprocess.run(
        [sys.executable, "tools/convert_torch_checkpoint.py",
         "--torch_model", back_path, "--config", cfg_path,
         "--out", out_dir, "--reverse"],
        cwd=repo, capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stdout + run.stderr
    orig = ref.state_dict()
    back = torch.load(back_path, map_location="cpu",
                      weights_only=True)["model"]
    assert set(orig) == set(back)
    for k in orig:
        np.testing.assert_array_equal(orig[k].numpy(), back[k].numpy())
    # the optimizer round-tripped through our msgpack format too
    back_opt = torch.load(str(tmp_path / "back_optimizer.pt"),
                          map_location="cpu",
                          weights_only=True)["optimizer"]
    orig_opt = opt.state_dict()
    for k in orig_opt["state"]:
        for f in ("exp_avg", "exp_avg_sq"):
            np.testing.assert_allclose(
                orig_opt["state"][k][f].numpy(),
                back_opt["state"][int(k)][f].numpy(), rtol=0, atol=0)
