"""Reference torch-checkpoint interop.

The reference saves ``torch.save({'model': net.state_dict()},
model_<epoch>.pt)`` (reference model_manager.py:682-696) with keys

    en_layers.{i}.conv.layer.{weight,bias}   i < L          (SpiralEnblock)
    en_layers.{L}.{weight,bias}              first latent Linear
    en_layers.{L+1}.{weight,bias}            second latent Linear (VAE only)
    de_layers.0.{weight,bias}                latent → features Linear
    de_layers.{j}.conv.layer.{weight,bias}   1 ≤ j ≤ L      (SpiralDeblock)
    de_layers.{L+1}.layer.{weight,bias}      final SpiralConv

where L = len(out_channels). A user migrating from the reference can load
their trained nets here (``import_reference_checkpoint`` /
``tools/convert_torch_checkpoint.py``) and hand TPU-trained weights back
to the reference toolchain (``export_reference_checkpoint``).

Two layout facts make the mapping exact:

* ``nn.Linear`` stores weight [out, in] and computes ``x @ W.T + b``; our
  dense/conv weights are [in, out] — every weight transposes, biases map
  verbatim.
* The spiral flatten order is identical on both sides: the reference's
  ``index_select(x, indices.view(-1)).view(bs, n, seq*C)``
  (reference model.py:27-41) orders features seq-major/channel-minor,
  exactly our packed [L·C_in, C_out] rows (ops/spiral_conv.py), and both
  flatten the latent heads vertex-major (reference model.py:152 ``x.view(-1,
  num_vert*C)`` vs models/sdvae.py encode).

One naming quirk (reference model.py:114-119, 146-158): under ``is_vae``
the encoder's LAST appended linear serves as **mu** (``en_layers[-1]``)
and the FIRST as **logvar** (``en_layers[-2]``); under AE the single
linear is mu. Getting this backwards would swap mu/logvar silently — the
round-trip test pins it against a reference-named torch oracle.
"""

from __future__ import annotations

import numpy as np

__all__ = ["import_reference_checkpoint", "export_reference_checkpoint",
           "import_reference_mlp", "import_reference_optimizer",
           "export_reference_optimizer"]


def _load_state_dict(path_or_sd, payload_key: str):
    if isinstance(path_or_sd, (str, bytes)):
        import torch
        sd = torch.load(path_or_sd, map_location="cpu",
                        weights_only=True)
    else:
        sd = path_or_sd
    if isinstance(sd, dict) and payload_key in sd:
        sd = sd[payload_key]
    return sd


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def import_reference_checkpoint(path_or_sd, config) -> dict:
    """Reference ``model_*.pt`` (path, or an already-loaded state dict /
    {'model': state_dict} wrapper) → our param pytree (init_sdvae layout,
    fp32 numpy leaves). Raises KeyError on missing keys (e.g. a VAE config
    against an AE checkpoint) and ValueError on unconsumed keys (wrong
    architecture for this config)."""
    import jax.numpy as jnp

    sd = _load_state_dict(path_or_sd, "model")
    used = set()

    def lin(prefix: str) -> dict:
        wk, bk = prefix + ".weight", prefix + ".bias"
        if wk not in sd:
            raise KeyError(
                f"reference checkpoint is missing '{wk}' — architecture "
                f"mismatch with this config (have keys like "
                f"{sorted(sd)[:4]}…)")
        used.update((wk, bk))
        return {"w": jnp.asarray(_to_np(sd[wk]).T),
                "b": jnp.asarray(_to_np(sd[bk]))}

    n_levels = len(config.out_channels)
    params = {
        "en_convs": [lin(f"en_layers.{i}.conv.layer")
                     for i in range(n_levels)],
        "de_dense": lin("de_layers.0"),
        "de_convs": [lin(f"de_layers.{j}.conv.layer")
                     for j in range(1, n_levels + 1)],
        "final_conv": lin(f"de_layers.{n_levels + 1}.layer"),
    }
    if config.is_vae:
        params["logvar"] = lin(f"en_layers.{n_levels}")
        params["mu"] = lin(f"en_layers.{n_levels + 1}")
    else:
        params["mu"] = lin(f"en_layers.{n_levels}")
    unused = set(sd) - used
    if unused:
        raise ValueError(
            f"reference checkpoint has {len(unused)} unconsumed keys "
            f"(e.g. {sorted(unused)[:3]}) — is_vae/out_channels mismatch "
            "with this config")
    return params


def export_reference_checkpoint(params: dict, config, path: str) -> None:
    """Our param pytree → reference-named ``torch.save({'model': ...})``,
    loadable by the reference's ``Model.load_state_dict``. Accepts live
    pytrees (lists) and msgpack-restored state dicts (where lists become
    {"0": ..., "1": ...} dicts)."""
    import torch

    sd = {}

    def put(prefix: str, leaf: dict) -> None:
        # owned copies: jax buffers arrive as non-writable numpy views,
        # which torch.from_numpy warns about
        sd[prefix + ".weight"] = torch.from_numpy(
            np.array(_to_np(leaf["w"]).T, copy=True, order="C"))
        sd[prefix + ".bias"] = torch.from_numpy(
            np.array(_to_np(leaf["b"]), copy=True))

    n_levels = len(config.out_channels)
    en_convs, de_convs = _seq(params["en_convs"]), _seq(params["de_convs"])
    for i in range(n_levels):
        put(f"en_layers.{i}.conv.layer", en_convs[i])
    if config.is_vae:
        put(f"en_layers.{n_levels}", params["logvar"])
        put(f"en_layers.{n_levels + 1}", params["mu"])
    else:
        put(f"en_layers.{n_levels}", params["mu"])
    put("de_layers.0", params["de_dense"])
    for j in range(n_levels):
        put(f"de_layers.{j + 1}.conv.layer", de_convs[j])
    put(f"de_layers.{n_levels + 1}.layer", params["final_conv"])
    torch.save({"model": sd}, path)


def _seq(node):
    """msgpack-restored pytrees store lists as {"0": ..., "1": ...} dicts
    (flax state-dict convention) — normalize back to a list."""
    if isinstance(node, dict) and node and \
            all(isinstance(k, str) and k.isdigit() for k in node):
        return [node[str(i)] for i in range(len(node))]
    return node


def _reference_param_order(params: dict, config) -> list:
    """Our param leaves in the reference's ``model.parameters()`` order
    (module registration order; each Linear yields weight then bias).
    Returns [(leaf_dict, transpose_moments)] — weights transpose like the
    param import, biases map verbatim."""
    n_levels = len(config.out_channels)
    order = []

    def lin(leaf):
        order.append((leaf, True))       # weight ([out,in] → [in,out])
        order.append((leaf, False))      # bias

    en_convs, de_convs = _seq(params["en_convs"]), _seq(params["de_convs"])
    for i in range(n_levels):
        lin(en_convs[i])
    if config.is_vae:
        lin(params["logvar"])            # first-appended Linear
        lin(params["mu"])
    else:
        lin(params["mu"])
    lin(params["de_dense"])
    for j in range(n_levels):
        lin(de_convs[j])
    lin(params["final_conv"])
    return order


def import_reference_optimizer(path_or_sd, params: dict, config, optimizer):
    """Reference ``optimizer.pt`` (``torch.save({'optimizer':
    torch.optim.Adam(...).state_dict()})``, reference
    model_manager.py:686,695-696) → optax state for ``optimizer``
    (training.coupled_adam over `params`), enabling exact mid-training
    continuation: torch Adam's per-param exp_avg / exp_avg_sq are the same
    raw EMAs as optax ScaleByAdamState.mu/.nu (both apply bias correction
    from the step count at update time), so they map one-to-one in
    ``model.parameters()`` order with the weight transposes of the param
    import. Coupled L2 matches by construction (coupled_adam adds decay to
    the gradient exactly like torch.optim.Adam's weight_decay)."""
    import jax.numpy as jnp
    import optax

    sd = _load_state_dict(path_or_sd, "optimizer")
    state_map = {int(k): v for k, v in sd["state"].items()}
    order = _reference_param_order(params, config)
    if len(state_map) != len(order):
        raise ValueError(
            f"reference optimizer has state for {len(state_map)} params, "
            f"this architecture has {len(order)} — config mismatch")
    steps = {int(np.asarray(_to_np(v["step"]))) for v in state_map.values()}
    if len(steps) != 1:
        raise ValueError(f"per-param torch steps disagree ({steps}) — "
                         "optax keeps one global count")
    count = jnp.asarray(steps.pop(), jnp.int32)

    import jax

    def build(moment_key: str):
        # params-shaped tree, then write each torch moment into its leaf
        # dict in reference order (leaves are {"w","b"} dicts — mutable)
        tree = jax.tree.map(lambda a: np.zeros(a.shape, np.float32), params)
        for idx, (leaf, transpose) in enumerate(
                _reference_param_order(tree, config)):
            m = _to_np(state_map[idx][moment_key])
            m = m.T if transpose else m
            key = "w" if transpose else "b"
            if m.shape != leaf[key].shape:
                raise ValueError(
                    f"optimizer moment {idx} ({moment_key}) has shape "
                    f"{m.shape}, parameter expects {leaf[key].shape} — "
                    "architecture mismatch")
            leaf[key] = jnp.asarray(m)
        return tree

    mu_tree, nu_tree = build("exp_avg"), build("exp_avg_sq")

    def replace(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(count=count, mu=mu_tree, nu=nu_tree)
        if isinstance(node, tuple):
            children = map(replace, node)
            return (type(node)(*children) if hasattr(node, "_fields")
                    else tuple(children))     # NamedTuple vs plain tuple
        return node

    return replace(optimizer.init(params))


def export_reference_optimizer(opt_state, config, path: str,
                               lr: float, weight_decay: float = 0.0
                               ) -> None:
    """Inverse of import_reference_optimizer: our coupled_adam state →
    ``torch.save({'optimizer': ...})`` loadable by
    ``torch.optim.Adam(model.parameters(), ...).load_state_dict`` in the
    reference toolchain, so a TPU-trained run continues there
    mid-training. lr/weight_decay must be passed because torch's
    load_state_dict OVERWRITES the live optimizer's hyperparameters with
    the saved param_groups."""
    import optax
    import torch

    adam = None

    def find(node):
        nonlocal adam
        if isinstance(node, optax.ScaleByAdamState):
            adam = node
        elif isinstance(node, tuple):
            for c in node:
                find(c)

    find(opt_state)
    if adam is None:
        raise ValueError("no ScaleByAdamState found in the optimizer "
                         "state — not an adam/coupled_adam state")
    step = int(np.asarray(adam.count))
    order_mu = _reference_param_order(adam.mu, config)
    order_nu = _reference_param_order(adam.nu, config)
    state, idxs = {}, []
    for idx, ((mu_leaf, transpose), (nu_leaf, _)) in enumerate(
            zip(order_mu, order_nu)):
        key = "w" if transpose else "b"
        m, v = _to_np(mu_leaf[key]), _to_np(nu_leaf[key])
        if transpose:
            m, v = m.T, v.T
        state[idx] = {
            "step": torch.tensor(float(step)),
            "exp_avg": torch.from_numpy(np.array(m, copy=True, order="C")),
            "exp_avg_sq": torch.from_numpy(
                np.array(v, copy=True, order="C")),
        }
        idxs.append(idx)
    group = {"params": idxs, "lr": float(lr), "betas": (0.9, 0.999),
             "eps": 1e-8, "weight_decay": float(weight_decay),
             "amsgrad": False, "maximize": False, "foreach": None,
             "capturable": False, "differentiable": False, "fused": None,
             "decoupled_weight_decay": False}
    torch.save({"optimizer": {"state": state,
                              "param_groups": [group]}}, path)


def import_reference_mlp(path_or_sd) -> list:
    """Reference ``mlp_classifier.pt`` (model_manager.py:708-711) → our MLP
    head layers (models/mlp.py layout). The reference Sequential
    interleaves Linear/ReLU, so Linears sit at even indices:
    ``model.{2i}.weight``."""
    import jax.numpy as jnp

    sd = _load_state_dict(path_or_sd, "model")
    layers = []
    i = 0
    while f"model.{2 * i}.weight" in sd:
        layers.append({
            "w": jnp.asarray(_to_np(sd[f"model.{2 * i}.weight"]).T),
            "b": jnp.asarray(_to_np(sd[f"model.{2 * i}.bias"])),
        })
        i += 1
    if not layers:
        raise KeyError(
            f"no 'model.{{2i}}.weight' keys found (have {sorted(sd)[:4]}…) "
            "— not a reference MLPClassifier checkpoint")
    return layers
