"""Config system and small host-side helpers (reference utils.py analog)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import yaml

__all__ = ["get_config", "flagship_sdvae_config", "save_config_snapshot",
           "prepare_sub_folder", "class_conversions_and_weights",
           "DEFAULT_CONFIG", "validate_config"]

# Keys actually consumed by the pipeline, with defaults. The reference reads
# config blindly (silently ignoring unknown keys and crashing on missing
# ones); here unknown keys warn and missing ones fall back or raise with a
# clear message.
DEFAULT_CONFIG = {
    "data": {
        "template_path": None,              # required
        "dataset_path": None,               # required for training
        "precomputed_path": "precomputed",
        "dataset_summary_path": None,
        "data_type": "heads",
        "stratified_split": False,
        "augmentation_mode": "interpolate",
        "augmentation_factor": 0,
        "augmentation_balanced": True,
        "normalize_data": True,
        "to_mm_constant": 1.0,
        "number_of_workers": 0,             # accepted for config parity;
                                            # host pipeline needs no workers
        "swap_features": True,
    },
    "optimization": {
        "epochs": 40,
        "batch_size": 4,
        "lr": 1e-4,
        "weight_decay": 0.0,
        "laplacian_weight": 0.0,
        "kl_weight": 0.0,
        "latent_consistency_weight": 0.0,
        "latent_consistency_eta1": 0.5,
        "latent_consistency_eta2": 0.5,
    },
    "model": {
        "sampling": {"type": "basic", "sampling_factors": [4, 4, 4, 4]},
        "spirals": {"length": [9, 9, 9, 9], "dilation": [1, 1, 1, 1]},
        "in_channels": 3,
        "out_channels": [32, 32, 32, 64],
        "latent_size": 75,
        "pre_z_sigmoid": False,
        # activation dtype policy: "float32" | "mixed" (level-0 fp32,
        # deeper levels bf16 — the fast option on TPU) | "bfloat16"
        "compute_dtype": "float32",
    },
    "logging_frequency": {
        "tb_renderings": 50,
        "save_weights": 100,
    },
}


def _merge(defaults: dict, user: dict, path: str = "") -> dict:
    out = {}
    for k, v in defaults.items():
        if k in user and isinstance(v, dict) and isinstance(user[k], dict):
            out[k] = _merge(v, user[k], f"{path}{k}.")
        elif k in user:
            out[k] = user[k]
        else:
            out[k] = v
    for k in user:
        if k not in defaults:
            out[k] = user[k]  # pass through (e.g. 'classifier' section)
    return out


def get_config(path: str) -> dict:
    """Load a YAML experiment config and fill defaults
    (reference utils.py:64-66 + silent-defaults behavior made explicit)."""
    with open(path) as f:
        user = yaml.safe_load(f)
    cfg = _merge(DEFAULT_CONFIG, user or {})
    validate_config(cfg)
    return cfg


def flagship_sdvae_config(repo_root: str):
    """The shipped flagship model config (configurations/craniofacial.yaml,
    incl. its compute_dtype policy) as an SDVAEConfig — single source for
    bench.py / benchmarks / __graft_entry__.py so they all measure and
    compile-check what production runs. Falls back to SDVAEConfig defaults
    if the yaml is absent (stripped checkouts)."""
    from craniofacialsd_vae_tpu.models import SDVAEConfig

    path = os.path.join(repo_root, "configurations", "craniofacial.yaml")
    if not os.path.exists(path):
        return SDVAEConfig()
    cfg = get_config(path)
    return SDVAEConfig.from_dict(cfg["model"],
                                 cfg["optimization"]["kl_weight"])


def validate_config(cfg: dict) -> None:
    model = cfg["model"]
    n_levels = len(model["sampling"]["sampling_factors"])
    if len(model["out_channels"]) != n_levels:
        raise ValueError(
            f"model.out_channels ({len(model['out_channels'])}) must match "
            f"sampling levels ({n_levels})")
    if len(model["spirals"]["length"]) != n_levels:
        raise ValueError("model.spirals.length must match sampling levels")
    if model.get("compute_dtype", "float32") not in (
            "float32", "mixed", "bfloat16"):
        raise ValueError("model.compute_dtype must be one of "
                         "'float32', 'mixed', 'bfloat16'")
    opt = cfg["optimization"]
    if float(opt.get("latent_consistency_weight", 0)) > 0 \
            and not cfg["data"].get("swap_features", False):
        raise ValueError("latent_consistency_weight > 0 requires "
                         "data.swap_features: true (reference "
                         "model_manager.py:93-94 assert)")


def save_config_snapshot(config_path: str, output_dir: str) -> None:
    """Copy the config into the run dir for reproducibility
    (reference train.py:30)."""
    os.makedirs(output_dir, exist_ok=True)
    shutil.copy(config_path, os.path.join(output_dir, "config.yaml"))


def prepare_sub_folder(output_dir: str) -> str:
    checkpoint_dir = os.path.join(output_dir, "checkpoints")
    os.makedirs(checkpoint_dir, exist_ok=True)
    return checkpoint_dir


def class_conversions_and_weights(class_weight_dict: dict):
    """(class2idx, normalized weight vector); 'b' forced last (reference
    model_manager.py:548-555)."""
    keys = list(class_weight_dict.keys())
    if "b" in keys:
        keys = [k for k in keys if k != "b"] + ["b"]
    class2idx = {k: i for i, k in enumerate(keys)}
    weights = np.asarray([class_weight_dict[k] for k in keys], np.float32)
    weights = weights / weights.sum()
    return class2idx, weights
