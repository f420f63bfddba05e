"""Evaluation harness (reference test.py Tester analog) — quantitative
metrics, latent statistics, traversals, embeddings, generation.

Built incrementally; each function is standalone and json-artifact-oriented
like the reference's outputs/<id>/ layout.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

__all__ = ["compute_latent_stats", "reconstruction_errors",
           "compute_diversity", "random_generation"]


def compute_latent_stats(manager, output_dir: str,
                         train_iter=None, cache: bool = True) -> dict:
    """Per-dimension mean/std/min/max over the train latents, cached as
    z_stats.npz (reference test.py:95-117 caches z_stats.pkl)."""
    path = os.path.join(output_dir, "z_stats.npz")
    if cache and os.path.exists(path):
        z = np.load(path)
        return {k: z[k] for k in ("means", "stds", "mins", "maxs")}
    latents, _ = manager.train_latents_and_labels
    if latents is None:
        if train_iter is None:
            raise ValueError("no cached train latents; pass train_iter")
        latents, _ = manager.encode_all(train_iter, is_train_loader=True)
    stats = {
        "means": latents.mean(axis=0),
        "stds": latents.std(axis=0),
        "mins": latents.min(axis=0),
        "maxs": latents.max(axis=0),
    }
    if cache:
        os.makedirs(output_dir, exist_ok=True)
        np.savez(path, **stats)
    return stats


def reconstruction_errors(manager, data_iter, normalization: dict) -> dict:
    """Per-vertex Euclidean reconstruction error in mm over a split:
    mean/median/max/std (reference test.py:280-301)."""
    mean = np.asarray(normalization["mean"])
    std = np.asarray(normalization["std"])
    errors = []
    for batch in data_iter:
        x = batch["x"]
        out, _, _, _ = manager.forward(x, training=False)
        out = np.asarray(out)
        gt = x * std + mean
        pred = out * std + mean
        err = np.asarray(
            manager.compute_vertex_errors(pred, gt))      # [B, N] in mm
        errors.append(err)
    err = np.concatenate(errors, axis=0)
    return {
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "max": float(err.max()),
        "std": float(err.std()),
    }


def compute_diversity(meshes: np.ndarray) -> float:
    """Mean pairwise vertex distance within a set of meshes — the
    train-set / generative diversity metric (reference test.py:303-334
    computes mean inter-batch distances)."""
    m = meshes.reshape(len(meshes), -1, 3)
    half = len(m) // 2
    if half == 0:
        return 0.0
    a, b = m[:half], m[half:2 * half]
    return float(np.mean(np.linalg.norm(a - b, axis=-1)))


def random_generation(manager, z_stats: dict, n_samples: int = 16,
                      seed: int = 0, scale: float = 1.0) -> np.ndarray:
    """Decode latents drawn from the train-latent Gaussian envelope
    (reference test.py:231-266)."""
    rng = np.random.default_rng(seed)
    z = rng.normal(z_stats["means"], z_stats["stds"] * scale,
                   size=(n_samples, len(z_stats["means"])))
    return np.asarray(manager.generate(z.astype(np.float32)))
