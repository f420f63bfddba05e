"""Ahead-of-time model export: serialized StableHLO deployment artifacts.

``export_run_dir`` lowers the three raw-scan-space serving programs
(serving.build_raw_programs — encode / decode / reconstruct) at each
static batch bucket and serializes them with ``jax.export``. The
artifacts are **self-contained**: network weights, spiral/pool gather
tables, normalization stats and the mm scale are baked in as program
constants, so the exported directory runs on any machine with jax
installed — no model code, no checkpoint, no precomputed geometry, no
template. Multi-platform lowering (default cpu+tpu) makes one artifact
serve both a TPU pod and a CPU fallback host.

Layout of an export directory::

    manifest.json                 # shapes, buckets, versions, provenance
    encode_b<K>.jaxexport         # one serialized Exported per program
    decode_b<K>.jaxexport         #   and bucket size K
    reconstruct_b<K>.jaxexport

``load_exported`` restores the directory as an :class:`ExportedModel`
with the same pad-to-bucket/trim request semantics as the live
DiagnosisService (numpy in → numpy out; batches above the largest
bucket stream in chunks).

This is deployment surface the reference does not have (its inference
requires the full training workspace — see serving.py's module note);
the closest torch analog would be TorchScript/ONNX export, which the
reference also lacks.
"""

from __future__ import annotations

import json
import os

import numpy as np

_PROGRAMS = ("encode", "decode", "reconstruct")
_MANIFEST = "manifest.json"


def export_run_dir(run_dir: str, out_dir: str,
                   buckets: tuple = (1, 4, 16),
                   platforms: tuple = ("cpu", "tpu")) -> dict:
    """Export a trained run directory's inference programs to ``out_dir``.

    Loads the run like serving does (config snapshot + last checkpoint +
    the precomputed dir's normalization stats; the training dataset and
    classifier zoo are NOT needed) and writes the artifact directory.
    Returns the manifest dict."""
    from .manager import ModelManager
    from .serving import run_normalization
    from .utils import get_config

    config_path = os.path.join(run_dir, "config.yaml")
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"no config snapshot at {config_path}")
    config = get_config(config_path)
    # the checkpoint alone carries the net — drop the classifier section
    # so a deployment host never needs the training dataset scan that
    # sizing the MLP head would trigger
    config.pop("classifier", None)
    precomp = config["data"]["precomputed_path"]
    manager = ModelManager(config, precomputed_storage_path=precomp)
    manager.resume(os.path.join(run_dir, "checkpoints"))
    norm = run_normalization(config)
    return export_manager(manager, norm, out_dir, buckets=buckets,
                          platforms=platforms, source=str(run_dir))


def export_manager(manager, normalization: dict, out_dir: str,
                   buckets: tuple = (1, 4, 16),
                   platforms: tuple = ("cpu", "tpu"),
                   source: str = "<manager>") -> dict:
    """Export a live manager's inference programs (see module note)."""
    import jax
    from jax import export as jexport

    from .serving import build_raw_programs

    buckets = sorted(set(int(b) for b in buckets))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"buckets must be positive ints, got {buckets}")
    programs = build_raw_programs(manager, normalization)
    n = int(manager.geometry.spirals[0].num_vertices)
    nz = int(manager.model_latent_size)
    params = manager.state.params

    os.makedirs(out_dir, exist_ok=True)
    entries = {}
    for name in _PROGRAMS:
        fn = programs[name]
        in_shape = (n, 3) if name != "decode" else (nz,)
        for b in buckets:
            spec = jax.ShapeDtypeStruct((b,) + in_shape, np.float32)
            # close over the params: the artifact must not need the
            # checkpoint (weights become StableHLO constants)
            exported = jexport.export(
                jax.jit(lambda x, _f=fn: _f(params, x)),
                platforms=list(platforms))(spec)
            fname = f"{name}_b{b}.jaxexport"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exported.serialize())
            entries[f"{name}_b{b}"] = {
                "file": fname, "batch": b,
                "in_shape": list(spec.shape),
                "out_shapes": [list(s.shape) for s in exported.out_avals],
            }

    manifest = {
        "format": "craniofacialsd-vae-tpu/jax.export",
        "n_vertices": n, "latent_size": nz,
        "to_mm_constant": float(manager.to_mm_const),
        "buckets": buckets, "platforms": list(platforms),
        "programs": entries,
        "jax_version": jax.__version__,
        "calling_convention_version":
            jexport.maximum_supported_calling_convention_version,
        "source": source,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedModel:
    """Run an exported artifact directory: numpy in → numpy out, with the
    serving layer's pad-to-bucket/trim semantics. Needs only jax — no
    model code, weights, or geometry."""

    def __init__(self, artifact_dir: str):
        import jax
        from jax import export as jexport

        manifest_path = os.path.join(artifact_dir, _MANIFEST)
        if not os.path.exists(manifest_path):
            raise FileNotFoundError(
                f"{artifact_dir} is not an export directory "
                f"(missing {_MANIFEST})")
        with open(manifest_path) as f:
            self.manifest = json.load(f)
        self.n_vertices = int(self.manifest["n_vertices"])
        self.latent_size = int(self.manifest["latent_size"])
        self.buckets = [int(b) for b in self.manifest["buckets"]]
        self._calls = {}
        for key, entry in self.manifest["programs"].items():
            with open(os.path.join(artifact_dir, entry["file"]), "rb") as f:
                exported = jexport.deserialize(f.read())
            # jit the call so repeated requests reuse the compiled
            # executable instead of re-tracing the Exported each time
            self._calls[key] = jax.jit(exported.call)

    # ------------------------------------------------------------------
    def _run_bucketed(self, name: str, x: np.ndarray):
        b = x.shape[0]
        if b < 1:
            raise ValueError("empty batch (B=0)")
        max_b = self.buckets[-1]
        outs = []
        for lo in range(0, b, max_b):
            chunk = x[lo:lo + max_b]
            n = chunk.shape[0]
            size = next((s for s in self.buckets if n <= s), max_b)
            if size != n:
                pad = np.broadcast_to(chunk[:1],
                                      (size - n,) + chunk.shape[1:])
                chunk = np.concatenate([chunk, pad], axis=0)
            res = self._calls[f"{name}_b{size}"](chunk)
            res = res if isinstance(res, (tuple, list)) else (res,)
            outs.append(tuple(np.asarray(r)[:n] for r in res))
        merged = tuple(np.concatenate(parts, axis=0)
                       for parts in zip(*outs))
        return merged if len(merged) > 1 else merged[0]

    def _check(self, x, shape, what):
        x = np.asarray(x, np.float32)
        single = x.ndim == len(shape)
        x = x[None] if single else x
        if x.shape[1:] != shape:
            raise ValueError(f"{what} must be {list(shape)} or "
                             f"[B, {', '.join(map(str, shape))}]; "
                             f"got {list(x.shape)}")
        return x, single

    def encode(self, vertices) -> np.ndarray:
        """Raw scan-space [B, N, 3] (or [N, 3]) → latents [B, Z]."""
        x, single = self._check(vertices, (self.n_vertices, 3), "vertices")
        mu = self._run_bucketed("encode", x)
        return mu[0] if single else mu

    def decode(self, z) -> np.ndarray:
        """Latents [B, Z] (or [Z]) → raw scan-space vertices."""
        z, single = self._check(z, (self.latent_size,), "latent")
        out = self._run_bucketed("decode", z)
        return out[0] if single else out

    def reconstruct(self, vertices) -> dict:
        """Raw vertices → {recon, error_mm, mu} (one dispatch/bucket)."""
        x, single = self._check(vertices, (self.n_vertices, 3), "vertices")
        recon, err, mu = self._run_bucketed("reconstruct", x)
        if single:
            recon, err, mu = recon[0], err[0], mu[0]
        return {"recon": recon, "error_mm": err, "mu": mu}


def load_exported(artifact_dir: str) -> ExportedModel:
    return ExportedModel(artifact_dir)
