"""Ahead-of-time export of a trained run's inference programs.

    python tools/export_model.py --id=run1 [--output_path=.]
        [--out outputs/run1/export] [--buckets 1 4 16]
        [--platforms cpu tpu] [--platform cpu] [--verify]

Serializes the three raw-scan-space serving programs (encode / decode /
reconstruct — serving.build_raw_programs) at each static batch bucket as
self-contained StableHLO artifacts via ``jax.export``: network weights,
spiral/pool gather tables, normalization stats and the mm scale are
baked in as program constants. The resulting directory runs on any
machine with jax installed — no model code, checkpoint, or precomputed
geometry — through ``craniofacialsd_vae_tpu.export.load_exported``.
Multi-platform lowering (default cpu+tpu) makes one artifact serve both
a TPU pod and a CPU fallback host.

``--verify`` reloads the serialized artifacts and round-trips random
inputs through every program×bucket, checking shapes and finiteness
(exact numeric parity vs the live service is pinned by
tests/test_serving.py's export tests).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def verify_artifacts(out_dir: str) -> None:
    """Reload the serialized programs and run every bucket once."""
    from craniofacialsd_vae_tpu.export import load_exported

    model = load_exported(out_dir)
    rng = np.random.default_rng(0)
    for b in model.buckets:
        raw = rng.normal(size=(b, model.n_vertices, 3)).astype(np.float32)
        mu = model.encode(raw)
        assert mu.shape == (b, model.latent_size), mu.shape
        out = model.decode(mu)
        assert out.shape == raw.shape, out.shape
        rec = model.reconstruct(raw)
        for key in ("recon", "error_mm", "mu"):
            if not np.all(np.isfinite(rec[key])):
                raise AssertionError(f"non-finite {key} at bucket {b}")
        print(f"  bucket {b}: encode/decode/reconstruct ok "
              f"(mean recon err {float(rec['error_mm'].mean()):.3f} mm)")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--id", type=str, default=None)
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--run_dir", type=str, default=None,
                        help="explicit run dir (overrides --id)")
    parser.add_argument("--out", type=str, default=None,
                        help="artifact dir (default <run_dir>/export)")
    parser.add_argument("--buckets", type=int, nargs="+", default=[1, 4, 16])
    parser.add_argument("--platforms", type=str, nargs="+",
                        default=["cpu", "tpu"],
                        help="platforms to lower for (baked into the "
                             "artifact; independent of --platform)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax runtime platform for the "
                             "export process itself (e.g. cpu; the axon "
                             "plugin ignores JAX_PLATFORMS)")
    parser.add_argument("--verify", action="store_true")
    args = parser.parse_args(argv)

    if args.run_dir is None:
        if args.id is None:
            parser.error("one of --id or --run_dir is required")
        args.run_dir = os.path.join(args.output_path, "outputs", args.id)

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    setup_jax(platform=args.platform)

    from craniofacialsd_vae_tpu.export import export_run_dir

    out_dir = args.out or os.path.join(args.run_dir, "export")
    manifest = export_run_dir(args.run_dir, out_dir,
                              buckets=tuple(args.buckets),
                              platforms=tuple(args.platforms))
    n_files = len(manifest["programs"])
    total = sum(os.path.getsize(os.path.join(out_dir, e["file"]))
                for e in manifest["programs"].values())
    print(f"exported {n_files} programs ({total / 1e6:.1f} MB) to {out_dir} "
          f"[platforms {','.join(manifest['platforms'])}, "
          f"buckets {manifest['buckets']}]")
    if args.verify:
        verify_artifacts(out_dir)
        print("verification passed")


if __name__ == "__main__":
    main()
