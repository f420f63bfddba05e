"""Validate the on-accelerator eigensolver at the k the reference
actually computes (VERDICT r4 weak #5 / missing #2).

The reference's spectral augmentation requests k=1000 ARPACK eigenpairs
of the 17,039-vertex template Laplacian (reference utils.py:238-241,
data_loading.py:309-311), and data/dataset.py:185 makes the same k=1000
request of ops/eigh.laplacian_eigendecomposition — but committed accuracy
evidence previously stopped at k=32 (tests/test_golden.py). This script
runs the Chebyshev-filtered subspace solver at the full k on the real
template, then validates it two ways:

  1. residual: max_j ‖L v_j − λ_j v_j‖ over ALL k pairs (the solver's
     own f64 check — no oracle needed);
  2. oracle: scipy ARPACK (shift-invert) at the same k — eigenvalue
     relative error and invariant-subspace overlap orthogonality.

Writes benchmarks/eigh_k1000_validation.json; the committed artifact is
pinned by tests/test_golden.py::test_k1000_validation_record.

    python benchmarks/eigh_k1000_validation.py [--k 1000] [--skip_scipy]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TEMPLATE = "/root/reference/demo_files/template.ply"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--k", type=int, default=1000)
    parser.add_argument("--skip_scipy", action="store_true",
                        help="residual-only validation (no ARPACK oracle)")
    parser.add_argument("--out", type=str,
                        default=os.path.join(REPO, "benchmarks",
                                             "eigh_k1000_validation.json"))
    args = parser.parse_args(argv)

    import numpy as np

    from craniofacialsd_vae_tpu.geometry import load_template
    from craniofacialsd_vae_tpu.ops.eigh import (_chebyshev_smallest,
                                                 _scipy_eigsh)
    from craniofacialsd_vae_tpu.utils.runtime import setup_jax

    jax = setup_jax()
    platform = jax.devices()[0].platform
    tpl = load_template(TEMPLATE)
    print(f"[k1000] template {tpl.num_vertices} verts, k={args.k}, "
          f"platform {platform}", flush=True)

    t0 = time.perf_counter()
    vals_c, vecs_c, info = _chebyshev_smallest(tpl, args.k)
    cheby_s = time.perf_counter() - t0
    print(f"[k1000] cheby: {cheby_s:.1f}s, {info['passes']} passes, "
          f"block {info['block']}, max residual "
          f"{info['max_residual']:.2e}", flush=True)

    record = {
        "k": args.k,
        "n_vertices": int(tpl.num_vertices),
        "platform": platform,
        "cheby_seconds": round(cheby_s, 1),
        "cheby_passes": int(info["passes"]),
        "cheby_block": int(info["block"]),
        "max_residual": float(info["max_residual"]),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }

    if not args.skip_scipy:
        t0 = time.perf_counter()
        vals_s, vecs_s = _scipy_eigsh(tpl, args.k)
        scipy_s = time.perf_counter() - t0
        order = np.argsort(vals_s)
        vals_s, vecs_s = vals_s[order], vecs_s[:, order]
        print(f"[k1000] scipy ARPACK oracle: {scipy_s:.1f}s", flush=True)
        # eigenvalue agreement (skip the zero mode: relative error there
        # is noise/noise)
        rel = np.abs(vals_c[1:] - vals_s[1:]) / np.abs(vals_s[1:])
        # invariant-subspace agreement: the overlap of the two
        # orthonormal bases must itself be orthogonal
        ov = vecs_c.T @ vecs_s
        ortho = float(np.abs(ov @ ov.T - np.eye(args.k)).max())
        record.update({
            "scipy_seconds": round(scipy_s, 1),
            "eigval_rel_err_max": float(rel.max()),
            "eigval_rel_err_median": float(np.median(rel)),
            "subspace_overlap_orthogonality_err": ortho,
            "speedup_vs_scipy": round(scipy_s / cheby_s, 2),
        })
        print(f"[k1000] eigval rel err max {rel.max():.2e} median "
              f"{np.median(rel):.2e}; subspace orthogonality err "
              f"{ortho:.2e}; speedup {scipy_s / cheby_s:.2f}x", flush=True)

    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[k1000] record → {args.out}", flush=True)
    ok = record["max_residual"] < 1e-3 and \
        record.get("eigval_rel_err_max", 0.0) < 1e-3
    print(f"[k1000] VALID={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
