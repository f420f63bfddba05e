"""Generate a synthetic craniofacial-style dataset for smoke training and
demos when the clinical dataset is unavailable.

Takes the template (or a synthetic octasphere), applies per-class smooth
low-frequency deformation signatures + per-sample noise, and writes
class-prefixed OBJ files (a_/c_/m_/n_/b_<id>.obj) compatible with the data
pipeline's naming conventions. The analog of the reference's PCA-model data
generation (the STAR/UHM paths in its configs).

Usage: python tools/make_synthetic_dataset.py --out data_synth --n 60
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--n", type=int, default=60,
                        help="total meshes across classes a/c/m/n/b")
    parser.add_argument("--template", type=str,
                        default="/root/reference/demo_files/template.ply")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--k_modes", type=int, default=20,
                        help="number of smooth deformation modes")
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.geometry import load_template, write_obj
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template
    from craniofacialsd_vae_tpu.ops.eigh import laplacian_eigendecomposition

    if os.path.exists(args.template):
        tpl = load_template(args.template)
    else:
        tpl = synthetic_template(subdivisions=4, n_regions=15)

    rng = np.random.default_rng(args.seed)
    print(f"template: {tpl.num_vertices} verts; computing smooth basis…")
    _, eigvecs = laplacian_eigendecomposition(tpl, k=args.k_modes,
                                              backend="scipy")

    classes = ["a", "c", "m", "n", "b"]
    # per-class deformation signature in the smooth basis
    signatures = {c: rng.normal(size=(args.k_modes, 3)) * 0.03
                  for c in classes}

    os.makedirs(args.out, exist_ok=True)
    per_class = max(args.n // len(classes), 2)
    for c in classes:
        for i in range(per_class):
            coeff = signatures[c] + rng.normal(
                size=(args.k_modes, 3)) * 0.01
            verts = tpl.pos + eigvecs @ coeff
            name = f"{c}_{i}.obj"
            write_obj(os.path.join(args.out, name), verts, tpl.face)
    print(f"wrote {per_class * len(classes)} meshes to {args.out}")


if __name__ == "__main__":
    main()
