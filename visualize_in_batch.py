"""Swap-augmentation visual check (reference visualize_in_batch.py analog):
build a 4-mesh batch with distinct per-mesh vertex colors, apply the
on-device feature swap, and export the 16 swapped meshes as colored PLYs —
each output mesh shows its donor region in the donor's color.

Usage: python visualize_in_batch.py [--out swap_viz] [--region 3]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="swap_viz")
    parser.add_argument("--region", type=int, default=0)
    parser.add_argument("--template", type=str,
                        default="/root/reference/demo_files/template.ply")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu); the axon "
                             "TPU plugin ignores JAX_PLATFORMS")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    setup_jax(platform=args.platform)

    import jax.numpy as jnp

    from craniofacialsd_vae_tpu.data.swap import swap_features
    from craniofacialsd_vae_tpu.geometry import load_template, write_ply

    tpl = load_template(args.template)
    n = tpl.num_vertices
    b = 4
    batch = np.stack([tpl.pos + 0.05 * i for i in range(b)])

    palette = np.array([[230, 80, 80, 255], [80, 180, 90, 255],
                        [80, 120, 230, 255], [230, 200, 60, 255]],
                       dtype=np.uint8)
    colors = np.stack([np.tile(palette[i], (n, 1)) for i in range(b)])

    mask = tpl.region_masks()[args.region]
    x_vm = jnp.asarray(np.swapaxes(batch, 0, 1), jnp.float32)
    c_vm = jnp.asarray(np.swapaxes(colors, 0, 1), jnp.float32)
    swapped = np.swapaxes(np.asarray(
        swap_features(x_vm, jnp.asarray(mask))), 0, 1)
    swapped_colors = np.swapaxes(np.asarray(
        swap_features(c_vm, jnp.asarray(mask))), 0, 1).astype(np.uint8)

    for i in range(b * b):
        write_ply(os.path.join(args.out, f"swap_{i // b}_{i % b}.ply"),
                  swapped[i], tpl.face, swapped_colors[i])
    region_name = tpl.region_names[args.region]
    print(f"wrote {b * b} meshes (swapped region {region_name}) → "
          f"{args.out}")


if __name__ == "__main__":
    main()
