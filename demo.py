"""Demo / reproducibility script (reference demo.ipynb analog).

Runs the demo workflow end-to-end against the reference's shipped
demo_files/ artifacts:
  1. load the segmented template + precomputed transforms/spirals
     (bit-compatible importers — our own preprocessing reproduces them
     exactly; see tests/test_geometry.py),
  2. spectral-interpolation augmentation of two demo meshes,
  3. encode the 12 demo meshes and diagnose them with the reference's
     QDA classifier pickle (identical predictions to sklearn),
  4. project latents with the reference's LDA (global + per-region),
  5. surgical-planning interpolation from a syndromic patient toward the
     healthy-class distribution, rendered as an image strip.

The reference's network checkpoint is a missing large blob in this mount,
so the encoder weights come from --checkpoint (a trained run) or fresh
initialization (classifier parity in step 3 is then demonstrated on the
latents' pipeline mechanics rather than clinical accuracy).

Usage: python demo.py [--checkpoint outputs/<id>/checkpoints] [--out demo_out]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

DEMO = "/root/reference/demo_files"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--out", type=str, default="demo_out")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu); the axon "
                             "TPU plugin ignores JAX_PLATFORMS")
    parser.add_argument("--eig_k", type=int, default=None,
                        help="Laplacian eigenbasis size for the spectral "
                             "augmentation demo; default 500 on TPU, 64 "
                             "on CPU (the augmentation interpolates only "
                             "the first 30 coefficients — reference "
                             "utils.py:264 — so a small CPU basis keeps "
                             "the demo inside the reference's ~5-min "
                             "laptop budget with identical visuals)")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax(platform=args.platform)
    if args.eig_k is None:
        args.eig_k = 500 if jax.devices()[0].platform == "tpu" else 64

    from craniofacialsd_vae_tpu.analysis.classifiers import LatentClassifiers
    from craniofacialsd_vae_tpu.data.augmentation import \
        spectral_interpolation
    from craniofacialsd_vae_tpu.geometry import read_mesh
    from craniofacialsd_vae_tpu.manager import ModelManager
    from craniofacialsd_vae_tpu.ops.eigh import laplacian_eigendecomposition
    from craniofacialsd_vae_tpu.utils import get_config
    from craniofacialsd_vae_tpu.viz.renderer import (make_image_grid,
                                                     render_batch)

    # -- 1. manager over the demo template + cached transforms/spirals ----
    config = get_config(os.path.join(DEMO, "config.yaml"))
    config["data"]["template_path"] = os.path.join(DEMO, "template.ply")
    config["data"]["dataset_path"] = os.path.join(DEMO, "meshes")
    manager = ModelManager(config, precomputed_storage_path=DEMO)
    manager.set_class_conversions({"a": 0, "m": 1, "c": 2, "n": 3, "b": 4})
    if args.checkpoint:
        manager.resume(args.checkpoint)

    import torch
    norm = torch.load(os.path.join(DEMO, "norm.pt"))
    mean = norm["mean"].numpy()
    std = norm["std"].numpy()

    # -- 2. spectral augmentation demo ------------------------------------
    meshes_dir = os.path.join(DEMO, "meshes")
    names = sorted(os.listdir(meshes_dir))
    print(f"demo meshes: {len(names)}")
    v1 = read_mesh(os.path.join(meshes_dir, names[0])).vertices
    v2 = read_mesh(os.path.join(meshes_dir, names[1])).vertices
    print(f"computing Laplacian eigenbasis (k={args.eig_k}) — "
          "Chebyshev-filtered subspace iteration on-accelerator "
          "(reference: minutes of laptop ARPACK, README.md:68-69)…")
    t_eig = time.perf_counter()
    _, eigvecs = laplacian_eigendecomposition(manager.template,
                                              k=args.eig_k,
                                              cache_dir=args.out)
    print(f"eigenbasis ready in {time.perf_counter() - t_eig:.1f}s")
    rng = np.random.default_rng(0)
    aug = spectral_interpolation(eigvecs, v1[None], v2[None], rng)[0]
    imgs = render_batch(np.stack([v1, v2, aug]), manager.template.face)
    import imageio.v2 as imageio
    imageio.imwrite(os.path.join(args.out, "augmentation.png"),
                    (make_image_grid(imgs, nrow=3) * 255).astype(np.uint8))
    print("augmentation demo → augmentation.png")

    # -- 3. encode + QDA diagnosis with the reference's classifiers -------
    zoo = LatentClassifiers(latent_size=manager.model_latent_size,
                            latent_regions=manager.latent_regions)
    zoo.load_reference_pickles(os.path.join(DEMO, "checkpoints"))
    zoo.load_reference_pickles(DEMO)  # region_ldas.pkl
    manager.classifiers = zoo

    verts = np.stack([read_mesh(os.path.join(meshes_dir, n)).vertices
                      for n in names]).astype(np.float32)
    v_norm = (verts - mean) / std
    z = np.asarray(manager.encode(v_norm))
    diagnosis = manager.classify_latent(z, "qda")
    for n, d in zip(names, diagnosis):
        print(f"  {n}: true={n[0]} predicted={d}")

    # -- 4. LDA projections (global + per-region) -------------------------
    emb = zoo.lda.transform_sklearn_style(z)
    print(f"global LDA embedding: {emb.shape}")
    region_embs = {}
    for key, (lo, hi) in manager.latent_regions.items():
        region_embs[key] = zoo.region_ldas[key].transform_sklearn_style(
            z[:, lo:hi])
    print(f"per-region LDA embeddings: {len(region_embs)} regions")

    # -- 4b. overlay onto the SHIPPED pickled figures (demo.ipynb cells
    # 13/15: scatter demo latents onto the paper's embedding plots) -------
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from craniofacialsd_vae_tpu.geometry.template import COLOUR2ATTRIBUTE
    from craniofacialsd_vae_tpu.viz.plots import load_pickled_figure

    try:
        fig = load_pickled_figure(
            os.path.join(DEMO, "lda_emb_distributions.pkl"))
        fig.gca().scatter(emb[:, 0], emb[:, 1], c=["#e881a7"], s=14)
        fig.savefig(os.path.join(args.out, "demo_emb.svg"))
        plt.close(fig)
        print("global-figure overlay → demo_emb.svg")
    except Exception as e:
        print(f"global-figure overlay skipped ({type(e).__name__}: {e})")
    try:
        grid = load_pickled_figure(
            os.path.join(DEMO, "emb_all_train_dist.pkl"))
        for key, remb in region_embs.items():
            ax = grid.axes_dict.get(COLOUR2ATTRIBUTE.get(key, key))
            if ax is not None:
                ax.scatter(remb[:, 0], remb[:, 1], c=["#e881a7"], s=2)
        grid.fig.savefig(os.path.join(args.out, "demo_emb_r.svg"))
        plt.close(grid.fig)
        print("per-region-figure overlay → demo_emb_r.svg")
    except Exception as e:
        print(f"per-region overlay skipped ({type(e).__name__}: {e})")

    # -- 5. surgical-planning interpolation (reference demo.ipynb cells
    # 19-25): walk the patient latent toward the healthy QDA Gaussian,
    # locate the 3/2/1-std crossings, build per-procedure walks where
    # only the affected regions' latent slices move, render the strips --
    from craniofacialsd_vae_tpu.analysis.planning import plan_to_healthy

    sick = [i for i, n in enumerate(names) if n[0] in "acm"][0]
    mean_h, cov_h = zoo.qda.class_covariance(manager.class2idx("n"))
    plan = plan_to_healthy(z[sick], mean_h, cov_h, manager.latent_regions,
                           n_p_to_3std=8)
    path = plan["all_attributes"]                       # [11, D]
    gen = np.asarray(manager.generate(path)) * std + mean
    imgs = render_batch(gen, manager.template.face)
    imageio.imwrite(
        os.path.join(args.out, "planning_interpolation.png"),
        (make_image_grid(imgs, nrow=len(path)) * 255).astype(np.uint8))
    # the reference notebook's planning ANIMATION analog (demo.ipynb
    # cell 25) — self-contained MJPEG AVI, no ffmpeg needed
    from craniofacialsd_vae_tpu.viz.video import write_mjpeg_avi
    write_mjpeg_avi(os.path.join(args.out, "planning_interpolation.avi"),
                    (np.clip(imgs, 0, 1) * 255).astype(np.uint8), fps=3)
    print(f"planning demo ({names[sick]} → healthy mean, "
          f"{len(path)}-stop all-attributes walk incl. 3/2/1-std "
          "crossings) → planning_interpolation.png/.avi")

    # per-procedure distance table (reference procedure_distances.csv):
    # mean-squared latent distance to the healthy mean at each stop
    import csv
    rows = plan["procedure_distances"]
    with open(os.path.join(args.out, "procedure_distances.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"procedure distances ({len(rows)} procedures) → "
          "procedure_distances.csv")

    # per-procedure image grid (reference cells 19-25's grid/animation):
    # one row per procedure at the named stops — patient, 3/2/1-std
    # crossings, healthy mean (walk layout: rows 0..n_p_to_3std-1 walk to
    # the 3-std stop, then single 2/1-std and mean rows). Rendering is
    # host-side and off the perf path; a few procedures keep the CPU demo
    # bounded.
    stops = [0, len(path) - 4, len(path) - 3, len(path) - 2,
             len(path) - 1]
    n_proc = min(4, len(plan["procedures"]))
    grid_rows = []
    for proc in list(plan["procedures"])[:n_proc]:
        zp = plan["procedures"][proc][stops]
        gp = np.asarray(manager.generate(zp)) * std + mean
        grid_rows.append(render_batch(gp, manager.template.face))
    imageio.imwrite(
        os.path.join(args.out, "planning_per_procedure.png"),
        (make_image_grid(np.concatenate(grid_rows), nrow=len(stops))
         * 255).astype(np.uint8))
    print(f"per-procedure planning grid ({n_proc} procedures × "
          f"{len(stops)} stops) → planning_per_procedure.png")
    print("demo complete →", args.out)


if __name__ == "__main__":
    main()
