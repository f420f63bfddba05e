"""Evaluation entry point (reference test.py __main__ analog).

    python test.py --id=my_run [--output_path=.] [--experiment=standard]

Loads the run's config snapshot, resumes the last checkpoint + classifiers,
and runs the selected experiment:
  standard     — full suite: traversals, embeddings, generation, classifier
                 metrics, reconstruction + diversity → eval_metrics.json
  traversals | embeddings | generation | classifiers | recon — individually
  refit_classifiers — refit the zoo from the resumed model's latents
  interpolate  — per-feature / per-variable / all-features latent walks
  classify_and_project — diagnose --mesh and overlay onto the embeddings
  planning     — surgical planning for --mesh (syndrome → healthy walk)
  prepost      — pre/post assessment for --mesh (pre) and --mesh2 (post)
  prepost_batch — every pair in --pairs_excel under --pairs_root, with
                 per-syndrome region/angle boxplots (reference default)
  fit          — fit an unregistered scan: --mesh + --landmarks json
  saliency     — gradient attribution of the QDA diagnosis (per-vertex
                 colormaps + per-region table for the first test meshes)
  uncertainty  — posterior-sampling uncertainty of the QDA diagnosis
                 (label agreement / vote counts / predictive entropy for
                 the first test meshes; VAE runs only)
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--id", type=str, required=True)
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--experiment", type=str, default="standard")
    parser.add_argument("--mesh", type=str, default=None)
    parser.add_argument("--mesh2", type=str, default=None)
    parser.add_argument("--landmarks", type=str, default=None)
    parser.add_argument("--procedure", type=str, default="monobloc")
    parser.add_argument("--pairs_root", type=str, default=None,
                        help="prepost_batch: directory of pre/post meshes")
    parser.add_argument("--pairs_excel", type=str, default=None,
                        help="prepost_batch: xlsx/csv pair table")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu); the axon "
                             "TPU plugin ignores JAX_PLATFORMS")
    args = parser.parse_args()

    output_dir = os.path.join(args.output_path, "outputs", args.id)
    config_path = os.path.join(output_dir, "config.yaml")
    if not os.path.exists(config_path):
        raise SystemExit(f"no run found at {output_dir} "
                         "(missing config.yaml — train first)")

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    setup_jax(platform=args.platform)

    from craniofacialsd_vae_tpu.analysis.tester import Tester
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager
    from craniofacialsd_vae_tpu.utils import get_config

    config = get_config(config_path)
    manager = ModelManager(
        config, precomputed_storage_path=config["data"]["precomputed_path"])

    train_set, val_set, test_set, normalization, class_weights = \
        build_datasets(config, manager.template)
    manager.set_class_conversions_and_weights(class_weights)

    checkpoint_dir = os.path.join(output_dir, "checkpoints")
    manager.resume(checkpoint_dir)

    batch_size = config["optimization"]["batch_size"]
    train_iter = BatchIterator(train_set, batch_size, shuffle=False)
    test_iter = BatchIterator(test_set, batch_size, shuffle=False,
                              drop_last=False)

    tester = Tester(manager, normalization, train_iter, test_iter,
                    output_dir, config)

    exp = args.experiment
    if exp == "standard":
        metrics = tester()
        print(json.dumps(metrics, indent=1))
    elif exp == "traversals":
        tester.latent_traversals(use_z_stats=False)
    elif exp == "embeddings":
        tester.plot_embeddings()
    elif exp == "generation":
        tester.random_generation_and_rendering()
        tester.random_generation_and_save()
    elif exp == "classifiers":
        print(json.dumps(tester.test_classifiers(), indent=1))
    elif exp == "refit_classifiers":
        # refit the zoo from the resumed model's latents (e.g. after a
        # classifier-solver change), save, and regenerate the metrics
        val_iter = BatchIterator(val_set, batch_size, shuffle=False,
                                 drop_last=False)
        manager.train_and_validate_classifiers(
            train_iter, val_iter, checkpoint_dir=checkpoint_dir)
        print(json.dumps(tester.test_classifiers(), indent=1))
    elif exp == "recon":
        print(json.dumps(tester.reconstruction_errors(), indent=1))
    elif exp == "interpolate":
        # reference semantics (test.py:544-567): first test mesh vs the most
        # different test mesh. tester.interpolate expects RAW vertices (it
        # normalizes internally), so only un-normalize when the split
        # arrays are actually normalized.
        import numpy as np
        if config["data"].get("normalize_data", True):
            def raw(x):
                return x * normalization["std"] + normalization["mean"]
        else:
            def raw(x):
                return x
        x0 = raw(test_set.x[0])
        dists = [float(np.mean((test_set.x[0] - test_set.x[i]) ** 2))
                 for i in range(len(test_set))]
        x1 = raw(test_set.x[int(np.argmax(dists))])
        tester.interpolate(x0, x1)
        print("interpolations written")
    elif exp == "classify_and_project":
        assert args.mesh, "--mesh required"
        tester.classify_and_project(args.mesh)
    elif exp == "planning":
        assert args.mesh, "--mesh required"
        out = tester.interpolate_syndrome_to_normal(args.mesh)
        print("planned latents:", {k: v.shape for k, v in out.items()
                                   if hasattr(v, "shape")})
    elif exp == "prepost":
        assert args.mesh and args.mesh2, "--mesh and --mesh2 required"
        metrics = tester.evaluate_pre_post_pair(
            args.mesh, args.mesh2, "cli", args.procedure)
        print(json.dumps(
            {k: (v if not isinstance(v, dict) else "…")
             for k, v in metrics.items()}, indent=1, default=str))
        tester.compute_and_save_postop_mesh_colourmap(args.mesh, args.mesh2)
    elif exp == "prepost_batch":
        # the reference's default experiment (test.py:1495-1497): every
        # pre/post pair listed in an xlsx/csv table, with per-syndrome
        # region-metric boxplots (incl. the angle variants)
        assert args.pairs_root and args.pairs_excel, \
            "--pairs_root and --pairs_excel required"
        tester.evaluate_all_pre_post_pairs_in_excel(args.pairs_root,
                                                    args.pairs_excel)
        print("pre/post batch evaluation written to "
              f"{os.path.join(output_dir, 'pre_post_eval_plots')}")
    elif exp == "saliency":
        # gradient attribution of the QDA diagnosis for the first test
        # meshes (new surface — the reference offers no explanation of
        # its classifier outputs)
        reports = tester.saliency_maps()
        print(json.dumps([{k: v for k, v in r.items() if k != "regions"}
                          | {"top_regions": [x["attribute"]
                                             for x in r["regions"][:3]]}
                          for r in reports], indent=1))
        print(f"saliency PLYs/renders written to "
              f"{os.path.join(output_dir, 'saliency')}")
    elif exp == "uncertainty":
        # posterior-sampling uncertainty of the diagnosis (new surface —
        # the reference's diagnosis is a bare point label)
        reports = tester.diagnosis_uncertainty()
        print(json.dumps([{k: r[k] for k in
                           ("mesh", "label", "label_agreement",
                            "predictive_entropy_nats", "flagged")}
                          for r in reports], indent=1))
        print(f"uncertainty report written to "
              f"{os.path.join(output_dir, 'uncertainty')}")
    elif exp == "fit":
        assert args.mesh and args.landmarks, "--mesh + --landmarks required"
        result = tester.fit_mesh(args.mesh, args.landmarks,
                                 save_artifacts=True)
        print({k: v for k, v in result.items()
               if not hasattr(v, "shape") or v.size < 10})
        print(f"fitted mesh + aligned scan written to "
              f"{os.path.join(output_dir, 'fit')}")
    else:
        raise SystemExit(f"unknown experiment {exp}")


if __name__ == "__main__":
    main()
