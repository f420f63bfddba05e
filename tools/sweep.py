#!/usr/bin/env python
"""Hyperparameter sweep: K optimization variants of one config trained in
ONE compiled dispatch per epoch chunk (training/sweep.py — jax.vmap over
the variant axis with the loss weights and optimizer lr / weight_decay as
traced per-variant scalars).

    python tools/sweep.py --config=configurations/smoke.yaml --id=sw1 \
        --vary lr=1e-4,3e-4,1e-3 --vary kl_weight=1e-4,1e-3 \
        [--epochs E] [--select reconstruction] [--platform cpu]

The grid is the cartesian product of the --vary axes (6 variants above).
Every variant starts from the SAME initialization and consumes the SAME
batch order and swap/reparameterization noise — the comparison isolates
the hyperparameters (variant i is bit-comparable to a solo train.py run
with those values; tests/test_sweep.py pins the parity). Writes K
standard run directories

    outputs/<id>/variant_00/{config.yaml, checkpoints/, z_stats.npz}
    ...
    outputs/<id>/sweep.json      (per-variant hyperparams + final val
                                  metrics + classifier accuracies,
                                  ranked by --select)

each config.yaml snapshot carrying that variant's overridden values, so
every variant run dir evaluates (test.py), serves (tools/serve.py) and
exports like any train.py run.

Sweepable keys: lr, weight_decay, kl_weight, laplacian_weight,
latent_consistency_weight, latent_consistency_eta1/eta2 — the
optimization scalars that share one compiled program. Structural keys
(batch_size, model.*, epochs) are rejected; sweep those as separate runs.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_vary(specs: list[str]) -> list[dict]:
    """--vary key=v1,v2,... axes → the grid's override dicts."""
    axes = []
    seen_keys = set()
    for spec in specs:
        if "=" not in spec:
            raise SystemExit(f"--vary expects key=v1,v2,...; got {spec!r}")
        key, _, vals = spec.partition("=")
        key = key.strip().removeprefix("optimization.")
        if key in seen_keys:
            # dict(combo) would silently keep only the last axis's value,
            # shrinking the grid — put all values on ONE axis instead
            raise SystemExit(
                f"--vary {key} given twice; list all its values in one "
                f"axis: --vary {key}=v1,v2,...")
        seen_keys.add(key)
        try:
            values = [float(v) for v in vals.split(",") if v.strip() != ""]
        except ValueError:
            raise SystemExit(f"--vary {key}: non-numeric value in {vals!r}")
        if not values:
            raise SystemExit(f"--vary {key}: no values")
        axes.append([(key, v) for v in values])
    if not axes:
        raise SystemExit("need at least one --vary axis")
    return [dict(combo) for combo in itertools.product(*axes)]


def main():
    parser = argparse.ArgumentParser(
        description="one-dispatch hyperparameter sweep over one config")
    parser.add_argument("--config", type=str,
                        default="configurations/smoke.yaml")
    parser.add_argument("--id", type=str, default="sweep")
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--vary", action="append", default=[],
                        metavar="KEY=V1,V2,...",
                        help="sweep axis over an optimization key; the "
                             "grid is the product of all --vary axes")
    parser.add_argument("--seed", type=int, default=0,
                        help="shared by every variant (same init + noise "
                             "stream — the comparison isolates the "
                             "hyperparameters)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override optimization.epochs")
    parser.add_argument("--chunk_epochs", type=int, default=25,
                        help="epochs per compiled dispatch")
    parser.add_argument("--select", type=str, default="reconstruction",
                        help="validation metric the ranking minimizes "
                             "(reconstruction compares across variants; "
                             "tot does not — each variant weighs it with "
                             "its own hyperparameters)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu); the axon "
                             "TPU plugin ignores JAX_PLATFORMS")
    parser.add_argument("--virtual_devices", type=int, default=None)
    parser.add_argument("--shard_members", action="store_true",
                        help="shard the variant axis over the device mesh "
                             "(variants are independent, so the "
                             "partitioned program has no collectives — "
                             "near-perfect scaling). The mesh trims to "
                             "min(devices, K, --shard_devices); the grid "
                             "size K must be a multiple of that mesh size")
    parser.add_argument("--shard_devices", type=int, default=None,
                        help="cap the member-mesh size used by "
                             "--shard_members (default: min(devices, K))")
    args = parser.parse_args()

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count="
            f"{args.virtual_devices}")

    overrides = parse_vary(args.vary)
    if len(overrides) > 64:
        print(f"warning: {len(overrides)}-variant grid — all variants "
              "train concurrently on one chip; memory scales with K")

    import yaml

    from craniofacialsd_vae_tpu.utils import get_config
    from craniofacialsd_vae_tpu.utils.runtime import setup_jax

    jax = setup_jax(platform=args.platform)

    from craniofacialsd_vae_tpu.analysis.tester import compute_latent_stats
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     DeviceBatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager
    from craniofacialsd_vae_tpu.training import (LOSS_KEYS,
                                                 assemble_epoch_plans)
    from craniofacialsd_vae_tpu.training.sweep import (
        build_variants, init_sweep_state, make_sweep_scanned_epochs,
        stack_hyperparams, variant_state)

    config = get_config(args.config)
    if args.epochs is not None:
        config["optimization"]["epochs"] = args.epochs
    if config.get("classifier", {}).get("mlp_training_type") == "end2end":
        raise SystemExit(
            "sweep.py trains the net hyperparameters; end2end classifier "
            "heads are not swept — use mlp_training_type: after (the "
            "post-hoc zoo is fitted per variant) or train.py per setting")
    # classification losses are constant 0.0 in a sweep (no end2end head)
    # and accuracy ranks the wrong way under a minimizing sort
    selectable = [k for k in LOSS_KEYS
                  if not k.startswith("classification")]
    if args.select not in selectable:
        raise SystemExit(f"--select must be one of {selectable}")
    if int(config["optimization"]["epochs"]) < 1:
        raise SystemExit("optimization.epochs (or --epochs) must be >= 1")
    if int(args.chunk_epochs) < 1:
        raise SystemExit("--chunk_epochs must be >= 1")

    variants = build_variants(config, overrides)
    hp = stack_hyperparams(variants)
    k = len(variants)
    output_dir = os.path.join(args.output_path, "outputs", args.id)
    os.makedirs(output_dir, exist_ok=True)

    print(f"devices: {jax.devices()}")
    manager = ModelManager(
        config, precomputed_storage_path=config["data"]["precomputed_path"],
        seed=args.seed)
    train_set, val_set, test_set, normalization, class_weights = \
        build_datasets(config, manager.template)
    manager.set_class_conversions_and_weights(class_weights)

    batch_size = manager.batch_size
    device_resident = train_set.x.nbytes < 1 << 30
    make_iter = DeviceBatchIterator if device_resident else BatchIterator
    train_iter = make_iter(train_set, batch_size, shuffle=True,
                           class2idx=manager._class2idx_dict)
    val_iter = make_iter(val_set, batch_size, shuffle=True,
                         class2idx=manager._class2idx_dict)
    if not (hasattr(train_iter, "epoch_plan")
            and hasattr(val_iter, "epoch_plan")):
        raise SystemExit("sweep training needs epoch_plan iterators")

    state = init_sweep_state(manager.net_config, manager.geometry, k,
                             seed=args.seed)
    if args.shard_members:
        from craniofacialsd_vae_tpu.parallel import (make_member_mesh,
                                                     shard_member_axis)
        n_mesh = min(len(jax.devices()), k)
        if args.shard_devices:
            n_mesh = min(n_mesh, args.shard_devices)
        mesh = make_member_mesh(n_mesh)
        try:
            state = shard_member_axis(mesh, state)
            hp = shard_member_axis(mesh, hp)
        except ValueError as e:
            raise SystemExit(f"--shard_members: {e}")
        print(f"variant axis sharded over {mesh.devices.size} devices "
              f"({k // mesh.devices.size} variants/device)")
    sweep_fn = make_sweep_scanned_epochs(manager.net_config, batch_size,
                                         swap=manager.swap_features)
    epoch_key = jax.random.PRNGKey(args.seed + 1)   # manager's contract,
    # shared by every variant: identical swap draws and reparam noise

    epochs = int(config["optimization"]["epochs"])
    print(f"sweep {args.id}: {k} variants × {epochs} epochs over "
          f"{len(train_set)} train / {len(val_set)} val meshes; axes: "
          + " ".join(args.vary))
    t0 = time.time()
    step_counter = 0
    done = 0
    last_va = None
    while done < epochs:
        n_ep = min(int(args.chunk_epochs), epochs - done)
        # shared plans: every variant sees the same batches in the same
        # order (the manager's scanned-epoch assembly — one definition,
        # training.assemble_epoch_plans, so the step-id/key schedule the
        # variant-parity contract depends on cannot drift)
        plan_args, step_counter = assemble_epoch_plans(
            train_iter, val_iter, n_ep, step_counter)
        state, tr_m, va_m = sweep_fn(state, hp, manager.geometry,
                                     *plan_args, manager._class_weights,
                                     epoch_key)
        va_m = jax.device_get(va_m)                   # one sync per chunk
        done += n_ep
        last_va = {key: np.asarray(va_m[key])[:, -1] for key in LOSS_KEYS}
        sel = " ".join(f"{v:.4f}" for v in last_va[args.select])
        print(f"epoch {done}/{epochs} val {args.select} per variant: "
              f"[{sel}] ({time.time() - t0:.1f}s)")

    # ---- per-variant run dirs: snapshot + checkpoints + zoo + stats ----
    clf_train = BatchIterator(train_set, batch_size, shuffle=False,
                              class2idx=manager._class2idx_dict)
    clf_val = BatchIterator(val_set, batch_size, shuffle=False,
                            class2idx=manager._class2idx_dict)
    manifest = {"variants": [], "select": args.select, "seed": args.seed,
                "epochs": epochs, "config": os.path.abspath(args.config),
                "axes": list(args.vary)}
    for i, (vcfg, ov) in enumerate(zip(variants, overrides)):
        vdir = os.path.join(output_dir, f"variant_{i:02d}")
        ckpt = os.path.join(vdir, "checkpoints")
        os.makedirs(ckpt, exist_ok=True)
        # the snapshot must carry THIS variant's values (test.py/serving
        # re-read it), so dump the merged dict instead of copying the base
        with open(os.path.join(vdir, "config.yaml"), "w") as f:
            yaml.safe_dump(vcfg, f)
        wd = float(vcfg["optimization"].get("weight_decay", 0.0))
        manager.state = variant_state(state, i, wd)
        # per-variant latents/zoo: clear what the previous variant cached
        manager.classifiers = None
        manager._train_latents = None
        manager._train_labels = None
        manager.save_weights(ckpt, epochs - 1)
        accs = manager.train_and_validate_classifiers(clf_train, clf_val,
                                                      checkpoint_dir=ckpt)
        compute_latent_stats(manager, vdir)
        entry = {"dir": f"variant_{i:02d}",
                 "overrides": {key: float(vcfg["optimization"][key])
                               for key in sorted(set().union(*overrides))},
                 "val": {key: float(last_va[key][i]) for key in LOSS_KEYS}}
        if accs:
            entry["val_accuracy"] = {key: float(v)
                                     for key, v in accs.items()}
        manifest["variants"].append(entry)
        print(f"variant {i}: {entry['overrides']} → val {args.select} "
              f"{entry['val'][args.select]:.5f} ({vdir})")
    # the manifest lists variants RANKED by --select (best first), as
    # documented; grid order is recoverable from each entry's dir index
    manifest["variants"] = sorted(manifest["variants"],
                                  key=lambda v: v["val"][args.select])
    manifest["best"] = manifest["variants"][0]
    with open(os.path.join(output_dir, "sweep.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    best = manifest["best"]
    print(f"best: {best['dir']} {best['overrides']} "
          f"(val {args.select} {best['val'][args.select]:.5f}); "
          f"done in {time.time() - t0:.1f}s → {output_dir}")


if __name__ == "__main__":
    main()
