#!/usr/bin/env python
"""Train a deep ensemble: K independent SD-VAEs over one config in ONE
compiled dispatch per epoch chunk (training/ensemble.py — jax.vmap over
the member axis of the multi-epoch nested scan).

    python tools/train_ensemble.py --config=configurations/smoke.yaml \
        --id=smoke_ens --members 4 [--epochs E] [--seed 0] [--platform cpu]

Writes K standard run directories

    outputs/<id>/member_00/{config.yaml, checkpoints/, z_stats.npz}
    ...
    outputs/<id>/ensemble.json          (manifest + per-member metrics)

each indistinguishable from a `train.py` run with seed = base_seed + i
(same init, same swap/reparameterization stream, same epoch plans —
tests/test_ensemble.py pins the parity member-for-member), so every
member serves through the whole stack: `test.py --id=<id>/member_00`,
DiagnosisService.from_run_dir, export. Cross-member consensus for a
batch of scans comes from analysis.uncertainty.summarize_ensemble over
the members' diagnose() reports.

The reference has no ensemble story (one train.py run = one model).
Device time is near-linear in K (the step is gather-bound — measured
per-member cost 0.86-1.09× of a solo run, benchmarks/ensemble_ab.py);
the savings are the K-1 compiles, host loops and dispatch round-trips
that K sequential runs would pay.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description="deep-ensemble SD-VAE training (one vmapped dispatch)")
    parser.add_argument("--config", type=str,
                        default="configurations/smoke.yaml")
    parser.add_argument("--id", type=str, default="ensemble")
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--members", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0,
                        help="member i trains as seed+i (train.py parity)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override optimization.epochs")
    parser.add_argument("--chunk_epochs", type=int, default=25,
                        help="epochs per compiled dispatch (one host "
                             "round-trip per chunk)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu); the axon "
                             "TPU plugin ignores JAX_PLATFORMS")
    parser.add_argument("--virtual_devices", type=int, default=None)
    parser.add_argument("--shard_members", action="store_true",
                        help="shard the member axis over the device mesh "
                             "(members are independent, so the "
                             "partitioned program has no collectives — "
                             "near-perfect scaling). The mesh trims to "
                             "min(devices, K, --shard_devices); --members "
                             "must be a multiple of that mesh size")
    parser.add_argument("--shard_devices", type=int, default=None,
                        help="cap the member-mesh size used by "
                             "--shard_members (default: min(devices, K))")
    args = parser.parse_args()

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count="
            f"{args.virtual_devices}")

    from craniofacialsd_vae_tpu.utils import get_config, save_config_snapshot
    from craniofacialsd_vae_tpu.utils.runtime import setup_jax

    jax = setup_jax(platform=args.platform)

    from craniofacialsd_vae_tpu.analysis.tester import compute_latent_stats
    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     DeviceBatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager
    from craniofacialsd_vae_tpu.models.mlp import init_mlp
    from craniofacialsd_vae_tpu.training import (LOSS_KEYS,
                                                 assemble_epoch_plans)
    from craniofacialsd_vae_tpu.training.ensemble import (
        ensemble_epoch_keys, init_ensemble_state,
        make_ensemble_scanned_epochs, member_state)

    config = get_config(args.config)
    if args.epochs is not None:
        config["optimization"]["epochs"] = args.epochs
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
        raise SystemExit("ensemble training needs epoch_plan iterators")

    # end2end classifier heads stack per member like the net params;
    # sizes read off the manager's own head so the contracts (loud class
    # counting, classifier.n_classes override) stay in one place
    clf_init = None
    if manager._mlp_end2end:
        n_classes = int(manager.state.clf_params[-1]["b"].shape[-1])
        hidden = config["classifier"]["mlp_hidden_features"]
        latent = int(config["model"]["latent_size"])
        clf_init = lambda k: init_mlp(k, latent, hidden, n_classes)  # noqa: E731

    members = int(args.members)
    state = init_ensemble_state(manager.net_config, manager.geometry,
                                manager.optimizer, members,
                                base_seed=args.seed, clf_init=clf_init,
                                clf_optimizer=manager.clf_optimizer)
    keys = ensemble_epoch_keys(members, base_seed=args.seed)
    if args.shard_members:
        from craniofacialsd_vae_tpu.parallel import (make_member_mesh,
                                                     shard_member_axis)
        n_mesh = min(len(jax.devices()), members)
        if args.shard_devices:
            n_mesh = min(n_mesh, args.shard_devices)
        mesh = make_member_mesh(n_mesh)
        try:
            state = shard_member_axis(mesh, state)
            keys = shard_member_axis(mesh, keys)
        except ValueError as e:
            raise SystemExit(f"--shard_members: {e}")
        print(f"member axis sharded over {mesh.devices.size} devices "
              f"({members // mesh.devices.size} members/device)")
    ens_fn = make_ensemble_scanned_epochs(
        manager.net_config, manager.loss_weights, manager.optimizer,
        batch_size, swap=manager.swap_features,
        clf_optimizer=manager.clf_optimizer)

    epochs = int(config["optimization"]["epochs"])
    print(f"ensemble {args.id}: {members} members × {epochs} epochs, "
          f"{len(train_set)} train / {len(val_set)} val meshes, "
          f"seeds {args.seed}..{args.seed + members - 1}")
    t0 = time.time()
    step_counter = 0
    done = 0
    last_va = None
    while done < epochs:
        n_ep = min(int(args.chunk_epochs), epochs - done)
        # shared plans: every member sees the same batches in the same
        # order (the manager's scanned-epoch assembly — one definition,
        # training.assemble_epoch_plans, so the step-id/key schedule the
        # member-parity contract depends on cannot drift)
        plan_args, step_counter = assemble_epoch_plans(
            train_iter, val_iter, n_ep, step_counter,
            with_labels=manager._mlp_end2end)
        state, tr_m, va_m = ens_fn(state, manager.geometry, *plan_args,
                                   manager._class_weights, keys)
        va_m = jax.device_get(va_m)                   # one sync per chunk
        done += n_ep
        last_va = {k: np.asarray(va_m[k])[:, -1] for k in LOSS_KEYS}
        tots = " ".join(f"{v:.4f}" for v in last_va["tot"])
        print(f"epoch {done}/{epochs} val tot per member: [{tots}] "
              f"({time.time() - t0:.1f}s)")

    # ---- per-member run dirs: checkpoints + classifier zoo + stats ----
    # same iterator construction as train.py's classifier fit (incl. the
    # drop_last default) so a member's reported val accuracy matches what
    # the same seed through train.py would report
    clf_train = BatchIterator(train_set, batch_size, shuffle=False,
                              class2idx=manager._class2idx_dict)
    clf_val = BatchIterator(val_set, batch_size, shuffle=False,
                            class2idx=manager._class2idx_dict)
    manifest = {"members": [], "seeds": list(range(
        args.seed, args.seed + members)), "epochs": epochs,
        "config": os.path.abspath(args.config)}
    for i in range(members):
        mdir = os.path.join(output_dir, f"member_{i:02d}")
        ckpt = os.path.join(mdir, "checkpoints")
        os.makedirs(ckpt, exist_ok=True)
        save_config_snapshot(args.config, mdir)
        manager.state = member_state(state, i)
        # per-member latents/zoo: clear everything the previous member
        # cached on the shared manager
        manager.classifiers = None
        manager._train_latents = None
        manager._train_labels = None
        manager.save_weights(ckpt, epochs - 1)
        accs = manager.train_and_validate_classifiers(clf_train, clf_val,
                                                      checkpoint_dir=ckpt)
        compute_latent_stats(manager, mdir)
        entry = {"dir": f"member_{i:02d}", "seed": args.seed + i,
                 "val_tot": float(last_va["tot"][i])}
        if accs:
            entry["val_accuracy"] = {k: float(v) for k, v in accs.items()}
        manifest["members"].append(entry)
        print(f"member {i}: saved {mdir}")
    with open(os.path.join(output_dir, "ensemble.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"done in {time.time() - t0:.1f}s → {output_dir} "
          f"({members} member run dirs + ensemble.json)")


if __name__ == "__main__":
    main()
