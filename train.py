"""Training entry point (reference train.py analog).

    python train.py --config=configurations/craniofacial.yaml --id=my_run \
        [--output_path=.] [--resume]

Builds outputs/<id>/{checkpoints,logs}, snapshots the config, trains the
SD-VAE with the jitted TPU train step (single chip) or the sharded
data-parallel step (--data_parallel over all visible devices), logs losses
to TensorBoard, checkpoints on the reference cadence, then fits the latent
classifier zoo and caches latent stats.
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configurations/craniofacial.yaml")
    parser.add_argument("--id", type=str, default="none",
                        help="experiment id (default: config basename)")
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the batch over all visible devices")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host (DCN) data parallelism: "
                             "jax.distributed.initialize, global mesh over "
                             "all hosts' devices, per-host batch slices "
                             "(launch the same command on every host)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port for --multihost "
                             "(omit on TPU pods, which auto-configure)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        help="force the jax platform (e.g. cpu); the axon "
                             "TPU plugin ignores JAX_PLATFORMS so this goes "
                             "through jax.config")
    parser.add_argument("--virtual_devices", type=int, default=None,
                        help="with --platform=cpu: provision N virtual "
                             "host devices (sharding smoke tests)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override optimization.epochs")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of epoch 1 into "
                             "outputs/<id>/profile")
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils import (get_config, prepare_sub_folder,
                                              save_config_snapshot)

    config = get_config(args.config)
    if args.epochs is not None:
        config["optimization"]["epochs"] = args.epochs

    model_name = args.id if args.id != "none" else \
        os.path.splitext(os.path.basename(args.config))[0]
    output_dir = os.path.join(args.output_path, "outputs", model_name)
    checkpoint_dir = prepare_sub_folder(output_dir)
    save_config_snapshot(args.config, output_dir)

    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(os.path.join(output_dir, "logs"))
    except ImportError:
        from craniofacialsd_vae_tpu.viz.logging import JsonlWriter
        writer = JsonlWriter(os.path.join(output_dir, "logs"))

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.virtual_devices}")

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax(platform=args.platform)

    if args.multihost:
        from craniofacialsd_vae_tpu.parallel import initialize_multihost
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    print(f"devices: {jax.devices()}")

    from craniofacialsd_vae_tpu.data.dataset import (BatchIterator,
                                                     DeviceBatchIterator,
                                                     build_datasets)
    from craniofacialsd_vae_tpu.manager import ModelManager

    manager = ModelManager(
        config, precomputed_storage_path=config["data"]["precomputed_path"])

    train_set, val_set, test_set, normalization, class_weights = \
        build_datasets(config, manager.template)
    manager.set_class_conversions_and_weights(class_weights)

    batch_size = config["optimization"]["batch_size"]
    if args.data_parallel or args.multihost:
        manager.enable_data_parallel()
        batch_size *= jax.device_count()
    # keep small in-memory splits resident on device (per-step H2D uploads
    # otherwise dominate the epoch); the data-parallel scanned path
    # replicates the resident split over the mesh and shards only the
    # per-step index plan. Multihost feeds host arrays (per-host slices).
    device_resident = (not args.multihost and train_set.x.nbytes < 1 << 30)
    make_iter = DeviceBatchIterator if device_resident else BatchIterator
    train_iter = make_iter(train_set, batch_size, shuffle=True,
                           class2idx=manager._class2idx_dict)
    val_iter = make_iter(val_set, batch_size, shuffle=True,
                         class2idx=manager._class2idx_dict)
    if args.multihost:
        # every process iterates the same global order (same seed) and
        # feeds only its local slice of each batch
        from craniofacialsd_vae_tpu.parallel import MultihostBatchIterator
        train_iter = MultihostBatchIterator(train_iter, manager.mesh)
        val_iter = MultihostBatchIterator(val_iter, manager.mesh)

    # rendering/logging consume host arrays; under multihost take the
    # host-local base batch (the global jax.Array isn't fully addressable
    # on any single process)
    vis_batch = next(iter(train_iter.base if args.multihost else train_iter))
    # None (skip the grid) rather than a silent train-batch fallback — a
    # validation panel showing training meshes misrepresents generalization
    val_vis_batch = next(
        iter(val_iter.base if args.multihost else val_iter), None)
    if val_vis_batch is None:
        print("warning: validation split yields no batch at this global "
              "batch size — validation image grids disabled")
    is_primary = jax.process_index() == 0
    # Mid-training eval (traversals + image grids) runs single-process
    # jit on the current params. Under a REAL multi-process run the params
    # are sharded over the global mesh — a primary-only computation on
    # them would deadlock/crash the other processes' collectives — and
    # any primary-only iterator draw would desynchronize the processes'
    # shared-seed epoch plans. Checkpoints (plain device_get of
    # replicated leaves) remain primary-only; run the full eval suite
    # post-training via test.py.
    eval_midtrain = is_primary and jax.process_count() == 1

    # in-training evaluation cadence (reference train.py:51, 66-74): a
    # Tester built up front runs latent traversals at every save_weights
    # epoch; stats are lazy so nothing encodes the untrained model
    from craniofacialsd_vae_tpu.analysis.tester import Tester
    tester = Tester(manager, normalization, train_iter, val_iter,
                    output_dir, config, lazy_stats=True)
    start_epoch = manager.resume(checkpoint_dir) if args.resume else 0
    epochs = config["optimization"]["epochs"]
    log_freq = config["logging_frequency"]

    print(f"training {model_name}: {len(train_set)} train / "
          f"{len(val_set)} val meshes, epochs {start_epoch}→{epochs}")
    t0 = time.time()
    # meshes processed per optimizer step: under data parallelism each
    # device builds the B×B swap grid of its LOCAL B meshes
    # (train_parallel.py), so the global grid is n_dev·B² — NOT the
    # squared global batch (which would overstate throughput n_dev×)
    local_b = config["optimization"]["batch_size"]
    n_dev = batch_size // local_b        # 1 unless --data_parallel/--multihost
    grid = n_dev * local_b ** 2 if config["data"].get("swap_features") \
        else batch_size

    print_cad = max(epochs // 10, 1)
    use_chunks = (not args.profile
                  and manager.can_scan_epochs(train_iter, val_iter))
    if use_chunks:
        # Multi-epoch scan: train E epochs (train steps + per-epoch
        # validation) per dispatch — on the tunneled runtime an epoch's
        # host round-trips cost ~10× its compute. One fixed chunk size
        # (gcd of the logging/checkpoint cadences) keeps to ONE compiled
        # program; chunk boundaries land exactly on every cadence.
        import math
        chunk = max(math.gcd(log_freq["tb_renderings"],
                             log_freq["save_weights"]), 1)
        epoch = start_epoch
        while epoch < epochs:
            # align boundaries to absolute chunk multiples so cadence
            # checks fire even when resuming from an unaligned epoch
            stop = min(epoch + chunk - epoch % chunk, epochs)
            te = time.time()
            tr_list, va_list = manager.run_epochs_scanned(
                train_iter, val_iter, stop - epoch)
            # chunk wall time includes per-epoch validation; attribute it
            # by step count weighted by relative cost so the scalar is
            # comparable to the per-step path's train-only throughput. A
            # validation step is forward+losses only — measured ~0.15× a
            # full train step (docs/PERFORMANCE.md grid table: forward
            # 4.1 ms vs full step 32.0 ms); weighting it 1× would credit
            # validation as training and overstate the metric ~(1+Sv/St)×.
            st, sv = len(train_iter), len(val_iter)
            train_frac = st / max(st + 0.15 * sv, 1e-9)
            mps = (st * grid * (stop - epoch)
                   / max((time.time() - te) * train_frac, 1e-9))
            for i, e in enumerate(range(epoch, stop)):
                writer.add_scalar("perf/meshes_per_sec", mps, e + 1)
                for k, v in tr_list[i].items():
                    writer.add_scalar(f"train/{k}", v, e + 1)
                for k, v in va_list[i].items():
                    writer.add_scalar(f"validation/{k}", v, e + 1)
            prev, epoch = epoch, stop
            if epoch % log_freq["tb_renderings"] == 0 and eval_midtrain:
                manager.log_images(vis_batch, writer, epoch - 1,
                                   normalization, "train",
                                   error_max_scale=2)
                if val_vis_batch is not None:
                    manager.log_images(val_vis_batch, writer, epoch - 1,
                                       normalization, "validation",
                                       error_max_scale=2)
            if epoch % log_freq["save_weights"] == 0 and is_primary:
                manager.save_weights(checkpoint_dir, epoch - 1)
                if eval_midtrain:
                    tester.latent_traversals(use_z_stats=False,
                                             save_suffix=str(epoch))
            if epoch // print_cad > prev // print_cad:   # a print beat passed
                dt = time.time() - t0
                print(f"epoch {epoch}/{epochs} "
                      f"tot={manager._losses['tot']:.4f} "
                      f"({dt / (epoch - start_epoch):.2f}s/epoch)")

    # trace the SECOND epoch (the first pays the compiles) — unless only
    # one epoch runs, in which case trace it rather than silently
    # capturing nothing
    profile_epoch = start_epoch + 1 if epochs > start_epoch + 1 \
        else start_epoch
    for epoch in range(epochs if use_chunks else start_epoch, epochs):
        if args.profile and epoch == profile_epoch:
            jax.profiler.start_trace(os.path.join(output_dir, "profile"))
        te = time.time()
        manager.run_epoch(train_iter, train=True)
        steps = len(train_iter)
        writer.add_scalar("perf/meshes_per_sec",
                          steps * grid / max(time.time() - te, 1e-9),
                          epoch + 1)
        manager.log_losses(writer, epoch, "train")
        manager.run_epoch(val_iter, train=False)
        manager.log_losses(writer, epoch, "validation")
        if args.profile and epoch == profile_epoch:
            jax.profiler.stop_trace()

        if (epoch + 1) % log_freq["tb_renderings"] == 0 and eval_midtrain:
            manager.log_images(vis_batch, writer, epoch, normalization,
                               "train", error_max_scale=2)
            if val_vis_batch is not None:
                manager.log_images(val_vis_batch, writer, epoch,
                                   normalization, "validation",
                                   error_max_scale=2)
        if (epoch + 1) % log_freq["save_weights"] == 0 and is_primary:
            manager.save_weights(checkpoint_dir, epoch)
            if eval_midtrain:
                tester.latent_traversals(use_z_stats=False,
                                         save_suffix=str(epoch + 1))
        if (epoch + 1) % max(epochs // 10, 1) == 0:
            dt = time.time() - t0
            print(f"epoch {epoch + 1}/{epochs} "
                  f"tot={manager._losses['tot']:.4f} "
                  f"({dt / (epoch - start_epoch + 1):.2f}s/epoch)")

    if is_primary:
        manager.save_weights(checkpoint_dir, epochs - 1)
    # classifier fitting encodes per-mesh on one device — use the config's
    # batch size, NOT the data-parallel-inflated one (a global batch larger
    # than the val split would drop_last every batch and encode nothing)
    clf_bs = manager.batch_size
    manager.train_and_validate_classifiers(
        BatchIterator(train_set, clf_bs, shuffle=False,
                      class2idx=manager._class2idx_dict),
        BatchIterator(val_set, clf_bs, shuffle=False,
                      class2idx=manager._class2idx_dict),
        writer, checkpoint_dir if is_primary else None)

    from craniofacialsd_vae_tpu.analysis.tester import compute_latent_stats
    compute_latent_stats(manager, output_dir)
    print(f"done in {time.time() - t0:.1f}s → {output_dir}")


if __name__ == "__main__":
    main()
