"""Interleaved A/B of the full scanned train step at batch 4 (grid 16)
vs batch 8 (grid 64) under the shipped flagship policy.

    python benchmarks/batch_ab.py [--trials 4] [--compute_dtype mixed]

Motivation: the step's gather-row COUNT is batch-independent while row
WIDTH scales with the grid, so per-mesh cost depends on how the gather
rate scales with row bytes. For the fp32 formulation the ≥512-element
rows were already at byte rate, which made grid 64 exactly linear
(round-2 grid-scaling table) — no amortization. The mixed policy moved
the dominant rows to bf16, and gather_dtype_probe measured bf16 rows at
HIGHER effective bandwidth when widened to the grid-64 classes (2048 el:
312 GB/s vs 246 at 512; per-mesh 0.79×), so batch 8 may now beat batch 4
per mesh. This measures the real step, interleaved so both batch sizes
see the same contention regime.

NB batch_size is a training hyperparameter (the swap grid is the
disentanglement signal); a throughput-optimal batch is only usable where
the hyperparameter is free to change. The flagship/bench config stays at
the reference's batch 4 regardless — this probe documents the scaling.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=4)
    parser.add_argument("--compute_dtype", type=str, default=None,
                        help="override; default = flagship craniofacial.yaml")
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_geometry
    from craniofacialsd_vae_tpu.models import init_sdvae
    from craniofacialsd_vae_tpu.training import (LossWeights,
                                                 create_train_state,
                                                 make_scanned_train_step)
    from craniofacialsd_vae_tpu.utils import flagship_sdvae_config

    geom = _flagship_geometry()
    rng = np.random.default_rng(0)
    config = flagship_sdvae_config(REPO)
    if args.compute_dtype:
        import dataclasses
        config = dataclasses.replace(config, compute_dtype=args.compute_dtype)
    print(f"compute_dtype={config.compute_dtype}")

    from benchmarks._common import (MATMUL_QUIET_MS, make_matmul_canary,
                                    make_stream_canary)
    matmul_ms = make_matmul_canary(rng)
    stream_ms = make_stream_canary(rng)
    print(f"contention factor {matmul_ms() / MATMUL_QUIET_MS:.2f}x "
          f"(stream {stream_ms():.2f} ms)")

    weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
    opt = optax.adamw(1e-4, weight_decay=0.0)
    N0 = geom.spirals[0].num_vertices
    n_data = 32
    data = jnp.asarray(rng.normal(size=(n_data, N0, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    variants = {}
    for B in (4, 8):
        epoch = make_scanned_train_step(config, weights, opt,
                                        batch_size=B, swap=True)
        # fresh params per variant: the scanned step donates its state, so
        # two states must not alias the same underlying buffers
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        variants[B] = {"epoch": epoch,
                       "state": create_train_state(params, opt)}

    def run_steps(B, n_steps):
        v = variants[B]
        idx = jnp.asarray(rng.integers(0, n_data, size=(n_steps, B)),
                          jnp.int32)
        t0 = time.perf_counter()
        v["state"], m = v["epoch"](v["state"], geom, data, idx,
                                   jnp.arange(n_steps), None, None, key)
        float(m["tot"])
        return time.perf_counter() - t0

    # grid-64 steps are ~4x the work of grid-16: scale scan lengths so
    # each variant's slope covers comparable device time
    lengths = {4: (10, 60), 8: (4, 18)}
    for B in variants:
        run_steps(B, lengths[B][0])
        run_steps(B, lengths[B][1])

    results = {B: [] for B in variants}
    for _ in range(args.trials):
        for B in variants:             # interleaved: same weather for both
            ns, nl = lengths[B]
            ts = run_steps(B, ns)
            tl = run_steps(B, nl)
            results[B].append((tl - ts) / (nl - ns) * 1e3)

    per_mesh = {}
    for B, times in results.items():
        best = min(times)
        G = B * B
        per_mesh[B] = best / G
        print(f"  batch {B} (grid {G:3d}): best {best:7.2f} ms/step "
              f"= {best / G:6.3f} ms/mesh ({G / best * 1e3:6.0f} meshes/s)"
              f"  trials " + " ".join(f"{t:.2f}" for t in times))
    print(f"  batch-8 per-mesh advantage: {per_mesh[4] / per_mesh[8]:.3f}x")
    print(f"contention factor after {matmul_ms() / MATMUL_QUIET_MS:.2f}x "
          f"(stream {stream_ms():.2f} ms)")


if __name__ == "__main__":
    main()
