"""Interleaved A/B of the full scanned train step: compute_dtype float32
vs "mixed" (level-0 fp32, deep levels bf16).

    python benchmarks/mixed_ab.py [--batch 4] [--trials 4]

Motivation: the step is gather-ROW-throughput-bound and bf16 halves row
bytes; isolated probes (gather_dtype_probe.py) measured bf16 rows 1.33x
faster at width 512 and 2.1x at width 1024, while 48-float rows get
slower — hence the mixed policy. This measures the end-to-end effect on
the production scanned-epoch program, interleaved so both variants see
the same contention regime.
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
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--trials", type=int, default=4)
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_geometry
    from craniofacialsd_vae_tpu.models import SDVAEConfig, init_sdvae
    from craniofacialsd_vae_tpu.training import (LossWeights,
                                                 create_train_state,
                                                 make_scanned_train_step)

    geom = _flagship_geometry()
    rng = np.random.default_rng(0)
    B = args.batch
    G = B * B

    from benchmarks._common import MATMUL_QUIET_MS, make_matmul_canary
    matmul_ms = make_matmul_canary(rng)
    print(f"contention factor {matmul_ms() / MATMUL_QUIET_MS:.2f}x")

    weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
    opt = optax.adamw(1e-4, weight_decay=0.0)
    N0 = geom.spirals[0].num_vertices
    n_data = 32
    data = jnp.asarray(rng.normal(size=(n_data, N0, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    variants = {}
    for name in ("float32", "mixed"):
        config = SDVAEConfig(compute_dtype=name)
        params = init_sdvae(jax.random.PRNGKey(0), config, geom)
        epoch = make_scanned_train_step(config, weights, opt,
                                        batch_size=B, swap=True)
        state = create_train_state(params, opt)
        variants[name] = {"epoch": epoch, "state": state}

    def run_steps(name, n_steps):
        v = variants[name]
        idx = jnp.asarray(rng.integers(0, n_data, size=(n_steps, B)),
                          jnp.int32)
        t0 = time.perf_counter()
        v["state"], m = v["epoch"](v["state"], geom, data, idx,
                                   jnp.arange(n_steps), None, None, key)
        tot = float(m["tot"])
        return time.perf_counter() - t0, tot

    # compile + warm both
    for name in variants:
        run_steps(name, 10)
        run_steps(name, 60)

    results = {n: [] for n in variants}
    finals = {}
    for _ in range(args.trials):
        for name in variants:          # interleaved: same weather for both
            ts, _ = run_steps(name, 10)
            tl, tot = run_steps(name, 60)
            results[name].append((tl - ts) / 50 * 1e3)
            finals[name] = tot

    for name, times in results.items():
        best = min(times)
        print(f"  {name:8s}: best {best:6.2f} ms/step "
              f"({G / best * 1e3:6.0f} meshes/s)  trials "
              + " ".join(f"{t:.2f}" for t in times)
              + f"  final tot {finals[name]:.4f}")
    sp = min(results["float32"]) / min(results["mixed"])
    print(f"  mixed speedup: {sp:.3f}x")
    print(f"contention factor after {matmul_ms() / MATMUL_QUIET_MS:.2f}x")


if __name__ == "__main__":
    main()
