"""Ensemble-training efficiency A/B: K vmapped members vs K× one member.

    python benchmarks/ensemble_ab.py [--members 2 4 8] [--trials 3]

Measures the SHIPPED flagship scanned train step (craniofacial.yaml
model, real 17,039-vertex geometry, batch 4 → 16-mesh swap grid) as a
single model vs the member-axis vmap
(training.ensemble.make_ensemble_scanned_step), slope-timed and
interleaved per trial so both variants see the same contention regime.

The claim under test (tools/train_ensemble.py docstring): the flagship
step is gather-bound and the net is small, so K members should train for
under K× one member's wall clock — `per_member_cost(K) =
ensemble_ms(K) / (K · single_ms)` < 1. Whatever the number is, it gets
recorded here and in docs/PERFORMANCE.md rather than asserted.
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
    parser.add_argument("--members", type=int, nargs="+", default=[2, 4, 8])
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--batch", type=int, default=4)
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_geometry
    from benchmarks._common import MATMUL_QUIET_MS, make_matmul_canary
    from craniofacialsd_vae_tpu.training import (LossWeights,
                                                 create_train_state,
                                                 make_scanned_train_step)
    from craniofacialsd_vae_tpu.training.ensemble import (
        ensemble_epoch_keys, init_ensemble_state,
        make_ensemble_scanned_step)
    from craniofacialsd_vae_tpu.utils import flagship_sdvae_config

    rng = np.random.default_rng(0)
    matmul_ms = make_matmul_canary(rng)
    print(f"contention factor {matmul_ms() / MATMUL_QUIET_MS:.2f}x")

    geom = _flagship_geometry()
    config = flagship_sdvae_config(REPO)
    opt = optax.adamw(1e-4, weight_decay=0.0)
    weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
    n_verts = geom.region_masks.shape[1]
    batch = args.batch
    n_data = 32
    data = jnp.asarray(rng.normal(size=(n_data, n_verts, 3))
                       .astype(np.float32))
    key = jax.random.PRNGKey(0)

    def plan(steps):
        idx = jnp.asarray(rng.integers(0, n_data, size=(steps, batch))
                          .astype(np.int32))
        sids = jnp.arange(1, steps + 1, dtype=jnp.int32)
        return idx, sids

    def slope_time(run, s_short=10, s_long=60, repeats=2):
        """ms/step from the (long - short) scan-time slope — cancels the
        dispatch+fetch round-trip (benchmarks/_common.py methodology)."""
        best = np.inf
        for _ in range(repeats):
            ts = {}
            for steps in (s_short, s_long):
                t0 = time.perf_counter()
                run(steps)
                ts[steps] = time.perf_counter() - t0
            best = min(best, (ts[s_long] - ts[s_short])
                       / (s_long - s_short) * 1e3)
        return best

    # --- single member -------------------------------------------------
    from craniofacialsd_vae_tpu.models import init_sdvae
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    single_fn = make_scanned_train_step(config, weights, opt,
                                        batch_size=batch, swap=True)
    single_state = [create_train_state(params, opt)]
    plans = {s: plan(s) for s in (10, 60)}

    def run_single(steps):
        idx, sids = plans[steps]
        single_state[0], m = single_fn(single_state[0], geom, data, idx,
                                       sids, None, None, key)
        jax.block_until_ready(m["tot"])

    run_single(10)                                     # compile
    run_single(60)

    results = {}
    ens_states = {}
    ens_fns = {}
    for k in args.members:
        ens_fns[k] = make_ensemble_scanned_step(config, weights, opt,
                                                batch_size=batch, swap=True)
        ens_states[k] = [init_ensemble_state(config, geom, opt, k)]
    keys = {k: ensemble_epoch_keys(k) for k in args.members}

    def run_ens(k, steps):
        idx, sids = plans[steps]
        ens_states[k][0], m = ens_fns[k](ens_states[k][0], geom, data,
                                         idx, sids, None, None, keys[k])
        jax.block_until_ready(m["tot"])

    for k in args.members:
        run_ens(k, 10)                                 # compile
        run_ens(k, 60)

    # interleaved trials: single, then each K, repeated
    single_best = np.inf
    ens_best = {k: np.inf for k in args.members}
    for t in range(args.trials):
        single_best = min(single_best, slope_time(run_single))
        for k in args.members:
            ens_best[k] = min(ens_best[k],
                              slope_time(lambda s, kk=k: run_ens(kk, s)))
        print(f"trial {t}: single {single_best:.2f} ms/step; " + " ".join(
            f"K={k}: {ens_best[k]:.2f}" for k in args.members))

    print(f"\nflagship scanned step, batch {batch} "
          f"(grid {batch * batch}), contention "
          f"{matmul_ms() / MATMUL_QUIET_MS:.2f}x")
    print(f"single member: {single_best:.2f} ms/step")
    for k in args.members:
        per = ens_best[k] / (k * single_best)
        print(f"K={k}: {ens_best[k]:.2f} ms/step for all members "
              f"→ per-member cost {per:.3f}x of a solo run "
              f"({1 / per:.2f}x ensemble efficiency)")


if __name__ == "__main__":
    main()
