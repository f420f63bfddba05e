"""Interleaved A/B of the full scanned train step: final decoder conv
gather-first vs matmul-first ("out-gather", ops/spiral_conv.py), both
under the shipped mixed compute_dtype policy.

    python benchmarks/outgather_ab.py [--batch 4] [--trials 4]

Motivation: the step is gather-ROW-throughput-bound and the final conv
(32 → 3 channels) is the one conv whose output rows are ~10× narrower
than its input rows. Reassociating it as out = b + Σ_l (x @ W_l)[spiral]
moves every gathered row from the bandwidth-limited G·32 width class to
the fast G·3 fp32 class in BOTH directions, and the backward gathers the
raw dy through per-position capped transposes instead of materializing
the [L, N, B, 32] dy·Wᵀ tensor. This measures the end-to-end effect on
the production scanned-epoch program, interleaved so both variants see
the same contention regime.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--trials", type=int, default=4)
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    setup_jax()
    import numpy as np

    from benchmarks._common import (MATMUL_QUIET_MS,
                                    make_flagship_step_timer,
                                    make_matmul_canary)
    rng = np.random.default_rng(0)
    matmul_ms = make_matmul_canary(rng)
    print(f"contention factor {matmul_ms() / MATMUL_QUIET_MS:.2f}x")

    G = args.batch * args.batch
    timers = {
        name: make_flagship_step_timer(
            np.random.default_rng(0), batch=args.batch,
            config_overrides={"final_out_gather": flag})
        for name, flag in (("gather_first", False), ("out_gather", True))}

    results = {n: [] for n in timers}
    for _ in range(args.trials):
        for name in timers:            # interleaved: same weather for both
            results[name].append(timers[name]())

    for name, times in results.items():
        best = min(times)
        print(f"  {name:12s}: best {best:6.2f} ms/step "
              f"({G / best * 1e3:6.0f} meshes/s)  trials "
              + " ".join(f"{t:.2f}" for t in times))
    sp = min(results["gather_first"]) / min(results["out_gather"])
    print(f"  out-gather speedup: {sp:.3f}x")
    print(f"contention factor after {matmul_ms() / MATMUL_QUIET_MS:.2f}x")


if __name__ == "__main__":
    main()
