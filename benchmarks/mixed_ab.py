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

    # Single-source methodology: both variants are
    # benchmarks._common.make_flagship_step_timer programs (the exact
    # measurement behind bench.py's headline and the canary-floor
    # sampler), interleaved per trial so both see the same weather.
    from benchmarks._common import (MATMUL_QUIET_MS,
                                    make_flagship_step_timer,
                                    make_matmul_canary)
    rng = np.random.default_rng(0)
    matmul_ms = make_matmul_canary(rng)
    print(f"contention factor {matmul_ms() / MATMUL_QUIET_MS:.2f}x")

    G = args.batch * args.batch
    timers = {name: make_flagship_step_timer(
        np.random.default_rng(0), compute_dtype=name, batch=args.batch)
        for name in ("float32", "mixed")}

    results = {n: [] for n in timers}
    for _ in range(args.trials):
        for name in timers:            # interleaved: same weather for both
            results[name].append(timers[name]())

    for name, times in results.items():
        best = min(times)
        print(f"  {name:8s}: best {best:6.2f} ms/step "
              f"({G / best * 1e3:6.0f} meshes/s)  trials "
              + " ".join(f"{t:.2f}" for t in times))
    sp = min(results["float32"]) / min(results["mixed"])
    print(f"  mixed speedup: {sp:.3f}x")
    print(f"contention factor after {matmul_ms() / MATMUL_QUIET_MS:.2f}x")


if __name__ == "__main__":
    main()
