"""End-to-end A/B of RCM vertex reordering on the FULL flagship train
step (the isolated-gather A/B is benchmarks/reorder_ab.py; this answers
whether the wide-row gather win survives in the production program).

Both variants run the identical scanned train step — same config, same
shapes, same parameter count — differing only in the geometry's index
tables: native template ordering vs per-level reverse-Cuthill-McKee
(geometry/reorder.py; forward math proven bit-identical under the
relabeling in tests/test_reorder.py). Interleaved trials, so both see
the same contention weather.

    python benchmarks/reorder_step_ab.py [--batch 4] [--trials 6]
        [--json benchmarks/reorder_step_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--trials", type=int, default=6)
    parser.add_argument("--json", type=str,
                        default=os.path.join(REPO, "benchmarks",
                                             "reorder_step_ab.json"))
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    setup_jax()
    import numpy as np

    from benchmarks._common import (MATMUL_QUIET_MS,
                                    make_flagship_step_timer,
                                    make_matmul_canary)
    from craniofacialsd_vae_tpu.geometry import (load_or_compute_geometry,
                                                 load_template)
    from craniofacialsd_vae_tpu.geometry.reorder import (
        hierarchy_rcm_permutations, permute_bundle)
    from craniofacialsd_vae_tpu.models import SpiralGeometry

    rng = np.random.default_rng(0)
    matmul_ms = make_matmul_canary(rng)
    contention = matmul_ms() / MATMUL_QUIET_MS
    print(f"contention factor {contention:.2f}x", flush=True)

    template = load_template("/root/reference/demo_files/template.ply")
    bundle = load_or_compute_geometry(
        os.path.join(REPO, "tests", "fixtures"), template,
        [4, 4, 4, 4], [9, 9, 9, 9], [1, 1, 1, 1])
    perms = hierarchy_rcm_permutations(bundle)
    geoms = {"native": SpiralGeometry.from_bundle(bundle),
             "rcm": SpiralGeometry.from_bundle(
                 permute_bundle(bundle, perms))}

    g = args.batch * args.batch
    timers = {name: make_flagship_step_timer(
        np.random.default_rng(0), batch=args.batch, geometry=geom)
        for name, geom in geoms.items()}

    results = {n: [] for n in timers}
    for _ in range(args.trials):
        for name in timers:            # interleaved: same weather
            results[name].append(timers[name]())

    record = {"contention_factor": round(contention, 2),
              "batch": args.batch, "trials": args.trials}
    for name, times in results.items():
        best = min(times)
        record[f"{name}_ms_best"] = round(best, 3)
        record[f"{name}_ms_all"] = [round(t, 3) for t in times]
        print(f"  {name:7s}: best {best:6.2f} ms/step "
              f"({g / best * 1e3:6.0f} meshes/s)  trials "
              + " ".join(f"{t:.2f}" for t in times), flush=True)
    record["rcm_speedup"] = round(
        record["native_ms_best"] / record["rcm_ms_best"], 4)
    record["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    print(f"RCM end-to-end speedup: {record['rcm_speedup']:.3f}x",
          flush=True)
    with open(args.json, "w") as f:
        json.dump(record, f, indent=1)
    print(f"→ {args.json}", flush=True)


if __name__ == "__main__":
    main()
