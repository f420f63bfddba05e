"""A/B: does BFS/RCM vertex reordering speed up the step's spiral row
gathers? (VERDICT r4 stretch #7.)

The production step is gather-row-bound (benchmarks/roofline_tpu.json:
~4.1 ms of the 5.8 ms composite bound is row gathers), and the
template's vertex numbering is the one locality lever not yet measured:
spiral neighbourhoods that are contiguous in memory could turn scattered
HBM row reads into near-streaming ones. This microbenchmark isolates the
question on the REAL level-0 spiral table (17,039 × 9 indices from the
flagship geometry): time `jnp.take(x, spiral_flat, axis=0)` with

  A. the template's native ordering,
  B. the reverse-Cuthill-McKee ordering of the mesh adjacency
     (scipy.sparse.csgraph), spiral indices renumbered + rows reordered,
  C. (control) a random permutation — the worst-case ordering; if A≈C
     the gather unit is insensitive to ordering at this row size and
     the lever is dead.

Both the thin fp32 row class ([N, G·3], the mixed policy's input conv)
and the wide bf16 class ([N, G·32], every other level-0 gather) are
measured, interleaved so all variants see the same contention regime.

    python benchmarks/reorder_ab.py [--batch 4] [--trials 4]
        [--json benchmarks/reorder_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rcm_permutation(n_verts, edges):
    """new-order list of old vertex ids via reverse Cuthill-McKee on the
    undirected mesh adjacency."""
    import numpy as np
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    adj = sp.coo_matrix((np.ones(len(src), np.int8), (src, dst)),
                        shape=(n_verts, n_verts)).tocsr()
    return np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))


def permute_spirals(spirals, perm):
    """Renumber a [N, L] spiral table into the permuted vertex order:
    row new_i describes old vertex perm[new_i]; its entries are mapped
    through old→new."""
    import numpy as np

    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv[spirals[perm]]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--trials", type=int, default=4)
    parser.add_argument("--json", type=str,
                        default=os.path.join(REPO, "benchmarks",
                                             "reorder_ab.json"))
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from benchmarks._common import MATMUL_QUIET_MS, make_matmul_canary
    from craniofacialsd_vae_tpu.geometry import (load_or_compute_geometry,
                                                 load_template)

    rng = np.random.default_rng(0)
    matmul_ms = make_matmul_canary(rng)
    contention = matmul_ms() / MATMUL_QUIET_MS
    print(f"contention factor {contention:.2f}x", flush=True)

    template = load_template("/root/reference/demo_files/template.ply")
    bundle = load_or_compute_geometry(
        os.path.join(REPO, "tests", "fixtures"), template,
        [4, 4, 4, 4], [9, 9, 9, 9], [1, 1, 1, 1])
    spirals0 = np.asarray(bundle.spirals[0])        # [N, L]
    n = spirals0.shape[0]
    tpl_edges = np.asarray(template.edges)
    g = args.batch * args.batch

    perm_rcm = rcm_permutation(n, tpl_edges)
    perm_rand = np.random.default_rng(1).permutation(n)
    tables = {"native": spirals0,
              "rcm": permute_spirals(spirals0, perm_rcm),
              "random": permute_spirals(spirals0, perm_rand)}
    # locality diagnostic: mean |index - row| distance of spiral entries
    for name, tab in tables.items():
        d = np.abs(tab - np.arange(n)[:, None]).mean()
        print(f"  {name:7s}: mean |spiral idx - row| = {d:9.1f}",
              flush=True)

    def make_timer(idx_flat, width, dtype):
        x = jnp.asarray(rng.normal(size=(n, width)).astype(np.float32)
                        ).astype(dtype)
        idx = jnp.asarray(idx_flat.astype(np.int32))

        def body(s, _):
            gathered = jnp.take(s, idx, axis=0)      # [N*L, width]
            upd = gathered.reshape(n, -1, s.shape[1]).sum(axis=1)
            return s + (1e-30 * upd).astype(dtype), ()

        def chain(length):
            return jax.jit(lambda s: jax.lax.scan(
                body, s, None, length=length)[0])

        f_s, f_l = chain(4), chain(24)
        float(f_s(x)[0, 0].astype(jnp.float32))
        float(f_l(x)[0, 0].astype(jnp.float32))

        def ms():
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                float(f_s(x)[0, 0].astype(jnp.float32))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(f_l(x)[0, 0].astype(jnp.float32))
                tl = time.perf_counter() - t0
                dt = (tl - ts) / 20
                if dt <= 0:
                    dt = tl / 24
                best = dt if best is None else min(best, dt)
            return best * 1e3

        return ms

    shapes = {"thin_fp32": (g * 3, jnp.float32),
              "wide_bf16": (g * 32, jnp.bfloat16)}
    record = {"contention_factor": round(contention, 2),
              "batch": args.batch, "n_vertices": int(n),
              "spiral_len": int(spirals0.shape[1])}
    for shape_name, (width, dtype) in shapes.items():
        timers = {name: make_timer(tab.ravel(), width, dtype)
                  for name, tab in tables.items()}
        results = {name: [] for name in timers}
        for _ in range(args.trials):
            for name in timers:        # interleaved: same weather
                results[name].append(timers[name]())
        bests = {name: min(ts) for name, ts in results.items()}
        rec = {name: round(v, 4) for name, v in bests.items()}
        rec["rcm_speedup_vs_native"] = round(
            bests["native"] / bests["rcm"], 4)
        rec["random_slowdown_vs_native"] = round(
            bests["random"] / bests["native"], 4)
        record[shape_name] = rec
        print(f"{shape_name}: " + "  ".join(
            f"{k} {v:.3f} ms" for k, v in bests.items())
            + f"  → rcm speedup {rec['rcm_speedup_vs_native']:.3f}x, "
            f"random slowdown {rec['random_slowdown_vs_native']:.3f}x",
            flush=True)

    record["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(args.json, "w") as f:
        json.dump(record, f, indent=1)
    print(f"→ {args.json}", flush=True)


if __name__ == "__main__":
    main()
