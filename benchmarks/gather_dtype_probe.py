"""Probe: does bf16 halve gather-row *bytes* without falling off the fast
path at the step's dominant row widths?

Round 1 measured bf16 activations ~5x slower END-TO-END and attributed it
to 48-float rows dropping below 128-lane alignment (96 B rows). But the
dominant gather class in the roofline census is 512-float rows (2 KB),
which in bf16 is still 1 KB = 512 lanes — well above alignment. If those
rows gather at byte rate, the 4.4-5.0 ms width-512 wall halves.

    python benchmarks/gather_dtype_probe.py

Measures chained-scan slope rates (same method as roofline_tpu.py) for
dtype in {f32, bf16, int8} x width in {48, 512, 1024} elements with the
step's real mesh-coherent index patterns, plus an RCM-reordered variant of
the level-0 pattern to test whether more index locality raises the rate.
int8 is a HEADROOM measurement only (no int8 activation path is shipped):
if wide rows gather at byte rate, int8 would halve the dominant wall
again — the open question is training numerics, not bandwidth.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_geometry

    geom = _flagship_geometry()
    rng = np.random.default_rng(0)

    from benchmarks._common import (MATMUL_QUIET_MS, chained_gather_rate,
                                    make_matmul_canary)
    matmul_ms = make_matmul_canary(rng)
    print(f"contention factor {matmul_ms() / MATMUL_QUIET_MS:.2f}x")

    N0 = geom.spirals[0].num_vertices
    lvl0_idx = np.concatenate([np.asarray(g.idx)
                               for g in geom.spirals[0].gathers
                               if g is not None])
    lap_idx = np.asarray(geom.laplacian.cols).reshape(-1)
    lvl3_idx = np.concatenate(
        [np.asarray(g.idx) for g in geom.spirals[3].gathers
         if g is not None]
        + [np.asarray(geom.up[3].cols).reshape(-1)])
    n3 = geom.spirals[3].num_vertices
    lvl3_idx = np.tile(lvl3_idx, max(1, 200_000 // len(lvl3_idx)))

    def chained_rate(idx, n_src, w, dtype):
        return chained_gather_rate(idx, n_src, w, rng, dtype)

    patterns = {
        48: (lap_idx, N0),
        512: (lvl0_idx, N0),
        1024: (lvl3_idx, n3),
        # grid-64 row classes (B=64): C=32 levels pack 64*32=2048 elements,
        # the deepest C=64 level 4096. Whether bf16 reaches full byte
        # bandwidth here decides if batch 8 amortizes under the mixed
        # policy (fp32 rows were already at byte rate at 512 elements, so
        # round-2's "grid 64 is linear" conclusion doesn't transfer).
        2048: (lvl0_idx, N0),
        4096: (lvl3_idx, n3),
    }
    # int8 is a HEADROOM measurement only (no int8 activation path is
    # shipped): if 512-element rows gather at byte rate, int8 would halve
    # the dominant wall again — the open question is training numerics
    # (dW contracts gathered activations), not bandwidth.
    for w, (idx, n_src) in patterns.items():
        for dtype in (jnp.float32, jnp.bfloat16, jnp.int8):
            r = chained_rate(idx, n_src, w, dtype)
            elt = jnp.dtype(dtype).itemsize
            print(f"  width {w:4d} x {jnp.dtype(dtype).name:8s}: "
                  f"{r/1e6:7.1f} Mrows/s  "
                  f"({r*w*elt/1e9:5.0f} GB/s effective, "
                  f"{int(idx.shape[0]):,} rows from {n_src:,})")

    # RCM reordering: does more index locality raise the f32 rate?
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        # build vertex-vertex adjacency from the spiral table instead:
        src = np.tile(np.arange(N0), len(lvl0_idx) // N0)[:len(lvl0_idx)]
        adj = sp.coo_matrix((np.ones(len(lvl0_idx)), (src, lvl0_idx)),
                            shape=(N0, N0)).tocsr()
        perm = reverse_cuthill_mckee(adj, symmetric_mode=False)
        inv = np.empty(N0, dtype=np.int64)
        inv[perm] = np.arange(N0)
        idx_rcm = inv[lvl0_idx]
        r0 = chained_rate(lvl0_idx, N0, 512, jnp.float32)
        r1 = chained_rate(idx_rcm, N0, 512, jnp.float32)
        print(f"  RCM reorder @512 f32: {r0/1e6:.1f} -> {r1/1e6:.1f} "
              f"Mrows/s ({r1/r0:.3f}x)")
    except Exception as e:  # pragma: no cover
        print(f"  RCM probe skipped: {e}")

    print(f"contention factor after {matmul_ms() / MATMUL_QUIET_MS:.2f}x")


if __name__ == "__main__":
    main()
