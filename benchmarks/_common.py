"""Shared measurement helpers for the benchmark scripts.

Import AFTER `craniofacialsd_vae_tpu.utils.runtime.setup_jax()` has run —
these helpers import jax at call time and inherit whatever platform the
caller configured. Single source of truth for the matmul contention
canary and the chained-scan gather-rate method used by roofline_tpu.py,
gather_dtype_probe.py, mixed_ab.py and bench.py.
"""

from __future__ import annotations

import time

import numpy as np

# 4096³ fp32 matmul on a quiet v5e — the denominator every script's
# contention factor is read against
MATMUL_QUIET_MS = 2.1


def make_matmul_canary(rng: np.random.Generator):
    """Return `matmul_ms()`: mean wall ms of ten 4096³ fp32 matmuls
    (one warm-up + fetch before timing). Same program in every script so
    the compile cache is shared and factors are comparable."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    mm = jax.jit(lambda a: a @ a)

    def matmul_ms():
        r = mm(a)
        float(r[0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            r = mm(a)
        float(r[0, 0])
        return (time.perf_counter() - t0) / 10 * 1e3

    return matmul_ms


def chained_gather_rate(idx, n_src: int, w: int, rng: np.random.Generator,
                        dtype=None) -> float:
    """Rows/s of `jnp.take(src, idx, axis=0)` on a [n_src, w] table of
    `dtype`, by chained-lax.scan slope timing: one dispatch + one value
    fetch per chain, the long-short delta cancels the tunnel round-trip.
    Chain lengths are sized so the delta is ≥80 ms of device work (short
    slopes drown in fetch jitter). The tiny dependent table update adds
    one stream write/iter (<5% at these sizes)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    idx = jnp.asarray(np.asarray(idx).astype(np.int32))
    src0 = jnp.asarray(rng.normal(size=(n_src, w)).astype(np.float32)
                       ).astype(dtype)
    elt = jnp.dtype(dtype).itemsize
    est_s = int(idx.shape[0]) * w * elt / 250e9
    delta = max(int(0.08 / max(est_s, 1e-6)), 20)
    n_short, n_long = 6, 6 + min(delta, 2000)

    def chain(n):
        def body(s, _):
            g = jnp.take(s, idx, axis=0).sum(axis=0)
            return s + (1e-30 * g[None, :]).astype(dtype), ()

        return jax.jit(lambda s: jax.lax.scan(body, s, None, length=n)[0])

    f_s, f_l = chain(n_short), chain(n_long)
    float(f_s(src0)[0, 0])
    float(f_l(src0)[0, 0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(f_s(src0)[0, 0])
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_l(src0)[0, 0])
        tl = time.perf_counter() - t0
        dt = (tl - ts) / (n_long - n_short)
        best = dt if best is None else min(best, dt)
    return int(idx.shape[0]) / max(best, 1e-9)
