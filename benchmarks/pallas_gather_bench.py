"""Quantify every viable dynamic row-gather strategy on this TPU.

Context (see pallas_gather_probe.py for the compile-level evidence): this
Mosaic's only vectorized dynamic gather, tpu.dynamic_gather, supports a
range of ONE vreg (8 sublanes) along the gather dimension — a spiral-conv
window needs ~1500. The fused-kernel design is therefore blocked at the
primitive level; this benchmark measures what remains:

  A. XLA jnp.take (the shipped path) with real spiral indices
  B. XLA jnp.take with RCM-style near-diagonal indices (locality lever:
     does DRAM row-buffer locality speed up XLA's gather?)
  C. Pallas fori_loop of dynamic single-row slices (compiles; how slow?)
  D. Pallas one-hot MXU matmul gather (FLOP-inflated; viable below BC~128?)

    python benchmarks/pallas_gather_bench.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


from benchmarks._common import slope_time_s as slope  # noqa: E402
# (shared guarded implementation — a contention spike during the short
# loop otherwise flips the slope negative)


def main():
    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # real level-0 spiral indices (17039 x 9) for representative locality
    spirals = None
    fix = os.path.join(REPO, "tests", "fixtures", "geometry.npz")
    if os.path.exists(fix):
        z = np.load(fix, allow_pickle=True)
        for k in z.files:
            if "spiral" in k and z[k].ndim == 2 and z[k].shape[0] > 10000:
                spirals = z[k]
                break

    def bench_xla_take(name, n, f, idx):
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        idxj = jnp.asarray(idx.astype(np.int32))

        @jax.jit
        def fn(x, idx):
            return jnp.take(x, idx, axis=0)

        def run(nn):
            r = None
            for _ in range(nn):
                r = fn(x, idxj)
            float(r[0, 0])
        dt = slope(run)
        m = len(idx)
        print(f"  {name:<44s} {dt*1e3:7.3f} ms "
              f"({m/dt/1e6:6.1f} Mrows/s, {m*f*4/dt/1e9:6.1f} GB/s)")
        return dt

    n, l = 17039, 9
    for f in (48, 512):
        print(f"A/B. XLA take, {l}x{n} rows from [{n}, {f}]:")
        rand_idx = rng.integers(0, n, size=(n * l,))
        bench_xla_take("random indices", n, f, rand_idx)
        if spirals is not None:
            bench_xla_take("real spiral indices (template order)", n, f,
                           spirals.T.reshape(-1))
        # near-diagonal: source within +-64 of the output row (RCM-like)
        near = (np.repeat(np.arange(n), l) +
                rng.integers(-64, 64, size=(n * l,))) % n
        bench_xla_take("near-diagonal indices (RCM-relabeled)", n, f, near)
        sorted_idx = np.sort(rand_idx)
        bench_xla_take("sorted random indices", n, f, sorted_idx)

    # C. Pallas fori_loop row-slice gather: tile grid, idx in SMEM
    def bench_loop_kernel(w, f, n_tiles):
        rows = n_tiles * w
        x = jnp.asarray(rng.normal(size=(n_tiles, w, f)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, w, size=(n_tiles, w)).astype(np.int32))

        def kernel(i_ref, x_ref, o_ref):
            t = pl.program_id(0)

            def body(r, _):
                o_ref[0, pl.ds(r, 1), :] = x_ref[0, pl.ds(i_ref[t, r], 1), :]
                return 0
            jax.lax.fori_loop(0, w, body, 0)

        fn = jax.jit(pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, w, f), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, w, f), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, w, f), jnp.float32),
        ))
        got = np.asarray(fn(idx, x))
        want = np.take_along_axis(
            np.asarray(x), np.asarray(idx)[:, :, None], axis=1)
        assert np.allclose(got, want)

        def run(nn):
            r = None
            for _ in range(nn):
                r = fn(idx, x)
            float(r[0, 0, 0])
        dt = slope(run)
        print(f"  fori_loop rows [{n_tiles}x{w}x{f}]:      {dt*1e3:7.3f} ms "
              f"({rows/dt/1e6:6.1f} Mrows/s, {rows*f*4/dt/1e9:6.1f} GB/s)")
        return dt

    print("C. Pallas fori_loop single-row dynamic slices:")
    bench_loop_kernel(1536, 128, 12)
    bench_loop_kernel(1536, 512, 12)

    # D. Pallas one-hot MXU gather at conv-tile shapes
    def bench_onehot(t9, w, f, n_tiles, dtype):
        x = jnp.asarray(rng.normal(size=(n_tiles, w, f)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, w, size=(n_tiles, t9)).astype(np.int32))
        # VMEM tiling needs the sublane dim divisible by 8; replicate rows
        idx_vmem = jnp.broadcast_to(idx[:, None, :], (n_tiles, 8, t9))

        def kernel(x_ref, i_ref, o_ref):
            cols = jax.lax.broadcasted_iota(jnp.int32, (t9, w), 1)
            onehot = (cols == i_ref[0, 0][:, None]).astype(dtype)
            o_ref[0] = jnp.dot(onehot, x_ref[0].astype(dtype),
                               preferred_element_type=jnp.float32)

        fn = jax.jit(pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, w, f), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, t9), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t9, f), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, t9, f), jnp.float32),
        ))
        got = np.asarray(fn(x, idx_vmem))
        want = np.stack([np.asarray(x)[i][np.asarray(idx)[i]]
                         for i in range(n_tiles)])
        # NB: even with preferred_element_type=f32 the MXU rounds inputs to
        # bf16 (measured max err ~0.016 on N(0,1) data) — one-hot "gather"
        # is inherently lossy unless precision=HIGHEST (3x passes)
        assert np.allclose(got, want, atol=5e-2), np.abs(got - want).max()

        def run(nn):
            r = None
            for _ in range(nn):
                r = fn(x, idx_vmem)
            float(r[0, 0, 0])
        dt = slope(run)
        rows = n_tiles * t9
        print(f"  one-hot {str(dtype.__name__):<9s} "
              f"[{n_tiles}x({t9}<-{w})x{f}]: {dt*1e3:7.3f} ms "
              f"({rows/dt/1e6:6.1f} Mrows/s, {rows*f*4/dt/1e9:6.1f} GB/s)")
        return dt

    print("D. Pallas one-hot MXU gather (T=256-vertex tiles, W=1536):")
    bench_onehot(2304, 1536, 48, 12, jnp.float32)
    bench_onehot(2304, 1536, 48, 12, jnp.bfloat16)
    bench_onehot(2304, 1536, 512, 12, jnp.bfloat16)


if __name__ == "__main__":
    main()
