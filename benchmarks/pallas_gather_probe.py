"""Probe: which dynamic row-gather formulations does this Mosaic compile?

The fused spiral-conv kernel needs an in-VMEM gather of rows by a
(traced) index vector. Round 1 recorded Mosaic frontend failures for
dynamic gathers; this probe re-tests every candidate formulation on the
current jax/libtpu and prints PASS/FAIL with the captured error, so the
blocker claim is reproducible.

    python benchmarks/pallas_gather_probe.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, R, F = 512, 256, 128     # window rows, gathered rows, features


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--interpret", action="store_true")
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(W, F)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, W, size=(R,)).astype(np.int32))
    want = np.asarray(x)[np.asarray(idx)]

    def check(name, fn):
        try:
            got = np.asarray(fn(x, idx))
            ok = np.allclose(got, want)
            print(f"{'PASS' if ok else 'WRONG-RESULT'}: {name}")
            return ok
        except Exception:
            err = traceback.format_exc().strip().splitlines()
            # print the last meaningful error lines
            tail = "\n    ".join(err[-12:])
            print(f"FAIL: {name}\n    {tail}\n")
            return False

    interp = args.interpret
    call = functools.partial(
        pl.pallas_call,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        interpret=interp)

    # 1. jnp.take on a loaded VMEM block, 1D idx loaded from a 2D ref
    def k_take(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:, 0], axis=0)

    check("jnp.take(loaded, idx1d, axis=0)", lambda x, i: call(
        k_take,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i.reshape(R, 1)))

    # 2. take_along_axis with broadcast [R, F] indices
    def k_tala(x_ref, i_ref, o_ref):
        idx2 = jnp.broadcast_to(i_ref[:, :1], (R, F))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx2, axis=0)

    check("take_along_axis(loaded, idx[R,F], axis=0)", lambda x, i: call(
        k_tala,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i.reshape(R, 1)))

    # 3. fori_loop of dynamic single-row slices (idx in SMEM)
    def k_loop(x_ref, i_ref, o_ref):
        def body(r, _):
            o_ref[pl.ds(r, 1), :] = x_ref[pl.ds(i_ref[r], 1), :]
            return 0
        jax.lax.fori_loop(0, R, body, 0)

    check("fori_loop dynamic row slices (idx in SMEM)", lambda x, i: call(
        k_loop,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))

    # 4. one-hot matmul on the MXU (guaranteed-lowerable fallback)
    def k_onehot(x_ref, i_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        onehot = (rows == i_ref[:, :1]).astype(jnp.float32)
        o_ref[:] = jnp.dot(onehot, x_ref[:],
                           preferred_element_type=jnp.float32)

    check("one-hot matmul gather", lambda x, i: call(
        k_onehot,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i.reshape(R, 1)))

    # 5. per-tile HBM->VMEM DMA with scalar-prefetched window starts
    #    (the fused-kernel outer loop structure; gather core = variant 1)
    def k_dma(start_ref, x_hbm, i_ref, o_ref, scratch, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_ref[0], W), :], scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = jnp.take(scratch[:], i_ref[:, 0], axis=0)

    def run_dma(x, i):
        big = jnp.concatenate([x, x], axis=0)      # [2W, F] in HBM
        starts = jnp.asarray([0], jnp.int32)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((W, F), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            k_dma, out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
            grid_spec=gs, interpret=interp)(starts, big, i.reshape(R, 1))

    check("scalar-prefetch window DMA + take", run_dma)


if __name__ == "__main__":
    main()
