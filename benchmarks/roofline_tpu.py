"""Row-rate roofline of the shipped train step on TPU v5e.

    python benchmarks/roofline_tpu.py [--batch 4] [--json OUT]

Why row rate, not HBM bytes: the per-level gather tables are small
(level-0 activations at grid 16 × C=32 are ~35 MB — inside v5e's VMEM),
so the classic HBM-bandwidth roofline over-predicts the step cost ~4×
(measured; a byte model assuming materialized gathers gave 115 ms against
a measured 29 ms on the same contended chip). What actually limits the
step is XLA's dynamic-gather ROW THROUGHPUT: every sparse op in the step
is a row gather (ops/sparse.py — spiral positions, combined-transpose
backwards, ELL pools, Laplacian), and the TPU consumes gathered rows at a
fixed measurable rate per row width. The speed-of-light for this step is
therefore

    bound = Σ_width  rows_gathered(width) / measured_row_rate(width)

with rows counted EXACTLY by introspecting the geometry tables the step
executes (no estimates), and rates measured on this chip at the step's
three packed row widths (G·C ∈ {48, 512, 1024} floats). Contention
cancels to first order: rates and step time degrade together.

The alternative to XLA's gather lowering — a fused Mosaic/Pallas kernel
with in-VMEM dynamic row gathers — is proven blocked at the Mosaic
primitive level on this stack (docs/PERFORMANCE.md "Known gaps",
pallas_dyngather_error.txt), so this wall is the operative one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

F32 = 4


def count_gather_rows(geom, config, B):
    """Exact gathered-row census of one train step (forward + backward),
    bucketed by packed row width in floats (G·C_in).

    Counts introspect the live operator tables:
      * spiral conv forward: one row per non-identity gather entry;
      * conv backward: dW recomputes the forward gathers (same rows) and
        dx applies the combined CappedEll transpose (K_cap·N main rows +
        overflow rows);
      * ELL pools / Laplacian: K·M rows forward, transpose rows backward.
    """
    import numpy as np

    G = B * B
    rows = {}

    def add(width_floats, n):
        rows[width_floats] = rows.get(width_floats, 0) + int(n)

    def ell_rows(ce):
        n = ce.cols.shape[0] * ce.cols.shape[1]
        for _, o_cols, _ in ce.tiers:
            n += o_cols.shape[0] * o_cols.shape[1]
        return n

    def conv_rows(op, c_in):
        """Forward gathers count ONCE even though the custom VJP
        re-issues them for dW: value_and_grad traces forward and backward
        into one program and XLA CSE merges the identical gather(x, idx)
        expressions — verified by counting gather ops in the optimized
        HLO of the full train step (5 per conv per spiral position, not
        10, on the tiny-geometry step)."""
        w = G * c_in
        fwd = sum(g.idx.shape[0] for g in op.gathers if g is not None)
        add(w, fwd)
        for table in op.inv_tables:
            add(w, ell_rows(table))

    chans = [config.in_channels] + list(config.out_channels)
    # encoder: composed-selection convs
    ops = geom.enc_spirals if geom.enc_spirals else geom.spirals
    for i, op in enumerate(ops):
        conv_rows(op, chans[i])
    # decoder convs mirror the encoder channel widths at levels 3..0
    n_levels = len(config.out_channels)
    de_cin = [config.out_channels[-1] if j == 0
              else config.out_channels[n_levels - j]
              for j in range(n_levels)]
    for j in range(n_levels):
        conv_rows(geom.spirals[n_levels - 1 - j], de_cin[j])
    # final conv: under the bf16 policies decode() uses the matmul-first
    # out-gather formulation (ops/spiral_conv.spiral_conv_out_gather) —
    # forward gathers the per-position projections at width G·C_out (= G·3,
    # fp32) and the backward gathers the raw dy through each position's
    # capped transpose; no combined table, no dy·Wᵀ materialization
    fin = geom.spirals[0]
    if config.final_out_gather and \
            config.compute_dtype in ("mixed", "bfloat16"):
        w = G * config.in_channels
        add(w, sum(g.idx.shape[0] for g in fin.gathers if g is not None))
        for g in fin.gathers:
            if g is not None:
                add(w, ell_rows(g.transpose))
    else:
        conv_rows(fin, config.out_channels[0])
    # up pools (ELL K=3 + transpose) at decoder input widths
    for j in range(n_levels):
        level = n_levels - 1 - j
        up = geom.up[level]
        w = G * de_cin[j]
        add(w, up.cols.shape[0] * up.cols.shape[1])
        if up.transpose is not None:
            add(w, ell_rows(up.transpose))
    # Laplacian loss (forward ELL + transpose in backward), width G·3
    if geom.laplacian is not None:
        lap = geom.laplacian
        add(G * 3, lap.cols.shape[0] * lap.cols.shape[1])
        if lap.transpose is not None:
            add(G * 3, ell_rows(lap.transpose))
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--json", type=str, default=None)
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=["float32", "mixed", "bfloat16"],
                        help="activation policy to model (default: the "
                             "flagship craniofacial.yaml's setting)")
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
    if args.compute_dtype is None:
        from craniofacialsd_vae_tpu.utils import flagship_sdvae_config
        args.compute_dtype = flagship_sdvae_config(REPO).compute_dtype
    config = SDVAEConfig(compute_dtype=args.compute_dtype)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    opt = optax.adamw(1e-4, weight_decay=0.0)
    rng = np.random.default_rng(0)
    B = args.batch
    G = B * B
    N0 = geom.spirals[0].num_vertices

    rows = count_gather_rows(geom, config, B)
    total_rows = sum(rows.values())
    print(f"gathered rows per step (grid {G}): "
          + ", ".join(f"{n:,} @ {w}f" for w, n in sorted(rows.items()))
          + f" = {total_rows:,} total")

    # ---- wait for a quiet window --------------------------------------
    # Rates and the step must be measured in the SAME contention regime.
    # Gate on the fp32-STEP canary, not just the matmul canary: the
    # chip's plateau episodes hit the row-gather regime ~3.5× while the
    # matmul reads 1.5-2× (docs/PERFORMANCE.md "The contention plateau"),
    # and the row rates this tool prices the bound with live in exactly
    # that regime — a snapshot taken inside a plateau understates the
    # bound by the plateau factor. Without a quiet window the ratio is
    # still reported, flagged with both residual factors.
    from benchmarks._common import (FP32_STEP_QUIET_MS, MATMUL_QUIET_MS,
                                    chained_gather_rate,
                                    make_flagship_step_timer,
                                    make_matmul_canary)
    matmul_ms = make_matmul_canary(rng)
    fp32_step_ms_fn = make_flagship_step_timer(rng,
                                               compute_dtype="float32")
    # local 4096² operand for the bf16-matmul and stream-rate floors below
    # (the canary's own array lives inside its closure)
    a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))

    factor = matmul_ms() / MATMUL_QUIET_MS
    step_factor = fp32_step_ms_fn() / FP32_STEP_QUIET_MS
    t_wait = time.perf_counter()
    while (factor > 1.25 or step_factor > 1.3) \
            and time.perf_counter() - t_wait < 420:
        print(f"  [contention: step-regime {step_factor:.2f}x, matmul "
              f"{factor:.2f}x — waiting 20s]")
        time.sleep(20)
        factor = matmul_ms() / MATMUL_QUIET_MS
        step_factor = fp32_step_ms_fn() / FP32_STEP_QUIET_MS
    print(f"  measuring at step-regime factor {step_factor:.2f}x "
          f"(matmul {factor:.2f}x)")

    # ---- measured row rates at the step's widths ----------------------
    # Rates must be measured with the step's REAL index patterns: spiral
    # indices are mesh-coherent (neighbors are near in index space), and a
    # uniform-random canary under-reads the achievable rate ~1.7×
    # (measured: the real step beat the random-index bound).
    def real_pattern(width):
        if width == G * 3:                     # Laplacian ELL pattern
            return geom.laplacian.cols.reshape(-1), N0
        if width == G * config.out_channels[0]:   # level-0 spiral convs
            idx = np.concatenate([np.asarray(g.idx)
                                  for g in geom.spirals[0].gathers
                                  if g is not None])
            return jnp.asarray(idx), N0
        # deepest-level pattern (width G·64): level-3 conv + up tables
        idx = np.concatenate(
            [np.asarray(g.idx) for g in geom.spirals[3].gathers
             if g is not None]
            + [np.asarray(geom.up[3].cols).reshape(-1)])
        n_src = geom.spirals[3].num_vertices
        reps = max(1, 200_000 // len(idx))     # statistical mass
        return jnp.asarray(np.tile(idx, reps)), n_src

    # Chained-scan slope rates (benchmarks/_common.chained_gather_rate):
    # one dispatch + one value fetch per chain, slope cancels the
    # round-trip.
    def row_dtype(w):
        # mixed policy boundary (models/sdvae.py): the G·3 class (first
        # conv, Laplacian, final output) stays fp32; deeper rows are bf16
        if config.compute_dtype == "float32":
            return jnp.float32
        if config.compute_dtype == "bfloat16":
            return jnp.bfloat16
        return jnp.float32 if w == G * 3 else jnp.bfloat16

    rates = {}
    for w in sorted(rows):
        idx, n_src = real_pattern(w)
        dtype = row_dtype(w)
        rates[w] = chained_gather_rate(idx, n_src, w, rng, dtype)
        elt = jnp.dtype(dtype).itemsize
        print(f"  measured row rate @ {w:4d} el × {jnp.dtype(dtype).name} "
              f"(real pattern, {int(idx.shape[0]):,} rows from "
              f"{n_src:,}): {rates[w]/1e6:6.1f} Mrows/s "
              f"({rates[w]*w*elt/1e9:.0f} GB/s effective)")

    bound_ms = sum(n / rates[w] for w, n in rows.items()) * 1e3

    # ---- measured full step via the production scanned program --------
    # (bit-identical to bench.py's program — a compile-cache hit even
    # when the remote compile helper is congested)
    weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
    epoch = make_scanned_train_step(config, weights, opt, batch_size=B,
                                    swap=True)
    state = create_train_state(params, opt)
    n_data = 32
    data = jnp.asarray(
        rng.normal(size=(n_data, N0, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def run_steps(n_steps):
        nonlocal state
        idx = jnp.asarray(rng.integers(0, n_data, size=(n_steps, B)),
                          jnp.int32)
        t0 = time.perf_counter()
        state, m = epoch(state, geom, data, idx, jnp.arange(n_steps),
                         None, None, key)
        float(m["tot"])
        return time.perf_counter() - t0

    run_steps(10)
    run_steps(60)
    shorts = [run_steps(10) for _ in range(2)]
    longs = [run_steps(60) for _ in range(2)]
    full_ms = max((min(longs) - min(shorts)) / 50, 1e-9) * 1e3

    # ---- non-gather floor: matmul FLOPs + elementwise streams ---------
    # Matmul FLOPs of the step (fwd + ~2× for backward), at the rate the
    # 4096³ canary achieves on this chip right now.
    chans = [config.in_channels] + list(config.out_channels)
    n_levels = len(config.out_channels)
    mm_flops = 0
    ops = geom.enc_spirals if geom.enc_spirals else geom.spirals
    for i, op in enumerate(ops):
        m = min(g.idx.shape[0] for g in op.gathers if g is not None)
        mm_flops += m * 9 * chans[i] * chans[i + 1] * G * 2
    de_cin = [config.out_channels[-1] if j == 0
              else config.out_channels[n_levels - j]
              for j in range(n_levels)]
    de_cout = [config.out_channels[n_levels - 1 - j]
               for j in range(n_levels)]
    for j in range(n_levels):
        m = geom.spirals[n_levels - 1 - j].num_vertices
        mm_flops += m * 9 * de_cin[j] * de_cout[j] * G * 2
    mm_flops += N0 * 9 * chans[1] * 3 * G * 2            # final conv
    flat = geom.num_latent_vertices * chans[-1]
    mm_flops += 3 * G * flat * config.latent_size * 2    # mu/logvar/de
    mm_flops *= 3                                        # fwd + dx + dW
    if config.deep_dtype == jnp.bfloat16:
        # deep-level matmuls run with bf16 operands (single MXU pass);
        # measure the bf16 canary rate for the floor (the fp32 level-0
        # convs are a small fraction of the FLOPs)
        ab = a.astype(jnp.bfloat16)
        mmb = jax.jit(lambda x: jax.lax.dot(
            x, x, preferred_element_type=jnp.float32))
        r = mmb(ab)
        float(r[0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            r = mmb(ab)
        float(r[0, 0])
        mm_canary_s = (time.perf_counter() - t0) / 10
    else:
        mm_canary_s = matmul_ms() / 1e3
    mm_tflops = 2 * 4096 ** 3 / mm_canary_s / 1e12
    matmul_floor_ms = mm_flops / (mm_tflops * 1e12) * 1e3

    # Elementwise/stream traffic: ELU fwd+bwd, swap grid build, losses,
    # reparam, Adam — ~12 full passes over the level-0 activation plus
    # Adam's 7 passes over the params, at measured stream rate.
    stream_dt = None
    try:
        def stream_body(s, _):
            return s * 1.0000001, ()

        sc = jax.jit(lambda s: jax.lax.scan(
            stream_body, s, None, length=64)[0])
        float(sc(a)[0, 0])
        t0 = time.perf_counter()
        float(sc(a)[0, 0])
        stream_dt = (time.perf_counter() - t0) / 64
    except Exception:
        pass
    act_elt = jnp.dtype(config.deep_dtype).itemsize
    act_bytes = sum(op.num_vertices for op in geom.spirals) * G * 32 * act_elt
    # shape metadata only — the param buffers were donated into the epoch
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # level-0 xyz streams (swap grid, losses, recon) stay fp32 under every
    # policy; deep activation streams follow deep_dtype; params fp32
    stream_bytes = 12 * N0 * G * 3 * F32 + 6 * act_bytes \
        + 7 * n_params * F32
    stream_gbs = 2 * a.nbytes / stream_dt / 1e9 if stream_dt else 600.0
    stream_floor_ms = stream_bytes / (stream_gbs * 1e9) * 1e3

    composite_ms = bound_ms + matmul_floor_ms + stream_floor_ms
    pct = 100 * composite_ms / full_ms
    print(f"\n  gather-row bound:      {bound_ms:6.2f} ms "
          f"({G / bound_ms * 1e3:,.0f} meshes/s)")
    print(f"  + matmul floor:        {matmul_floor_ms:6.2f} ms "
          f"({mm_flops/1e9:.1f} GFLOP @ {mm_tflops:.0f} TFLOP/s)")
    print(f"  + stream floor:        {stream_floor_ms:6.2f} ms "
          f"({stream_bytes/1e6:.0f} MB @ {stream_gbs:.0f} GB/s)")
    print(f"  = composite bound:     {composite_ms:6.2f} ms "
          f"({G / composite_ms * 1e3:,.0f} meshes/s)")
    print(f"  measured step:         {full_ms:6.2f} ms "
          f"({G / full_ms * 1e3:,.0f} meshes/s)")
    print(f"  → the step runs at {pct:.0f}% of the composite wall "
          f"(>100% = measurement windows differ in contention; compare "
          f"the quiet-chip step, 8.4 ms, against the bound — gather "
          f"rates are VMEM-resident and contention-insensitive)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "compute_dtype": config.compute_dtype,
                "batch": B,
                "grid": G,
                "rows_by_width": {str(k): v for k, v in rows.items()},
                "total_rows": total_rows,
                "row_rates_mrows_per_s": {
                    str(k): round(v / 1e6, 1) for k, v in rates.items()},
                "gather_bound_ms": round(bound_ms, 2),
                "matmul_floor_ms": round(matmul_floor_ms, 2),
                "stream_floor_ms": round(stream_floor_ms, 2),
                "composite_bound_ms": round(composite_ms, 2),
                "measured_step_ms": round(full_ms, 2),
                "pct_of_wall": round(pct, 1),
                "contention_factor_at_measure": round(factor, 2),
                "step_regime_factor_at_measure": round(step_factor, 2),
            }, f, indent=1)


if __name__ == "__main__":
    main()
