"""Roofline/FLOP model of the reference PyTorch train step on the GPUs it
was actually run on — the honest baseline for the ">= 10x reference PyTorch
meshes/sec/chip" north star (BASELINE.json), since the reference publishes
no absolute numbers and its CUDA-era stack (torch 1.7.1/1.12.1, CUDA
10.1/11.3, reference README.md:12-13) is not installable here.

The model deliberately favors the reference: it assumes a perfect input
pipeline (the reference actually builds the B->B^2 swap grid with Python
loops in CPU collate workers, swap_batch_transform.py:13-52, and pays an
H2D copy of the full grid every step), 100%-of-peak memory bandwidth for
gathers/scatters (real mesh-indexed gathers are far below peak), and
fused-elementwise treatment of activations. Whatever the real reference
throughput was, it is below this bound.

Step modeled: batch 4 -> 16-mesh swap grid, full forward + losses +
backward + Adam on the craniofacial geometry (17,039 verts, channels
3-32-32-32-64, latent 75, spiral length 9), mirroring
benchmarks/baseline_torch.py layer-for-layer.

Usage: python benchmarks/roofline_gpu.py  -> prints a table + one JSON line.
"""

from __future__ import annotations

import json

# craniofacial geometry (SURVEY §2A "VAE Model" row; demo template levels)
VERTS = [17039, 4260, 1065, 267, 67]
CHANS = [3, 32, 32, 32, 64]
LATENT = 75
L = 9                      # spiral length
B = 16                     # 4 -> 16 swap grid
NNZ_LAP = 119_558          # unnormalized Laplacian of the template
F32 = 4

# GPUs of the reference's era (CUDA 10.1 / 11.3): fp32 peak TFLOP/s and
# HBM/GDDR bandwidth GB/s (vendor datasheets)
GPUS = {
    "GTX 1080 Ti": (11.3e12, 484e9),
    "RTX 2080 Ti": (13.4e12, 616e9),
    "V100 SXM2": (15.7e12, 900e9),
}

# torch eager kernel-launch/dispatch overhead per CUDA kernel (measured
# range in the literature is 5-20 us; take the optimistic end)
LAUNCH_US = 5.0


def conv_cost(n, c_in, c_out):
    """One SpiralConv fwd+bwd: gather -> [B,N,L*c_in] -> Linear(c_out).
    Returns (flops, bytes, kernels)."""
    gathered = B * n * L * c_in * F32
    # fwd: gather write + source read; bwd: scatter-add of dX (read+write)
    g_bytes = 3 * (gathered + B * n * c_in * F32)
    mm_flops = 2 * B * n * (L * c_in) * c_out   # fwd
    mm_flops *= 3                               # + dX and dW matmuls
    act_bytes = 3 * 2 * B * n * c_out * F32     # ELU fwd+bwd read/write
    kernels = 12                                # gather/view/mm/bias/elu x fwd+bwd
    return mm_flops, g_bytes + act_bytes, kernels


def pool_cost(n_out, c, nnz_per_row):
    """Sparse-matmul pool fwd+bwd (gather cols, scale, scatter rows)."""
    bytes_ = 3 * 2 * B * n_out * nnz_per_row * c * F32
    flops = 3 * 2 * B * n_out * nnz_per_row * c
    return flops, bytes_, 6


def dense_cost(d_in, d_out):
    flops = 3 * 2 * B * d_in * d_out
    bytes_ = 3 * (d_in * d_out + B * (d_in + d_out)) * F32
    return flops, bytes_, 4


def model_step():
    flops = bytes_ = 0.0
    kernels = 0

    def add(c):
        nonlocal flops, bytes_, kernels
        f, b, k = c
        flops += f
        bytes_ += b
        kernels += k

    # encoder: conv at level i then selection-pool to i+1
    for i in range(4):
        add(conv_cost(VERTS[i], CHANS[i], CHANS[i + 1]))
        add(pool_cost(VERTS[i + 1], CHANS[i + 1], 1))
    add(dense_cost(VERTS[4] * CHANS[4], LATENT))     # mu
    add(dense_cost(VERTS[4] * CHANS[4], LATENT))     # logvar
    add(dense_cost(LATENT, VERTS[4] * CHANS[4]))     # de_dense
    # decoder: barycentric up-pool (3 nnz/row) then conv
    de_chans = [(CHANS[4], CHANS[4]), (CHANS[4], CHANS[3]),
                (CHANS[3], CHANS[2]), (CHANS[2], CHANS[1])]
    for j, (ci, co) in enumerate(de_chans):
        add(pool_cost(VERTS[3 - j], ci, 3))
        add(conv_cost(VERTS[3 - j], ci, co))
    add(conv_cost(VERTS[0], CHANS[1], CHANS[0]))     # final conv

    # losses: recon MSE + Laplacian sparse-mm + KL + consistency (tiny)
    bytes_ += 3 * 2 * B * VERTS[0] * 3 * F32
    flops += 3 * 2 * B * NNZ_LAP * 3
    bytes_ += 3 * 2 * B * NNZ_LAP * 3 * F32
    kernels += 40
    # Adam over ~1.5M params: 4 tensors rw each
    n_params = sum(VERTS[i] * 0 + L * CHANS[i] * CHANS[i + 1]
                   for i in range(4)) + 2 * VERTS[4] * CHANS[4] * LATENT \
        + VERTS[4] * CHANS[4] * LATENT
    bytes_ += 8 * n_params * F32
    kernels += 30
    return flops, bytes_, kernels


def upper_bound(gpu: str = "V100 SXM2") -> float:
    """Modeled meshes/s upper bound for one GPU — the single source of
    truth bench.py reads (keeping the recorded vs_gpu_roofline ratio in
    lockstep with this model's constants)."""
    flops, bytes_, kernels = model_step()
    peak, bw = GPUS[gpu]
    t = max(flops / peak, bytes_ / bw) + kernels * LAUNCH_US * 1e-6
    return B / t


def main():
    flops, bytes_, kernels = model_step()
    print(f"modeled step: {flops / 1e9:.2f} GFLOP, "
          f"{bytes_ / 1e6:.1f} MB moved, ~{kernels} kernels "
          f"(batch {B} meshes)\n")
    results = {}
    for name, (peak, bw) in GPUS.items():
        t = max(flops / peak, bytes_ / bw) + kernels * LAUNCH_US * 1e-6
        meshes = B / t
        results[name] = round(meshes, 0)
        print(f"{name:>14}: compute {flops / peak * 1e3:.2f} ms | "
              f"memory {bytes_ / bw * 1e3:.2f} ms | launches "
              f"{kernels * LAUNCH_US * 1e-3:.2f} ms -> step >= {t * 1e3:.2f} ms "
              f"-> <= {meshes:,.0f} meshes/s")
    print("\n(the bound is optimistic for the reference: perfect input "
          "pipeline, peak bandwidth on random gathers)")
    print(json.dumps({"modeled_gflop_per_step": round(flops / 1e9, 2),
                      "modeled_mb_per_step": round(bytes_ / 1e6, 1),
                      "kernels": kernels,
                      "upper_bound_meshes_per_sec": results}))


if __name__ == "__main__":
    main()
