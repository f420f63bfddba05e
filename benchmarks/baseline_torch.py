"""Measured PyTorch baseline for bench.py's vs_baseline denominator.

The reference repo cannot run here (torch_scatter / pytorch3d / openmesh are
CUDA/C++ deps not in this image), so this is an independent PyTorch
re-implementation of the same training computation — SpiralNet++ gather +
nn.Linear convs, sparse-matmul pooling, recon + KL + Laplacian +
latent-consistency losses, Adam — on the identical craniofacial geometry
(17,039 verts, 4-level hierarchy, batch 4 → 16 swap grid). It uses the
*imported reference transforms and spirals* so the measured work matches the
reference exactly (reference call stack: model_manager.py:274-326,
model.py:27-55).

Timing counts forward + losses + backward + optimizer step (the feature-swap
collate, which the reference runs in CPU DataLoader workers, is excluded —
generous to the baseline). Writes BASELINE_MEASURED.json.

Run: python benchmarks/baseline_torch.py [--steps N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_geometry():
    from craniofacialsd_vae_tpu.geometry import (import_reference_spirals,
                                                 import_reference_transforms,
                                                 load_template)

    tpl = load_template("/root/reference/demo_files/template.ply")
    _, downs, ups = import_reference_transforms(
        "/root/reference/demo_files/transforms.pkl")
    spirals = import_reference_spirals(
        "/root/reference/demo_files/spirals.pkl")

    def to_torch_sparse(coo):
        idx = torch.tensor(np.stack([coo.rows, coo.cols]), dtype=torch.long)
        return torch.sparse_coo_tensor(
            idx, torch.tensor(coo.vals, dtype=torch.float32),
            coo.shape).coalesce()

    rows, cols, vals = tpl.laplacian
    lap = torch.sparse_coo_tensor(
        torch.tensor(np.stack([rows, cols]), dtype=torch.long),
        torch.tensor(vals), (tpl.num_vertices, tpl.num_vertices)).coalesce()

    return (tpl, [torch.tensor(s) for s in spirals],
            [to_torch_sparse(d) for d in downs],
            [to_torch_sparse(u) for u in ups], lap)


def sparse_pool(x, trans):
    """Batched sparse @ dense via the stacking trick
    (reference utils.py:153-165 batch_mm)."""
    b = x.shape[0]
    stacked = x.transpose(0, 1).reshape(trans.shape[1], -1)
    out = torch.sparse.mm(trans, stacked)
    return out.reshape(trans.shape[0], b, -1).transpose(1, 0)


class SpiralConvT(torch.nn.Module):
    def __init__(self, c_in, c_out, indices):
        super().__init__()
        self.register_buffer("indices", indices)
        self.layer = torch.nn.Linear(c_in * indices.shape[1], c_out)

    def forward(self, x):
        n, l = self.indices.shape
        bs = x.shape[0]
        g = torch.index_select(x, 1, self.indices.reshape(-1))
        return self.layer(g.view(bs, n, -1))


class BaselineNet(torch.nn.Module):
    def __init__(self, spirals, downs, ups, chans=(3, 32, 32, 32, 64),
                 latent=75):
        super().__init__()
        self.downs, self.ups = downs, ups
        self.en = torch.nn.ModuleList(
            SpiralConvT(chans[i], chans[i + 1], spirals[i])
            for i in range(4))
        nv = downs[-1].shape[0]
        self.mu = torch.nn.Linear(nv * chans[-1], latent)
        self.logvar = torch.nn.Linear(nv * chans[-1], latent)
        self.de_dense = torch.nn.Linear(latent, nv * chans[-1])
        de_chans = [(chans[4], chans[4]), (chans[4], chans[3]),
                    (chans[3], chans[2]), (chans[2], chans[1])]
        self.de = torch.nn.ModuleList(
            SpiralConvT(ci, co, spirals[3 - j])
            for j, (ci, co) in enumerate(de_chans))
        self.final = SpiralConvT(chans[1], chans[0], spirals[0])
        self.nv, self.c_last = nv, chans[-1]

    def forward(self, x):
        h = x
        for i, conv in enumerate(self.en):
            h = sparse_pool(torch.nn.functional.elu(conv(h)), self.downs[i])
        h = h.reshape(h.shape[0], -1)
        mu, logvar = self.mu(h), self.logvar(h)
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
        h = self.de_dense(z).view(-1, self.nv, self.c_last)
        for j, conv in enumerate(self.de):
            h = torch.nn.functional.elu(conv(sparse_pool(h, self.ups[3 - j])))
        return self.final(h), z, mu, logvar


def latent_consistency(z, lo, hi, bs=4, eta1=0.5, eta2=0.5):
    zf = z[:, lo:hi].view(bs, bs, -1)
    ze = torch.cat([z[:, :lo], z[:, hi:]], dim=1).view(bs, bs, -1)
    iu = torch.triu_indices(bs, bs, 1)
    lg = ((zf[iu[0]] - zf[iu[1]]) ** 2).sum(-1).reshape(-1)
    dg = ((zf[:, iu[0]] - zf[:, iu[1]]) ** 2).sum(-1).T.reshape(-1)
    dr = ((ze[iu[0]] - ze[iu[1]]) ** 2).sum(-1).reshape(-1)
    lr = ((ze[:, iu[0]] - ze[:, iu[1]]) ** 2).sum(-1).T.reshape(-1)
    return (torch.clamp(lg - dg + eta1, min=0).sum() +
            torch.clamp(lr - dr + eta2, min=0).sum()) / (bs ** 3 - bs ** 2)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    torch.manual_seed(0)
    tpl, spirals, downs, ups, lap = build_geometry()
    net = BaselineNet(spirals, downs, ups)
    optimizer = torch.optim.Adam(net.parameters(), lr=1e-4)

    bs, n = 4, tpl.num_vertices
    grid = bs * bs
    x = torch.randn(grid, n, 3)

    def step():
        optimizer.zero_grad()
        out, z, mu, logvar = net(x)
        recon = torch.nn.functional.mse_loss(out, x)
        kl = torch.mean(-0.5 * torch.sum(
            1 + logvar - mu ** 2 - logvar.exp(), dim=1))
        lapl = (sparse_pool(out, lap).norm(dim=-1) / n).sum() / grid
        cons = latent_consistency(z, 10, 15, bs)
        loss = recon + 1e-4 * kl + 0.1 * lapl + 0.5 * cons
        loss.backward()
        optimizer.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps
    meshes_per_sec = grid / dt

    # serving latency: single-mesh encode+decode (reference
    # model_manager.py:395-426 call pattern), eval mode, no grad
    x1 = torch.randn(1, n, 3)
    with torch.no_grad():
        net(x1)                                 # warmup
        lat = []
        for _ in range(10):
            t0 = time.perf_counter()
            net(x1)
            lat.append(time.perf_counter() - t0)
    encdec_ms = sorted(lat)[len(lat) // 2] * 1000

    result = {
        "train_meshes_per_sec": round(meshes_per_sec, 2),
        "step_ms": round(dt * 1000, 1),
        "encode_decode_ms": round(encdec_ms, 2),
        "device": "cpu",
        "torch": torch.__version__,
        "note": ("PyTorch re-implementation of the reference train step on "
                 "the identical craniofacial geometry; reference's own CUDA "
                 "deps unavailable in this image"),
    }
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
