"""Multihost scanned epochs: a REAL two-process jax.distributed run (gRPC
coordinator, 4 virtual CPU devices per process → 8-device global mesh)
drives manager.run_epochs_scanned through the shard_map'd multi-epoch
dispatch, with the MultihostBatchIterator plan path. Both processes must
finish, agree on the loss trajectory, and hold identical parameters
(replicated state stays in lockstep across DCN)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two-process jax.distributed run

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from craniofacialsd_vae_tpu.parallel import (MultihostBatchIterator,
                                             initialize_multihost)
initialize_multihost(coord, 2, pid)
assert jax.process_count() == 2 and jax.device_count() == 8

import numpy as np
from craniofacialsd_vae_tpu.data.dataset import BatchIterator, build_datasets
from craniofacialsd_vae_tpu.manager import ModelManager
import yaml

with open(os.path.join(root, "config.yaml")) as f:
    config = yaml.safe_load(f)
config["data"]["precomputed_path"] = os.path.join(root, f"precomp{pid}")

manager = ModelManager(
    config, precomputed_storage_path=config["data"]["precomputed_path"])
manager.enable_data_parallel()          # global 8-device mesh
train, val, test, norm, weights = build_datasets(config, manager.template)
manager.set_class_conversions_and_weights(weights)

G = manager.batch_size * jax.device_count()
ti = MultihostBatchIterator(
    BatchIterator(train, G, shuffle=True, seed=3,
                  class2idx=manager._class2idx_dict), manager.mesh)
vi = MultihostBatchIterator(
    BatchIterator(val, G, shuffle=True, seed=4,
                  class2idx=manager._class2idx_dict), manager.mesh)
assert manager.can_scan_epochs(ti, vi), (len(ti), len(vi))

tr_list, va_list = manager.run_epochs_scanned(ti, vi, 2)
assert all(np.isfinite(e["tot"]) for e in tr_list + va_list)
checksum = float(sum(np.abs(np.asarray(l)).sum()
                     for l in jax.tree.leaves(manager.state.params)))
print(f"MH_SCAN_OK pid={pid} tot={tr_list[-1]['tot']:.6f} "
      f"val={va_list[-1]['tot']:.6f} ck={checksum:.6f}")
"""


@pytest.mark.timeout(600)
def test_two_process_scanned_epochs(tmp_path):
    from craniofacialsd_vae_tpu.geometry import write_obj, write_ply
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template

    root = tmp_path
    tpl = synthetic_template(subdivisions=2, n_regions=3)
    tpl_path = str(root / "template.ply")
    write_ply(tpl_path, tpl.pos, tpl.face, tpl.colors)
    mesh_dir = root / "meshes"
    mesh_dir.mkdir()
    rng = np.random.default_rng(0)
    for c in ["a", "c", "n"]:
        for i in range(60):
            verts = tpl.pos + rng.normal(scale=0.03, size=tpl.pos.shape)
            write_obj(str(mesh_dir / f"{c}_{i}.obj"), verts, tpl.face)

    config = {
        "data": {"template_path": tpl_path, "dataset_path": str(mesh_dir),
                 "precomputed_path": "unused", "normalize_data": True,
                 "to_mm_constant": 10.0, "swap_features": True,
                 "stratified_split": True, "augmentation_factor": 0},
        "optimization": {"epochs": 2, "batch_size": 2, "lr": 1e-3,
                         "weight_decay": 0, "laplacian_weight": 0.1,
                         "kl_weight": 1e-4,
                         "latent_consistency_weight": 0.5,
                         "latent_consistency_eta1": 0.5,
                         "latent_consistency_eta2": 0.5},
        "model": {"sampling": {"type": "basic", "sampling_factors": [2, 2]},
                  "spirals": {"length": [5, 5], "dilation": [1, 1]},
                  "in_channels": 3, "out_channels": [8, 16],
                  "latent_size": 6, "pre_z_sigmoid": False},
        "logging_frequency": {"tb_renderings": 100, "save_weights": 100},
    }
    import yaml
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid), str(root)],
        cwd="/root/repo", env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"stdout:\n{out}\nstderr:\n{err[-3000:]}"
        outs.append(out)
    lines = [next(ln for ln in o.splitlines() if "MH_SCAN_OK" in ln)
             for o in outs]
    # same losses and identical replicated params on both processes
    f0 = dict(kv.split("=") for kv in lines[0].split()[1:])
    f1 = dict(kv.split("=") for kv in lines[1].split()[1:])
    assert f0["tot"] == f1["tot"] and f0["val"] == f1["val"]
    assert f0["ck"] == f1["ck"]
