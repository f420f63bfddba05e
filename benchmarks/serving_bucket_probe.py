"""Measure per-mesh encode+decode device compute vs serving bucket size.

    python benchmarks/serving_bucket_probe.py [--batches 16 32 64 128]

The DiagnosisService pads requests to static power-of-two buckets up to
``max_batch`` (serving.py). bench.py records the batch-16 per-mesh compute
as the serving throughput ceiling; this probe asks whether LARGER buckets
amortize further (more rows per gather dispatch, wider elementwise
streams) or go flat/regress. Method is bench.py's chained scan — decode
output feeds the next encode so XLA cannot hoist the chain — slope-timed
(benchmarks._common.slope_time_s) to cancel dispatch+fetch, with the
matmul canary bracketing each batch size so a contention swing between
measurements is visible in the output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[16, 32, 64, 128])
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--json", type=str, default=None)
    args = parser.parse_args(argv)

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_geometry
    from benchmarks._common import make_matmul_canary, slope_time_s
    from craniofacialsd_vae_tpu.models import decode, encode, init_sdvae
    from craniofacialsd_vae_tpu.utils import flagship_sdvae_config

    geom = _flagship_geometry()
    config = flagship_sdvae_config(REPO)
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    n_verts = geom.spirals[0].num_vertices
    rng = np.random.default_rng(0)
    matmul = make_matmul_canary(rng)

    def encdec_chain(n):
        def body(x, _):
            mu, _ = encode(params, geom, config, x)
            return decode(params, geom, config, mu), ()

        return jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0])

    results = {"platform": jax.devices()[0].platform, "per_mesh_ms": {},
               "matmul_canary_ms": {}}
    for b in args.batches:
        x0 = jnp.asarray(rng.normal(size=(n_verts, b, 3)).astype(np.float32))
        programs = {}

        def run(n_steps):
            if n_steps not in programs:
                programs[n_steps] = encdec_chain(n_steps)
            float(programs[n_steps](x0)[0, 0, 0])

        c_before = matmul()
        per_iter = sorted(slope_time_s(run) for _ in range(args.trials))
        per_iter_s = per_iter[len(per_iter) // 2]
        c_after = matmul()
        per_mesh_ms = per_iter_s * 1e3 / b
        results["per_mesh_ms"][b] = round(per_mesh_ms, 4)
        results["matmul_canary_ms"][b] = [round(c_before, 2),
                                          round(c_after, 2)]
        print(f"batch {b:4d}: {per_mesh_ms:.4f} ms/mesh "
              f"({b / per_iter_s:.0f} meshes/s)  "
              f"canary {c_before:.2f}/{c_after:.2f} ms", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
