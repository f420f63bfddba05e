"""Grid-scaling diagnosis: slope-time the train step and its isolated
pieces at several swap-grid sizes to locate superlinear backward cost.

    python benchmarks/profile_grid.py [--batches 4 8] [--trace DIR]

Each timing uses the slope method (two loop lengths, each ended by a scalar
value fetch — see docs/PERFORMANCE.md "Measurement integrity note").
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


from benchmarks._common import slope_time_s as slope_time  # noqa: E402
# (shared guarded implementation — a contention spike during the short
# loop otherwise flips the slope negative)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+", default=[4, 8])
    parser.add_argument("--trace", type=str, default=None,
                        help="capture a jax.profiler trace of the largest "
                             "grid's full step into this directory")
    parser.add_argument("--compute_dtype", type=str, default=None,
                        choices=["float32", "bfloat16", "mixed"],
                        help="activation policy (default: the flagship "
                             "config's — grid-64 amortization differs "
                             "between fp32 and bf16 row regimes)")
    args = parser.parse_args()

    from craniofacialsd_vae_tpu.utils.runtime import setup_jax
    jax = setup_jax()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_geometry
    from craniofacialsd_vae_tpu.data.swap import swap_features_dynamic
    from craniofacialsd_vae_tpu.models import (SDVAEConfig, decode, encode,
                                               init_sdvae)
    from craniofacialsd_vae_tpu.training import (LossWeights,
                                                 create_train_state,
                                                 make_train_step)
    from craniofacialsd_vae_tpu.training.losses import (laplacian_loss,
                                                        mse_loss)

    geom = _flagship_geometry()
    if args.compute_dtype is None:
        from craniofacialsd_vae_tpu.utils import flagship_sdvae_config
        config = flagship_sdvae_config(REPO)
    else:
        config = SDVAEConfig(compute_dtype=args.compute_dtype)
    print(f"compute_dtype: {config.compute_dtype}")
    params = init_sdvae(jax.random.PRNGKey(0), config, geom)
    opt = optax.adamw(1e-4, weight_decay=0.0)
    n = geom.region_masks.shape[1]
    rng = np.random.default_rng(0)

    def report(name, batch, dt):
        grid = batch * batch
        print(f"  {name:<28s} grid {grid:3d}: {dt*1e3:8.2f} ms "
              f"({grid/dt:7.0f} meshes/s)")
        return dt

    results = {}
    for batch in args.batches:
        grid = batch * batch
        print(f"batch {batch} (grid {grid}):")
        x = jnp.asarray(rng.normal(size=(batch, n, 3)).astype(np.float32))
        x_grid = jnp.asarray(
            rng.normal(size=(n, grid, 3)).astype(np.float32))
        key = jax.random.PRNGKey(1)

        # 1 + 3-5. full train step and grad-of-loss-subsets (each builds its
        # own state so donation never touches the shared params)
        def step_runner(w):
            s = make_train_step(config, w, opt, batch_size=batch, swap=True)

            def run(n):
                st = create_train_state(
                    jax.tree.map(jnp.array, params), opt)
                m = None
                for i in range(n):
                    st, m = s(st, geom, x, None, None,
                              jax.random.fold_in(key, i))
                float(m["tot"])
            return run

        results[(batch, "full_step")] = report(
            "full step", batch, slope_time(step_runner(
                LossWeights(kl=1e-4, laplacian=0.1,
                            latent_consistency=0.5))))
        results[(batch, "grad_recon_kl")] = report(
            "grad: recon+kl only", batch, slope_time(step_runner(
                LossWeights(kl=1e-4, laplacian=0.0, latent_consistency=0.0))))
        results[(batch, "grad_+lap")] = report(
            "grad: recon+kl+laplacian", batch, slope_time(step_runner(
                LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.0))))
        results[(batch, "grad_+cons")] = report(
            "grad: recon+kl+consistency", batch, slope_time(step_runner(
                LossWeights(kl=1e-4, laplacian=0.0,
                            latent_consistency=0.5))))

        def dispatch_runner(fn, *fargs):
            def run(n):
                r = None
                for _ in range(n):
                    r = fn(*fargs)
                float(r)
            return run

        # 2. forward-only (losses, no grad)
        @jax.jit
        def fwd_only(params, x_grid, key):
            from craniofacialsd_vae_tpu.models import forward
            out, z, mu, logvar = forward(params, geom, config, x_grid, key,
                                         training=True)
            return mse_loss(out, x_grid) + \
                0.1 * laplacian_loss(geom.laplacian, out)

        results[(batch, "forward_only")] = report(
            "forward only (loss value)", batch,
            slope_time(dispatch_runner(fwd_only, params, x_grid, key)))

        # 6. encoder-only grad
        @jax.jit
        def enc_grad(params, x_grid):
            def f(p):
                mu, logvar = encode(p, geom, config, x_grid)
                return jnp.sum(mu ** 2) + jnp.sum(logvar ** 2)
            return jax.grad(f)(params)["mu"]["b"][0]

        results[(batch, "grad_encoder")] = report(
            "grad: encoder only", batch,
            slope_time(dispatch_runner(enc_grad, params, x_grid)))

        # 7. decoder-only grad
        z = jnp.asarray(rng.normal(size=(grid, config.latent_size))
                        .astype(np.float32))

        @jax.jit
        def dec_grad(params, z, x_grid):
            def f(p):
                out = decode(p, geom, config, z)
                return mse_loss(out, x_grid)
            return jax.grad(f)(params)["final_conv"]["b"][0]

        results[(batch, "grad_decoder")] = report(
            "grad: decoder only", batch,
            slope_time(dispatch_runner(dec_grad, params, z, x_grid)))

        # 8. swap alone
        @jax.jit
        def swap_only(x, key):
            xv = jnp.swapaxes(x, 0, 1)
            ri = jax.random.randint(key, (), 0,
                                    geom.region_masks.shape[0])
            return jnp.sum(swap_features_dynamic(xv, geom.region_masks, ri))

        results[(batch, "swap")] = report(
            "swap only", batch,
            slope_time(dispatch_runner(swap_only, x, key)))

    # scaling summary vs the smallest batch
    b0 = args.batches[0]
    print("\nscaling vs linear (value 1.0 = perfectly linear in grid):")
    for batch in args.batches[1:]:
        ratio_expect = (batch * batch) / (b0 * b0)
        for name in ["full_step", "forward_only", "grad_recon_kl",
                     "grad_+lap", "grad_+cons", "grad_encoder",
                     "grad_decoder", "swap"]:
            r = results[(batch, name)] / results[(b0, name)] / ratio_expect
            flag = "  <-- SUPERLINEAR" if r > 1.5 else ""
            print(f"  grid {batch*batch:3d} {name:<16s} {r:5.2f}x{flag}")

    if args.trace:
        import jax.profiler
        batch = args.batches[-1]
        x = jnp.asarray(rng.normal(size=(batch, n, 3)).astype(np.float32))
        weights = LossWeights(kl=1e-4, laplacian=0.1, latent_consistency=0.5)
        state = create_train_state(params, opt)
        step = make_train_step(config, weights, opt, batch_size=batch,
                               swap=True)
        state, m = step(state, geom, x, None, None, jax.random.PRNGKey(1))
        float(m["tot"])
        with jax.profiler.trace(args.trace):
            for i in range(3):
                state, m = step(state, geom, x, None, None,
                                jax.random.fold_in(jax.random.PRNGKey(1), i))
            float(m["tot"])
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
