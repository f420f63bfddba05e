"""Member-parallel training: the vmapped ensemble/sweep member axis
sharded over a device mesh (parallel.mesh.make_member_mesh /
shard_member_axis, wired as tools/train_ensemble.py --shard_members and
tools/sweep.py --shard_members).

Members/variants are mathematically independent, so sharding the K axis
partitions the compiled program with ZERO collectives — each device
trains K/n_devices members. The load-bearing claims pinned here:

1. sharded-input training produces the same per-member parameters and
   metrics as the single-device vmapped dispatch (the ensemble/sweep
   parity oracles then transitively tie it to solo train.py runs);
2. the output state actually SPANS the mesh (XLA propagated the input
   sharding instead of replicating);
3. an uneven K fails loudly instead of silently replicating.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

N_EPOCHS, ST, SV, B, K = 2, 3, 1, 2, 8


@pytest.fixture(scope="module")
def tiny_setup():
    """Tiny synthetic geometry + config + a fixed epoch plan, shared by
    the ensemble and sweep sharding tests."""
    from craniofacialsd_vae_tpu.geometry import precompute_geometry
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template
    from craniofacialsd_vae_tpu.models import SDVAEConfig, SpiralGeometry

    tpl = synthetic_template(subdivisions=2, n_regions=3)
    bundle = precompute_geometry(tpl, [2, 2], [5, 5], [1, 1])
    geom = SpiralGeometry.from_bundle(bundle)
    config = SDVAEConfig(out_channels=(8, 16), latent_size=6)

    n = tpl.num_vertices
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(8, n, 3)).astype(np.float32))
    tr_idx = jnp.asarray(rng.integers(0, 8, size=(N_EPOCHS, ST, B))
                         .astype(np.int32))
    va_idx = jnp.asarray(rng.integers(0, 8, size=(N_EPOCHS, SV, B))
                         .astype(np.int32))
    per = ST + SV
    e_ar = np.arange(N_EPOCHS)[:, None]
    tr_sid = jnp.asarray((1 + e_ar * per + np.arange(ST)[None])
                         .astype(np.int32))
    va_sid = jnp.asarray((1 + e_ar * per + ST + np.arange(SV)[None])
                         .astype(np.int32))
    plan = (data, data, tr_idx, tr_sid, va_idx, va_sid, None, None, None)
    return {"config": config, "geom": geom, "plan": plan}


def _assert_state_parity(ref_state, sh_state):
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(sh_state.params))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_sh[path]), np.asarray(leaf),
            rtol=2e-5, atol=1e-6, err_msg=f"param {path}")


def _assert_spans_mesh(state, n_devices):
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == n_devices, \
        (f"output state replicated instead of sharded: spans "
         f"{len(leaf.sharding.device_set)} of {n_devices} devices")


@pytest.mark.slow
def test_ensemble_sharded_matches_unsharded(tiny_setup):
    from craniofacialsd_vae_tpu.parallel import (make_member_mesh,
                                                 shard_member_axis)
    from craniofacialsd_vae_tpu.training import LossWeights, coupled_adam
    from craniofacialsd_vae_tpu.training.ensemble import (
        ensemble_epoch_keys, init_ensemble_state,
        make_ensemble_scanned_epochs)

    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    cfg, geom = tiny_setup["config"], tiny_setup["geom"]
    opt = coupled_adam(1e-3, 0.0)
    weights = LossWeights()
    ens_fn = make_ensemble_scanned_epochs(cfg, weights, opt, B, swap=True)

    # donate_argnums=(0,) consumes the state: init twice (deterministic)
    ref_state, _, ref_va = ens_fn(
        init_ensemble_state(cfg, geom, opt, K, base_seed=0), geom,
        *tiny_setup["plan"], ensemble_epoch_keys(K, base_seed=0))

    mesh = make_member_mesh()
    sh_state = shard_member_axis(
        mesh, init_ensemble_state(cfg, geom, opt, K, base_seed=0))
    sh_keys = shard_member_axis(mesh, ensemble_epoch_keys(K, base_seed=0))
    sh_state, _, sh_va = ens_fn(sh_state, geom, *tiny_setup["plan"],
                                sh_keys)

    _assert_spans_mesh(sh_state, 8)
    _assert_state_parity(ref_state, sh_state)
    for k in ref_va:
        np.testing.assert_allclose(np.asarray(sh_va[k]),
                                   np.asarray(ref_va[k]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"val metric {k}")


@pytest.mark.slow
def test_sweep_sharded_matches_unsharded(tiny_setup):
    from craniofacialsd_vae_tpu.parallel import (make_member_mesh,
                                                 shard_member_axis)
    from craniofacialsd_vae_tpu.training.sweep import (
        build_variants, init_sweep_state, make_sweep_scanned_epochs,
        stack_hyperparams)

    cfg, geom = tiny_setup["config"], tiny_setup["geom"]
    base = {
        "data": {"swap_features": True},
        "optimization": {
            "lr": 1e-3, "weight_decay": 0.0, "kl_weight": 1e-4,
            "laplacian_weight": 0.1, "latent_consistency_weight": 0.5,
            "latent_consistency_eta1": 0.5,
            "latent_consistency_eta2": 0.5,
        },
    }
    # moderate lr spread: partitioned-vs-fused programs differ at the
    # last-ulp level and Adam's rsqrt normalization amplifies that
    # chaotically at aggressive lrs — the parity contract is FP-level
    # equivalence, not bit equality across different XLA partitionings
    overrides = [{"lr": lr, "weight_decay": wd}
                 for lr in (5e-4, 1e-3, 2e-3, 3e-3)
                 for wd in (0.0, 1e-3)]
    hp = stack_hyperparams(build_variants(base, overrides))
    fn = make_sweep_scanned_epochs(cfg, batch_size=B, swap=True)
    key = jax.random.PRNGKey(1)

    ref_state, _, ref_va = fn(init_sweep_state(cfg, geom, K, seed=0), hp,
                              geom, *tiny_setup["plan"], key)

    mesh = make_member_mesh()
    sh_state = shard_member_axis(mesh, init_sweep_state(cfg, geom, K,
                                                        seed=0))
    sh_hp = shard_member_axis(mesh, hp)
    sh_state, _, sh_va = fn(sh_state, sh_hp, geom, *tiny_setup["plan"],
                            key)

    _assert_spans_mesh(sh_state, 8)
    _assert_state_parity(ref_state, sh_state)
    for k in ref_va:
        np.testing.assert_allclose(np.asarray(sh_va[k]),
                                   np.asarray(ref_va[k]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"val metric {k}")


def test_shard_member_axis_divisibility_error():
    from craniofacialsd_vae_tpu.parallel import (make_member_mesh,
                                                 shard_member_axis)

    mesh = make_member_mesh()                      # 8 devices
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        shard_member_axis(mesh, jnp.zeros((6, 3)))
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        shard_member_axis(mesh, jnp.asarray(1.0))  # 0-d leaf
    # trimmed mesh: 2 members over 2 devices is fine
    small = make_member_mesh(n_devices=2)
    out = shard_member_axis(small, jnp.zeros((2, 3)))
    assert len(out.sharding.device_set) == 2
