"""Test configuration: force an 8-device virtual CPU platform so every
multi-chip sharding path (pjit/shard_map over a Mesh) runs in CI without TPU
hardware. Must run before the first `import jax` anywhere in the test
process."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = \
        _flags + " --xla_force_host_platform_device_count=8"

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var;
# jax.config is the reliable way to force the virtual-CPU platform.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
DEMO_FILES = "/root/reference/demo_files"
TEMPLATE_PLY = os.path.join(DEMO_FILES, "template.ply")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier (subprocess/e2e tests, ~15 extra min)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: subprocess/e2e tests excluded from the default quick tier "
        "(enable with --runslow)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest -q` runs the quick tier (<5 min — the
    builder-iteration loop); `pytest -q --runslow` runs the full pyramid
    including the subprocess e2e tests (VERDICT r3 weak #6)."""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier — run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def has_demo_files():
    return os.path.exists(TEMPLATE_PLY)


requires_demo = pytest.mark.skipif(
    not has_demo_files(), reason="reference demo_files not mounted")


@pytest.fixture(scope="session")
def template():
    from craniofacialsd_vae_tpu.geometry import load_template
    return load_template(TEMPLATE_PLY)


@pytest.fixture(scope="session")
def geometry_bundle(template):
    """The 4-level craniofacial hierarchy, cached in tests/fixtures."""
    from craniofacialsd_vae_tpu.geometry import load_or_compute_geometry
    return load_or_compute_geometry(
        FIXTURES, template, [4, 4, 4, 4], [9, 9, 9, 9], [1, 1, 1, 1])


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cli_workspace(tmp_path_factory):
    """A miniature but complete dataset workspace (synthetic template +
    30 class-labeled OBJ meshes + a 2-level config) shared by the CLI e2e
    tests (test_train_cli.py) and the migration e2e (test_torch_import.py).
    """
    import yaml

    from craniofacialsd_vae_tpu.geometry import write_obj, write_ply
    from craniofacialsd_vae_tpu.geometry.synthetic import synthetic_template

    root = tmp_path_factory.mktemp("cli_ws")
    tpl = synthetic_template(subdivisions=2, n_regions=3)
    tpl_path = str(root / "template.ply")
    write_ply(tpl_path, tpl.pos, tpl.face, tpl.colors)

    mesh_dir = root / "meshes"
    mesh_dir.mkdir()
    ws_rng = np.random.default_rng(0)
    for c in ["a", "c", "n"]:
        for i in range(10):
            verts = tpl.pos + ws_rng.normal(scale=0.03, size=tpl.pos.shape) \
                + (0.05 if c == "a" else -0.05 if c == "c" else 0.0)
            write_obj(str(mesh_dir / f"{c}_{i}.obj"), verts, tpl.face)

    config = {
        "data": {
            "template_path": tpl_path,
            "dataset_path": str(mesh_dir),
            "precomputed_path": str(root / "precomp"),
            "normalize_data": True,
            "to_mm_constant": 10.0,
            "swap_features": True,
            "stratified_split": True,
            "augmentation_factor": 0,
        },
        "optimization": {
            "epochs": 2, "batch_size": 2, "lr": 1e-3, "weight_decay": 0,
            "laplacian_weight": 0.1, "kl_weight": 1e-4,
            "latent_consistency_weight": 0.5,
            "latent_consistency_eta1": 0.5, "latent_consistency_eta2": 0.5,
        },
        "model": {
            "sampling": {"type": "basic", "sampling_factors": [2, 2]},
            "spirals": {"length": [5, 5], "dilation": [1, 1]},
            "in_channels": 3, "out_channels": [8, 16],
            "latent_size": 6, "pre_z_sigmoid": False,
        },
        "classifier": {
            "main_model_type": "qda", "mlp_training_type": "after",
            "mlp_hidden_features": [8], "mlp_lr": 1e-3, "mlp_epochs": 2,
        },
        # every cadence fires exactly once within the 2-epoch run
        "logging_frequency": {"tb_renderings": 2, "save_weights": 2},
    }
    cfg_path = str(root / "cli.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return root, cfg_path
