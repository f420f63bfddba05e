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
