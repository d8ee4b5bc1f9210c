"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that every multi-chip code path
(psum'd streaming statistics, sharded train steps) is exercised without TPU
hardware. float64 is enabled so the OT math core can be validated against the
scipy oracles at the reference tolerances (reference: tests use
``dtype=torch.double`` throughout, e.g. /root/reference/tests/test_w2_utils.py).
"""
import os

# Must be set before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is ignored by this environment's 'axon' TPU
# plugin — only the config update reliably forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
    "tests must run on the 8-device virtual CPU mesh, got "
    f"{jax.default_backend()} x{len(jax.devices())}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
