"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Tests exercise multi-chip sharding logic without TPU hardware (the driver
separately dry-runs the multichip path; real-TPU benchmarks run via bench.py).
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# takes effect as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Every test not marked ``slow`` belongs to the quick tier, so
    ``pytest -m quick`` is the fast pre-commit gate and ``pytest`` (or
    ``-m slow``) runs the heavy remainder in CI cadence."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
