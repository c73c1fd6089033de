"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/*) is validated without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4); plain numeric
tests also run on CPU so the suite is fast and hermetic.

Note: this environment's site customization imports jax at interpreter
start, so setting ``JAX_PLATFORMS`` here is too late — the platform must be
switched through ``jax.config`` instead (works because backends initialise
lazily on first device use).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running closed-loop/system tests")
