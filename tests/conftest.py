"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding tests use
``xla_force_host_platform_device_count=8`` as the SURVEY §4 plan prescribes.
Must run before jax is imported anywhere.
"""

import os

# jax may already be imported by the environment's site hooks with a TPU
# platform preset; jax.config.update below still wins as long as no backend
# has been initialized yet, and XLA_FLAGS is read lazily at first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Golden math tests compare against float64; library code stays dtype-generic
# (f32 on TPU) so enabling x64 here only affects test inputs.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
