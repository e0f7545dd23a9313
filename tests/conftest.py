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

# Persistent compilation cache: repeat suite runs skip XLA compiles, and the
# in-process compile count stays low — the LLVM CPU JIT has crashed this
# process before after several hundred back-to-back compilations.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

# Golden math tests compare against float64; library code stays dtype-generic
# (f32 on TPU) so enabling x64 here only affects test inputs.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable references after each test module.

    Bounds the live LLVM JIT state; hundreds of accumulated executables in
    one process have segfaulted the XLA CPU backend mid-compile.
    """
    yield
    jax.clear_caches()
