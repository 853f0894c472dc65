"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Tests must run without a TPU; multi-chip sharding tests use
xla_force_host_platform_device_count.  The same suite passes on real TPU by
unsetting JAX_PLATFORMS (device-gated tests check jax.devices()).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize may register a TPU plugin and force
# jax_platforms to it; tests must run on the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")
# Cache compiled kernels across test runs (first full run is compile-heavy).
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference():
    """The upstream numpy implementation, used as a golden oracle."""
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference implementation not available")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import svgrasterize

    return svgrasterize


@pytest.fixture(scope="session")
def demo_dir():
    path = os.path.join(REFERENCE_DIR, "demo")
    if not os.path.isdir(path):
        pytest.skip("reference demo assets not available")
    return path
