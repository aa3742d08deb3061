"""Test fixtures.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh/shard_map/ppermute halo exchange) are exercised without TPU hardware —
the TPU-native analog of the reference's GPU-optional test strategy
(ref: tests/conftest.py:30-41 gpu_available probe + skip_if_no_gpu).

Note: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon, so the env var is already baked into jax.config by the
time conftest runs — forcing CPU must go through jax.config.update, and
XLA_FLAGS must be set before the first backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (the MD
# cell-list and sharded-Pallas tests each pay 10-50 s of XLA compile);
# caching compiled executables in-repo keeps repeat runs well inside the
# 10-minute CI budget. First (cold) run populates it.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    """A 4x2 device mesh over the 8 virtual CPU devices."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("x", "y"))


@pytest.fixture
def rng_key():
    return jax.random.key(0)
