"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# force CPU: numeric goldens assume f32 math, and the virtual 8-device
# mesh only exists on the host platform (override with DYCON_TEST_PLATFORM)
_platform = os.environ.get("DYCON_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: single-core XLA compiles dominate test time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# some environments register an accelerator plugin from sitecustomize and
# force jax_platforms there, overriding the env var — re-assert at config
# level before any backend is initialized
jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
