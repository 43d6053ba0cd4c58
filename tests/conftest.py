"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise the multi-chip sharding paths without TPU hardware by asking
XLA for 8 host-platform devices (SURVEY.md §4 test plan).  Must run before
jax initializes its backends, hence environment setup at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image pre-sets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# fp32 everywhere in tests (TPU runs use bf16 compute via config).
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The image's axon sitecustomize force-registers the TPU backend regardless
# of JAX_PLATFORMS; the programmatic override below wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the 1-core host pays tens of seconds per jit
# compile; warm reruns of the suite skip all of them (cache dir gitignored).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices


@pytest.fixture
def rng():
    return np.random.default_rng(0)
