"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4); the real
TPU path is exercised by bench.py / __graft_entry__.py.
"""

import os

# SSDR_TEST_TPU=1 runs the suite on the real TPU instead (validates the
# Pallas kernels + sorted fast path; most tests still pass, slower).
_USE_TPU = os.environ.get("SSDR_TEST_TPU", "") == "1"

# Must be set before jax is imported anywhere.
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (loaded by sitecustomize on this image) forces
# jax_platforms="axon,cpu" at interpreter startup, overriding the env var —
# force it back so the suite runs on the virtual 8-device CPU mesh.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model/kernel compiles dominate test wall-clock
# on this host; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
