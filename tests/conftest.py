"""Test configuration: force a virtual 8-device CPU mesh.

Multi-device sharding tests run on the standard JAX fake multi-device CPU
backend (SURVEY.md §4); real-TPU benchmarking happens in bench.py, not in
the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU tunnel backend via
# jax.config.update("jax_platforms", "axon,cpu"), which overrides the env
# var; undo it so tests run on the local 8-device CPU backend.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
assert jax.default_backend() == "cpu", (
    "tests must run on the fake multi-device CPU backend, got "
    + jax.default_backend())

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
