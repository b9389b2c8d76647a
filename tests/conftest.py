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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
