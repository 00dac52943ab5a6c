"""Test harness: run on CPU with 8 virtual devices so sharding tests work anywhere."""

import os

# Hard override: the session environment exports JAX_PLATFORMS=axon (tunneled
# TPU with ~80s init); tests must run on local CPU with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
