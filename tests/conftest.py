"""Test harness: force local CPU.

The session environment preloads a tunneled-TPU JAX plugin (sitecustomize via
PYTHONPATH=/root/.axon_site) and exports JAX_PLATFORMS=axon. Backend init is
lazy, so overriding JAX_PLATFORMS here (before any test imports jax) is
enough to keep tests on local CPU. XLA_FLAGS device-count flags are latched
at jax import (already done by sitecustomize), so multi-device sharding tests
spawn their own subprocess with a scrubbed environment — see
tests/test_sharding.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

CLEAN_ENV_DOC = "see tests/conftest.py for the subprocess-with-clean-env pattern"


def clean_jax_env(n_devices: int = 8) -> dict:
    """Environment for a subprocess with N virtual CPU devices."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if p and ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
