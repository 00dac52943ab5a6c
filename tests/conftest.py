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

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu"),
# which BEATS the env var — without this, every op (and its ~0.7 s remote
# compile) silently runs on the tunneled TPU. The config API wins last-write.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: drops warm test runs to ~ms/op.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/iht_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # flag name varies across jax versions
    pass

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
