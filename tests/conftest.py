"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (the bench path uses the real chip).

Note: the axon sitecustomize pins JAX_PLATFORMS=axon, so the env var alone
is not enough — we must update jax.config after import, before first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(12345)
