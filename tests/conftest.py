"""Test configuration: virtual 8-device CPU mesh + float64 for golden math.

Production runs target TPU float32; tests validate the math in float64 on a
virtual CPU mesh (XLA_FLAGS host-platform device count) so sharding tests run
without hardware, per the multi-chip dry-run contract.
"""
import os

# Force CPU for tests even when the session env pins a TPU platform
# (e.g. JAX_PLATFORMS=axon, which a sitecustomize re-asserts over the env
# var): tests validate math in float64 and sharding on a virtual 8-device
# mesh, neither of which the single TPU chip provides.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
