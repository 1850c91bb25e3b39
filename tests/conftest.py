"""Test configuration: force an 8-device virtual CPU backend.

Multi-chip sharding logic is tested on a fake 8-device CPU mesh
(`xla_force_host_platform_device_count`), the TPU analogue of a fake NCCL
backend — see SURVEY.md section 4. Must run before the first jax import.
"""

import os

# The container pins JAX_PLATFORMS=axon (real TPU via tunnel); tests run on a
# virtual 8-device CPU backend instead, so both the env var and the live jax
# config must be overridden before any computation runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
