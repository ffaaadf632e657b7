"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (mirrors SURVEY.md section 4's guidance)."""
import os

# NOTE: in this environment the axon TPU plugin ignores JAX_PLATFORMS; the
# singular JAX_PLATFORM_NAME (and jax.config) do force CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the default matmul precision is reduced (bf16-class accumulation) which is
# what we want on TPU for speed, but numerical cross-checks need full f32
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
