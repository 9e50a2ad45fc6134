"""Test config: force an 8-device virtual CPU platform so sharding/collective
logic runs in CI without TPUs (SURVEY.md section 4 implication)."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (single real TPU
# chip); tests run on a virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
