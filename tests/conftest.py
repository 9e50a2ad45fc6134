"""Test config: force an 8-device virtual CPU platform so sharding/collective
logic runs in CI without TPUs (SURVEY.md section 4 implication).

Note: the session image's sitecustomize registers the axon TPU backend in
every interpreter before user code runs and the env pins JAX_PLATFORMS=axon,
so setting os.environ here is not enough — we must update jax.config before
any backend is initialized, and we assert the platform to fail loudly if the
TPU ever leaks into tests (it is single-tenant and hangs on contention).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests may spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_platform():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield


@pytest.fixture
def rng():
    return np.random.RandomState(0)
