"""Test harness: simulate an 8-device TPU-style mesh on CPU.

Must set env vars before jax is imported anywhere (SURVEY §4.5).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var and
# pays a ~60s tunnel init; the config route is honored and keeps tests on
# the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
