"""Test harness: simulate an 8-device TPU-style mesh on CPU.

Must set env vars before jax is imported anywhere (SURVEY §4.5).
"""

import os

# FORCE cpu (not setdefault): the axon session environment exports
# JAX_PLATFORMS=axon, and the trainers' apply_platform_env() re-applies
# the env var through jax.config — with a dead TPU tunnel that turns any
# e2e test into a ~25-min backend-init hang. Tests always run on the
# virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
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
