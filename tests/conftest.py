"""Test config: force JAX onto CPU with 8 virtual devices.

SURVEY.md §4.4: multi-host/multi-chip logic is tested without a pod via
``--xla_force_host_platform_device_count`` — the TPU-idiomatic fake backend.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize hook imports jax at interpreter start and overrides the
# platform list via jax.config.update("jax_platforms", "axon,cpu") — so both
# the env var AND the config must be forced back to cpu here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
