"""Test config: force JAX onto CPU with 8 virtual devices.

SURVEY.md §4.4: multi-host/multi-chip logic is tested without a pod via
``--xla_force_host_platform_device_count`` — the TPU-idiomatic fake backend.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Preload torch BEFORE jax compiles anything: both bundle LLVM, and
# loading torch mid-session (the HF-golden tests) can segfault the next
# XLA CPU compile (observed deterministically at the first
# test_model_families test after the engine-graph-factory refactor
# lengthened the live-executable session state). Importing torch first
# binds its symbols before jaxlib's compiler runs.
import torch  # noqa: F401  (side-effect import)

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


@pytest.fixture(scope="module", autouse=True)
def _clear_engine_graph_cache():
    """Drop factory-cached engine graphs between test MODULES.

    The lru_cache'd serving graphs (engine/engine.py _engine_graphs) are
    the right lifetime for production, but retaining every module's
    compiled executables across a whole test session deterministically
    segfaults a later XLA CPU compile (observed at the first
    test_model_families compile; upstream LLVM-state issue). Per-module
    clearing keeps the big within-module reuse win."""
    yield
    import gc

    from simplellminference_tpu.engine import engine as _engine_mod
    _engine_mod._engine_graphs.cache_clear()
    gc.collect()
