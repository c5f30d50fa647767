"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that sharding /
multi-chip code paths can be exercised without TPU hardware, and so the
suite is fast and deterministic (TPU compiles are slow).

The container's sitecustomize pre-imports jax and pins the axon TPU
platform, so an env-var-only override is not enough: we must also flip
jax_platforms via jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Modules whose tests compile full USOT models (multi-minute on this
# 1-core host). `pytest -m "not slow"` gives a quick logic/parity suite.
_SLOW_MODULES = {
    "test_engine", "test_train", "test_train_cli", "test_train_schedule",
    "test_integration",
    "test_torch_parity", "test_reference_parity", "test_tracker",
    "test_model", "test_convert", "test_onekey_pipeline", "test_lockstep",
}
# Fast exceptions inside slow modules (pure ring/bookkeeping logic).
_FAST_CLASSES = {"TestMemoryRing", "TestMemoryRingLongVideo",
                 "TestPostprocessParity", "TestBatchedMemoryWrite"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.cls is not None and item.cls.__name__ in _FAST_CLASSES:
            continue
        if item.module.__name__.split(".")[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
