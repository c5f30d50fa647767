"""Backend-selection honoring for CLI subprocesses.

This container's sitecustomize registers the axon TPU plugin and PINS
jax.config's jax_platforms to it, so the JAX_PLATFORMS environment
variable alone cannot move a freshly-spawned python process onto the CPU
backend (see tests/conftest.py). Pipeline CLIs that run as subprocesses
(cli.test_epochs, cli.onekey stages) call this before any backend use so
that JAX_PLATFORMS=cpu environments — CI, the synthetic onekey proof —
behave as asked.
"""
from __future__ import annotations

import os


def apply_platform_env():
    """Make jax.config agree with $JAX_PLATFORMS (no-op when unset).
    Must run before the first backend initialization."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialized; too late to move it
