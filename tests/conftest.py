"""Test env: force the JAX CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4)."""

import os

# The image's sitecustomize pins JAX_PLATFORMS=axon (real TPU via tunnel);
# tests must run on the virtual 8-device CPU backend, so override both the
# env (for subprocesses) and the live config (sitecustomize wins over env).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def rgb_image(rng):
    return rng.integers(0, 256, size=(97, 123, 3), dtype=np.uint8)


@pytest.fixture
def rgba_image(rng):
    return rng.integers(0, 256, size=(64, 80, 4), dtype=np.uint8)
