"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding logic is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU benchmarking lives in
bench.py, not in the test suite.
"""

import os

# Tests exercise pipelines without real checkpoints; production fails loudly
# instead (tests covering the raise delete this var via monkeypatch).
os.environ.setdefault("ATLASPATCH_ALLOW_RANDOM_WEIGHTS", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize module may have imported jax (registering a TPU plugin) before
# this file runs; force the platform through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
