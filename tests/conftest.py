"""Test harness configuration.

Tests run on an 8-device *virtual CPU mesh* (the driver separately dry-runs
the multi-chip path, and the bench harness runs on real TPU): environment
must be set before JAX initializes its backends.
"""

import os

_USE_TPU = os.environ.get("SMMC_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def historical_table():
    from stock_market_monte_carlo_tpu.data.loader import (
        SYNTHETIC_CSV,
        read_historical_returns,
    )

    return read_historical_returns(SYNTHETIC_CSV)


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices("cpu")[:8])
    assert devices.size == 8, "expected 8 virtual CPU devices"
    return Mesh(devices, ("paths",))
