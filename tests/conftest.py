"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

Mirrors the reference's test strategy (SURVEY.md §4): multi-chunk dask on one
machine was how "distributed" was tested there; here a virtual 8-device CPU
platform exercises the same shard_map + ppermute halo paths a real pod would.
"""

import os

# The ambient environment may point JAX_PLATFORMS at a real TPU (an "axon"
# tunnel registered by sitecustomize, which imports jax before any test code
# runs).  Tests run on the virtual multi-device CPU platform unless opted
# out — applied via jax.config because the env var was already consumed at
# interpreter start.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("XRSPATIAL_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def random_data(size, dtype):
    rng = np.random.default_rng(2841)
    data = rng.integers(-100, 100, size=size)
    return data.astype(dtype)


@pytest.fixture
def elevation_raster():
    """8x6 elevation grid with a NaN row (mirrors reference conftest.py:13-25)."""
    rng = np.random.default_rng(7)
    data = (rng.random((8, 6)) * 1000).astype(np.float32)
    data[0, :] = np.nan
    return data


@pytest.fixture
def elevation_raster_no_nans():
    rng = np.random.default_rng(7)
    return (rng.random((8, 6)) * 1000).astype(np.float32)


@pytest.fixture
def raster():
    rng = np.random.default_rng(11)
    return rng.integers(0, 10, size=(8, 6)).astype(np.float32)
