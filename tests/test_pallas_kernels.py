"""Interpret-mode tests for the Pallas TPU kernels (runs on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from xrspatial_tpu.convolution import circle_kernel
from xrspatial_tpu.kernels.pallas_surface import surface_pallas
from xrspatial_tpu.kernels.pallas_window import focal_stats_pallas
from xrspatial_tpu.kernels.surface import (aspect_jit, curvature_jit,
                                           hillshade_jit, slope_jit)
from xrspatial_tpu.kernels.window import kernel_offsets, window_stats


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    arr = (rng.random((40, 150)) * 500).astype(np.float32)
    arr[3, 7] = np.nan
    return jnp.asarray(arr)


def test_pallas_surface_matches_xla(data):
    which = ("slope", "aspect", "curvature", "hillshade")
    out = np.asarray(surface_pallas(
        data, jnp.float32(2.0), jnp.float32(3.0), jnp.float32(225.0),
        jnp.float32(25.0), which, interpret=True))
    refs = [
        slope_jit(data, jnp.float32(2.0), jnp.float32(3.0)),
        aspect_jit(data),
        curvature_jit(data, jnp.float32(2.5)),
        hillshade_jit(data, jnp.float32(225.0), jnp.float32(25.0)),
    ]
    for k, name in enumerate(which):
        ref = np.asarray(refs[k])
        m = ~(np.isnan(out[k]) | np.isnan(ref))
        assert (np.isnan(out[k]) == np.isnan(ref)).all(), name
        np.testing.assert_allclose(out[k][m], ref[m], atol=5e-5,
                                   err_msg=name)


def test_pallas_window_matches_xla(data):
    offs = kernel_offsets(circle_kernel(1, 1, 1.5))
    stats = ("mean", "max", "min", "std", "var", "sum", "range")
    out = np.asarray(focal_stats_pallas(data, offs, stats, interpret=True))
    ref = window_stats(data, offs, stats)
    ref = np.asarray(jnp.stack([ref[s] for s in stats]))
    m = ~(np.isnan(out) | np.isnan(ref))
    assert (np.isnan(out) == np.isnan(ref)).all()
    np.testing.assert_allclose(out[m], ref[m], atol=1e-4)
