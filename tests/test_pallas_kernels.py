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


def test_pallas_surface_atan_polynomials():
    """The emit_pipeline surface kernel cannot run in interpret mode
    (pipeline queries TPU device info); its in-kernel atan/atan2
    polynomials are validated here and the full kernel numerically in
    tools/tpu_smoke.py on the real chip."""
    from xrspatial_tpu.kernels.pallas_surface import _atan, _atan2
    xs = np.linspace(-50, 50, 10001).astype(np.float32)
    np.testing.assert_allclose(np.asarray(_atan(jnp.asarray(xs))),
                               np.arctan(xs), atol=3e-7)
    rng = np.random.default_rng(0)
    y = (rng.random(5000) * 20 - 10).astype(np.float32)
    x = (rng.random(5000) * 20 - 10).astype(np.float32)
    x[::100] = 0.0
    np.testing.assert_allclose(np.asarray(_atan2(jnp.asarray(y),
                                                 jnp.asarray(x))),
                               np.arctan2(y, x), atol=6e-7)


def test_pallas_window_offsets_and_radius():
    """emit_pipeline kernels cannot run in interpret mode; the focal
    Pallas kernel's numerical parity runs on the real chip in
    tools/tpu_smoke.py.  Here: the footprint machinery it shares with the
    XLA path."""
    k = circle_kernel(1, 1, 1.5)
    offs = kernel_offsets(k)
    assert (0, 0) in offs
    assert len(offs) == int(k.sum())
    assert max(abs(dy) for dy, _ in offs) == 1


def test_surface_tiled_interpret_parity():
    """The classic-pipeline tiled surface kernel (pallas_surface2) runs in
    interpret mode on CPU — full parity check of the tile-interior +
    seam-band + ring assembly against the XLA reference path, including a
    ragged shape and interior NaNs crossing a tile seam."""
    import jax.numpy as jnp
    from xrspatial_tpu.kernels.pallas_surface2 import surface_tiled
    from xrspatial_tpu.kernels.surface import (aspect_jit, curvature_jit,
                                               hillshade_jit, slope_jit)
    f32 = jnp.float32
    rng = np.random.default_rng(5)
    data = rng.random((70, 300)).astype(np.float32) * 100
    data[20:23, 120:140] = np.nan   # NaN patch
    data[31:33, 40] = np.nan        # NaN on a tile seam row (th=32)
    x = jnp.asarray(data)

    refs = {
        "slope": slope_jit(x, f32(2.0), f32(3.0)),
        "aspect": aspect_jit(x),
        "curvature": curvature_jit(x, f32(2.5)),
        "hillshade": hillshade_jit(x, f32(225.0), f32(25.0)),
    }
    outs = surface_tiled(x, f32(2.0), f32(3.0), f32(225.0), f32(25.0),
                         ("slope", "aspect", "curvature", "hillshade"),
                         th=32, tw=128, interpret=True)
    for name, got in zip(refs, outs):
        ref = np.asarray(refs[name])
        got = np.asarray(got)
        assert np.array_equal(np.isnan(got), np.isnan(ref)), name
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-5,
                                   err_msg=name, equal_nan=True)


def test_focal_stats_tiled_interpret_parity():
    """Classic-pipeline focal kernel vs the fused-XLA window_stats on CPU
    (interpret mode): full assembly incl. row bands, column patches,
    ragged shapes, and NaNs crossing tile seams."""
    import jax.numpy as jnp
    from xrspatial_tpu.kernels.pallas_window2 import focal_stats_tiled
    from xrspatial_tpu.kernels.window import window_stats
    rng = np.random.default_rng(9)
    data = rng.random((70, 300)).astype(np.float32) * 50
    data[30:34, 120:135] = np.nan
    data[31:33, 128] = np.nan  # on the th=32 seam
    x = jnp.asarray(data)
    k = circle_kernel(1, 1, 1.5)
    offsets = kernel_offsets(k)
    stats = ("mean", "max", "min", "std", "sum", "var", "range")
    ref = window_stats(x, offsets, stats)
    got = focal_stats_tiled(x, offsets, stats, th=32, tw=128,
                            interpret=True)
    for i, s in enumerate(stats):
        r = np.asarray(ref[s])
        g = np.asarray(got[i])
        assert np.array_equal(np.isnan(g), np.isnan(r)), s
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5,
                                   err_msg=s, equal_nan=True)


def test_focal_stats_tiled_interpret_radius2():
    """Radius-2 window (5x5 circle): 2-row bands and 2-col patches."""
    import jax.numpy as jnp
    from xrspatial_tpu.kernels.pallas_window2 import focal_stats_tiled
    from xrspatial_tpu.kernels.window import window_stats
    rng = np.random.default_rng(10)
    data = rng.random((64, 256)).astype(np.float32)
    x = jnp.asarray(data)
    k = circle_kernel(1, 1, 2.5)
    offsets = kernel_offsets(k)
    stats = ("mean", "std")
    ref = window_stats(x, offsets, stats)
    got = focal_stats_tiled(x, offsets, stats, th=16, tw=128,
                            interpret=True)
    for i, s in enumerate(stats):
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref[s]),
                                   rtol=1e-5, atol=1e-5, err_msg=s,
                                   equal_nan=True)


def test_pipeline_tiled_interpret_parity():
    """Fused headline pipeline (surface pair + focal stack in ONE
    pallas_call) vs the single-op reference paths on CPU (interpret
    mode): ragged shape, NaNs crossing tile seams."""
    import jax.numpy as jnp
    from xrspatial_tpu.kernels.pallas_pipeline import pipeline_tiled
    from xrspatial_tpu.kernels.surface import hillshade_jit, slope_jit
    from xrspatial_tpu.kernels.window import window_stats
    f32 = jnp.float32
    rng = np.random.default_rng(11)
    data = rng.random((70, 300)).astype(np.float32) * 100
    data[20:23, 120:140] = np.nan
    data[31:33, 40] = np.nan  # on the th=32 seam
    x = jnp.asarray(data)
    k = circle_kernel(1, 1, 1.5)
    offsets = kernel_offsets(k)
    stats = ("mean", "max", "min", "std")
    sl, hs, focal = pipeline_tiled(
        x, f32(2.0), f32(3.0), f32(225.0), f32(25.0), offsets, stats,
        which=("slope", "hillshade"), th=32, tw=128, interpret=True)
    refs = {"slope": slope_jit(x, f32(2.0), f32(3.0)),
            "hillshade": hillshade_jit(x, f32(225.0), f32(25.0))}
    for name, got in zip(refs, (sl, hs)):
        ref = np.asarray(refs[name])
        got = np.asarray(got)
        assert np.array_equal(np.isnan(got), np.isnan(ref)), name
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-5,
                                   err_msg=name, equal_nan=True)
    wref = window_stats(x, offsets, stats)
    for i, s in enumerate(stats):
        r = np.asarray(wref[s])
        g = np.asarray(focal[i])
        assert np.array_equal(np.isnan(g), np.isnan(r)), s
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5,
                                   err_msg=s, equal_nan=True)
