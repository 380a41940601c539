"""Tests for perlin / generate_terrain / bump synthesis."""

import numpy as np
import pytest

from xrspatial_tpu import DataArray
from xrspatial_tpu.bump import bump
from xrspatial_tpu.perlin import perlin
from xrspatial_tpu.terrain import generate_terrain


def test_perlin_reference_golden():
    """Bit-compat with the reference implementation's docstring example
    (reference perlin.py:189-251)."""
    raster = DataArray(np.zeros((3, 4), dtype=np.float32), dims=["y", "x"])
    out = np.asarray(perlin(raster).data)
    expected = np.array([
        [0.39268944, 0.27577767, 0.01621884, 0.05518942],
        [1.0, 0.8229485, 0.2935367, 0.0],
        [1.0, 0.8715414, 0.41902685, 0.02916668]], dtype=np.float32)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_perlin_properties():
    raster = DataArray(np.zeros((64, 80), dtype=np.float32), dims=["y", "x"])
    out = perlin(raster, freq=(4, 3), seed=11)
    data = np.asarray(out.data)
    assert out.name == "perlin"
    assert data.shape == (64, 80)
    assert data.min() == pytest.approx(0.0)
    assert data.max() == pytest.approx(1.0)
    # deterministic
    out2 = np.asarray(perlin(raster, freq=(4, 3), seed=11).data)
    np.testing.assert_array_equal(data, out2)
    # different seed differs
    out3 = np.asarray(perlin(raster, freq=(4, 3), seed=12).data)
    assert not np.array_equal(data, out3)


def test_terrain_reference_golden():
    """Matches the reference's bump.py docstring terrain slice
    (reference bump.py:158-166; W=500 H=300, extent ±20e6, defaults)."""
    raster = DataArray(np.zeros((300, 500), dtype=np.float32),
                       dims=["y", "x"])
    t = generate_terrain(raster, x_range=(-20e6, 20e6),
                         y_range=(-20e6, 20e6))
    sl = np.asarray(t.data)[200:203, 200:202]
    expected = np.array([[1264.02296597, 1261.947921],
                         [1285.37105519, 1282.48079719],
                         [1306.02339636, 1303.4069579]])
    np.testing.assert_allclose(sl, expected, rtol=1e-5)
    assert t.attrs["res"] == (80000.0, 400e5 / 300)
    assert t.name == "terrain"
    np.testing.assert_allclose(np.asarray(t["x"].data)[:2],
                               [-19.96e6, -19.88e6])


def test_terrain_water_cutoff():
    raster = DataArray(np.zeros((100, 100), dtype=np.float32),
                       dims=["y", "x"])
    t = np.asarray(generate_terrain(raster).data)
    assert (t >= 0).all()
    assert (t == 0).any()          # some water
    assert (t > 0).any()           # some land
    assert t.max() <= 4000.0


@pytest.mark.parametrize("octave", [0, 3, 11, 15])
def test_lattice_path_bit_identical_to_device_gathers(octave):
    """The host-hashed lattice + separable-take path (perlin.octave_tables /
    octave_eval) must be BIT-identical to the legacy on-device gather
    formulation (perlin_noise) — same float sequence per element."""
    import jax.numpy as jnp

    from xrspatial_tpu.perlin import (_permutation_table, octave_eval,
                                      octave_tables, perlin_noise)
    from xrspatial_tpu.utils import x64

    h, w = 37, 53
    freq = float(2 ** octave)
    linx = np.linspace(0.0, 1.0, w, endpoint=False,
                       dtype=np.float32).astype(np.float64)
    liny = np.linspace(0.0, 1.0, h, endpoint=False,
                       dtype=np.float32).astype(np.float64)
    seed = 10 + octave

    packed, ix, iy, xf, yf = octave_tables(seed, linx * freq, liny * freq)
    new = np.asarray(octave_eval(jnp.asarray(packed), jnp.asarray(ix),
                                 jnp.asarray(iy), jnp.asarray(xf),
                                 jnp.asarray(yf)))

    with x64():
        p = jnp.asarray(_permutation_table(seed))
        x, y = np.meshgrid(linx * freq, liny * freq)
        old = np.asarray(perlin_noise(p, jnp.asarray(x), jnp.asarray(y)))

    np.testing.assert_array_equal(new, old)


def test_bump_centers():
    np.random.seed(0)
    out = bump(width=20, height=16, count=10, spread=0)
    data = np.asarray(out.data)
    assert data.shape == (16, 20)
    assert out.dims == ("y", "x")
    assert out.attrs == {"res": 1}
    assert data.sum() == pytest.approx(10.0)


def test_bump_spread_adds_neighbors():
    np.random.seed(3)
    out = np.asarray(bump(width=30, height=30, count=5, spread=3).data)
    assert (out > 0).sum() > 5  # spread out beyond centers


def test_bump_height_func():
    np.random.seed(1)
    out = np.asarray(bump(width=10, height=10, count=4, spread=0,
                          height_func=lambda b: np.full(len(b), 7.0)).data)
    assert out.max() >= 7.0
