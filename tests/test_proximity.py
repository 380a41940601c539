"""Tests for proximity / allocation / direction (jump-flood transform)."""

import numpy as np
import pytest

from general_checks import create_test_raster

from xrspatial_tpu.proximity import (allocation, direction,
                                     euclidean_distance,
                                     great_circle_distance,
                                     manhattan_distance, proximity)


def brute_force(data, xs, ys, targets_mask, metric="EUCLIDEAN",
                max_distance=np.inf):
    """Exact nearest-target distances by exhaustive search."""
    h, w = data.shape
    t_idx = np.argwhere(targets_mask)
    out = np.full((h, w), np.nan, dtype=np.float64)
    nearest = np.full((h, w, 2), -1, dtype=np.int64)
    for i in range(h):
        for j in range(w):
            best = np.inf
            for ti, tj in t_idx:
                if metric == "EUCLIDEAN":
                    d = np.hypot(xs[j] - xs[tj], ys[i] - ys[ti])
                elif metric == "MANHATTAN":
                    d = abs(xs[j] - xs[tj]) + abs(ys[i] - ys[ti])
                else:
                    d = great_circle_distance(float(xs[j]), float(xs[tj]),
                                              float(ys[i]), float(ys[ti]))
                if d < best:
                    best = d
                    nearest[i, j] = (ti, tj)
            if best <= max_distance:
                out[i, j] = best
            else:
                nearest[i, j] = (-1, -1)
    return out, nearest


@pytest.fixture
def raster():
    rng = np.random.default_rng(17)
    data = np.zeros((10, 14), dtype=np.float32)
    # scatter a few targets
    for (i, j) in [(1, 2), (7, 11), (4, 6), (9, 0)]:
        data[i, j] = 1.0
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    return agg


def test_scalar_distances():
    assert euclidean_distance(0, 3, 0, 4) == pytest.approx(5.0)
    assert manhattan_distance(142.32, 312.54, 23.23, 432.01) == \
        pytest.approx(579.0)
    assert great_circle_distance(123.2, 178.0, 82.32, 65.09) == \
        pytest.approx(2378290.489801402)
    with pytest.raises(ValueError):
        great_circle_distance(200, 0, 0, 0)


@pytest.mark.parametrize("metric", ["EUCLIDEAN", "MANHATTAN"])
def test_proximity_exact(raster, metric):
    out = np.asarray(proximity(raster, distance_metric=metric).data)
    data = np.asarray(raster.data)
    xs = np.asarray(raster["x"].data)
    ys = np.asarray(raster["y"].data)
    expected, _ = brute_force(data, xs, ys, data != 0, metric)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_proximity_great_circle():
    data = np.zeros((8, 8), dtype=np.float32)
    data[2, 3] = 1.0
    data[6, 6] = 1.0
    agg = create_test_raster(data)
    agg["x"] = np.linspace(-10, 10, 8)
    agg["y"] = np.linspace(50, 40, 8)
    out = np.asarray(proximity(agg, distance_metric="GREAT_CIRCLE").data)
    xs, ys = np.asarray(agg["x"].data), np.asarray(agg["y"].data)
    expected, _ = brute_force(data, xs, ys, data != 0, "GC")
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_great_circle_f32_near_coincident_precision():
    """Degrees-first deltas keep f32 great-circle distances accurate for
    near-coincident points (radians-first lost ~20% relative there —
    the reference runs in f64 where the order is invisible)."""
    import jax.numpy as jnp

    from xrspatial_tpu.kernels.jfa import GREAT_CIRCLE, metric_distance
    rng = np.random.default_rng(1)
    lon1 = rng.uniform(-179, 179, 2000).astype(np.float32)
    lat1 = rng.uniform(-89, 89, 2000).astype(np.float32)
    lon2 = (lon1 + rng.uniform(-0.01, 0.01, 2000)).astype(np.float32)
    lat2 = (lat1 + rng.uniform(-0.01, 0.01, 2000)).astype(np.float32)
    got = np.asarray(metric_distance(jnp.asarray(lon1), jnp.asarray(lon2),
                                     jnp.asarray(lat1), jnp.asarray(lat2),
                                     GREAT_CIRCLE)).astype(np.float64)
    ref = np.array([great_circle_distance(float(a), float(b), float(c),
                                          float(d))
                    for a, b, c, d in zip(lon1, lon2, lat1, lat2)])
    m = ref > 1.0  # beyond f32 coordinate quantization (~1 m at 100 deg)
    np.testing.assert_allclose(got[m], ref[m], rtol=2e-4)


def test_proximity_target_values(raster):
    data = np.asarray(raster.data).copy()
    data[2, 2] = 7.0
    data[5, 5] = 9.0
    raster.data = data
    out = np.asarray(proximity(raster, target_values=[7, 9]).data)
    xs = np.asarray(raster["x"].data)
    ys = np.asarray(raster["y"].data)
    expected, _ = brute_force(data, xs, ys, np.isin(data, [7, 9]))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_proximity_max_distance(raster):
    out = np.asarray(proximity(raster, max_distance=2.0).data)
    data = np.asarray(raster.data)
    xs = np.asarray(raster["x"].data)
    ys = np.asarray(raster["y"].data)
    expected, _ = brute_force(data, xs, ys, data != 0,
                              max_distance=2.0)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5,
                               equal_nan=True)


def test_proximity_dims_check(raster):
    with pytest.raises(ValueError):
        proximity(raster, x="lon", y="lat")


def test_allocation(raster):
    # give each target a distinct value so allocation is identifiable
    data = np.zeros((10, 14), dtype=np.float32)
    data[1, 2] = 5.0
    data[8, 11] = 9.0
    raster = create_test_raster(data)
    out = np.asarray(allocation(raster).data)
    xs = np.asarray(raster["x"].data)
    ys = np.asarray(raster["y"].data)
    _, nearest = brute_force(data, xs, ys, data != 0)
    expected = data[nearest[:, :, 0], nearest[:, :, 1]]
    # compare only where nearest target is unique (no ties):
    d5 = brute_force(data, xs, ys, data == 5.0)[0]
    d9 = brute_force(data, xs, ys, data == 9.0)[0]
    unique = np.abs(d5 - d9) > 1e-6
    np.testing.assert_allclose(out[unique], expected[unique])


def test_direction(raster):
    data = np.zeros((6, 6), dtype=np.float32)
    data[3, 3] = 1.0
    agg = create_test_raster(data, attrs={"res": (1, 1)})
    out = np.asarray(direction(agg).data)
    assert out[3, 3] == 0.0  # target itself
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    # cell directly east of the target (same row, larger x)
    assert out[3, 4] == pytest.approx(270.0)  # target is to the west
    # verify against the reference formula for every cell
    for i in range(6):
        for j in range(6):
            if (i, j) == (3, 3):
                continue
            x_p, y_p = xs[j], ys[i]
            x_t, y_t = xs[3], ys[3]
            d = np.arctan2(-(y_t - y_p), x_t - x_p) * 57.29578
            if d < 0:
                d = 90.0 - d
            elif d > 90.0:
                d = 360.0 - d + 90.0
            else:
                d = 90.0 - d
            assert out[i, j] == pytest.approx(d, rel=1e-5)


def test_proximity_random_exactness():
    """JFA+2 matches brute force on random target layouts."""
    rng = np.random.default_rng(3)
    for trial in range(3):
        data = (rng.random((17, 23)) < 0.05).astype(np.float32)
        if data.sum() == 0:
            data[0, 0] = 1
        agg = create_test_raster(data)
        out = np.asarray(proximity(agg).data)
        xs = np.asarray(agg["x"].data)
        ys = np.asarray(agg["y"].data)
        expected, _ = brute_force(data, xs, ys, data != 0)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_manhattan_scan_transform_exactness():
    """The separable Manhattan transform (4 scans, kernels/jfa.py::
    manhattan_transform) matches brute force for every payload mode,
    for descending-x / non-uniform coords, and falls back to JFA for
    non-monotone coordinate vectors."""
    import jax.numpy as jnp

    from xrspatial_tpu.kernels import jfa

    rng = np.random.default_rng(11)
    # one fixed shape across trials: each distinct (h, w) recompiles the
    # scan transform (x3 payload modes), and 18 CPU compiles cost ~50 s;
    # coords/masks/payloads still vary per trial
    h, w = 23, 37
    for trial in range(6):
        mask = rng.random((h, w)) < 0.06
        if mask.sum() == 0:
            mask[rng.integers(h), rng.integers(w)] = True
        xs = np.sort(rng.uniform(-50, 50, w)).astype(np.float32)
        ys = np.sort(rng.uniform(-50, 50, h)).astype(np.float32)
        if trial % 2:
            xs = xs[::-1].copy()
        if trial % 3 == 0:
            ys = ys[::-1].copy()
        vals = rng.uniform(1, 9, (h, w)).astype(np.float32)
        best = np.full((h, w), np.inf)
        for a, b in zip(*np.nonzero(mask)):
            best = np.minimum(best, np.abs(xs[None, :] - xs[b])
                              + np.abs(ys[:, None] - ys[a]))
        for need_coords, use_vals in [(False, False), (True, False),
                                      (True, True)]:
            d, tx, ty, tv = jfa.jump_flood(
                jnp.asarray(mask), jnp.asarray(xs), jnp.asarray(ys),
                jfa.MANHATTAN,
                values=jnp.asarray(vals) if use_vals else None,
                need_coords=need_coords)
            np.testing.assert_allclose(np.asarray(d), best, rtol=1e-5,
                                       atol=1e-4)
            if need_coords:
                # the claimed target coordinates must realize the optimum
                dd = (np.abs(xs[None, :] - np.asarray(tx))
                      + np.abs(ys[:, None] - np.asarray(ty)))
                np.testing.assert_allclose(dd, best, rtol=1e-5, atol=1e-4)

    # non-monotone coordinates: must still be exact (JFA fallback)
    xs = np.array([0.0, 5.0, 2.0, 8.0], np.float32)
    ys = np.array([0.0, 1.0, 3.0], np.float32)
    mask = np.zeros((3, 4), bool)
    mask[1, 2] = True
    d, _, _, _ = jfa.jump_flood(jnp.asarray(mask), jnp.asarray(xs),
                                jnp.asarray(ys), jfa.MANHATTAN)
    best = np.abs(xs[None, :] - xs[2]) + np.abs(ys[:, None] - ys[1])
    np.testing.assert_allclose(np.asarray(d), best, atol=1e-5)


def test_manhattan_allocation_direction_scan_path():
    """allocation/direction ride the Manhattan scan payload channels."""
    data = np.zeros((9, 12), dtype=np.float32)
    data[2, 3] = 5.0
    data[7, 10] = 9.0
    agg = create_test_raster(data)
    out = np.asarray(allocation(agg, distance_metric="MANHATTAN").data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    d5 = np.abs(xs[None, :] - xs[3]) + np.abs(ys[:, None] - ys[2])
    d9 = np.abs(xs[None, :] - xs[10]) + np.abs(ys[:, None] - ys[7])
    unique = np.abs(d5 - d9) > 1e-6
    expected = np.where(d5 < d9, 5.0, 9.0)
    np.testing.assert_allclose(out[unique], expected[unique])

    dir_out = np.asarray(direction(agg, distance_metric="MANHATTAN").data)
    assert dir_out[2, 3] == 0.0
    # direction must point at the manhattan-nearest target
    assert np.isfinite(dir_out).all()


def test_packed_state_plan_gate():
    """Host-side gate for the packed-index JFA state: accepts exactly
    affine axes (incl. descending and scaled), rejects anything whose
    keys or reconstructed coordinates could differ bitwise."""
    from xrspatial_tpu.kernels.jfa import (EUCLIDEAN, GREAT_CIRCLE,
                                           packed_state_plan)

    xs = np.arange(512, dtype=np.float32)
    ys = np.arange(256, dtype=np.float32)[::-1].copy()
    plan = packed_state_plan(xs, ys, EUCLIDEAN)
    assert plan is not None
    (sy, sx), (y0, x0) = plan
    assert sx == 1.0 and sy == -1.0 and y0 == 255.0 and x0 == 0.0

    # scaled integer steps stay exact
    plan = packed_state_plan(xs * 8.0, ys * 0.5, EUCLIDEAN)
    assert plan is not None
    assert plan[0] == (-0.5, 8.0)

    # great-circle always falls back (key needs trig of coordinates)
    assert packed_state_plan(xs, ys, GREAT_CIRCLE) is None

    # non-uniform axis rejected
    bad = xs.copy()
    bad[100] += 0.5
    assert packed_state_plan(bad, ys, EUCLIDEAN) is None

    # a step that is not exactly representable as the affine sequence
    # (0.1 accumulates rounding) is rejected
    assert packed_state_plan((np.arange(512) * 0.1).astype(np.float32),
                             ys, EUCLIDEAN) is None

    # dims beyond the 15-bit packing are rejected
    assert packed_state_plan(np.arange(40000, dtype=np.float32), ys,
                             EUCLIDEAN) is None

    # degenerate 1-wide axis rejected
    assert packed_state_plan(np.float32([3.0]), ys, EUCLIDEAN) is None


def test_packed_key_bit_parity():
    """The packed-index in-kernel key (pallas_jfa._key_packed) must be
    BITWISE equal to the world-coordinate key for gate-passing affine
    axes — the parity proof packed_state_plan relies on (both are the
    correctly-rounded f32 of the same real)."""
    import jax.numpy as jnp

    from xrspatial_tpu.kernels import pallas_jfa as pj
    from xrspatial_tpu.kernels.jfa import (EUCLIDEAN, MANHATTAN,
                                           packed_state_plan)

    rng = np.random.default_rng(8)
    for sy, sx, y0, x0 in [(1.0, 1.0, 0.0, 0.0), (-2.0, 8.0, 100.0, -50.0),
                           (0.5, -0.25, 3.5, 1.25)]:
        h, w = 64, 96
        ys = (y0 + np.arange(h) * sy).astype(np.float32)
        xs = (x0 + np.arange(w) * sx).astype(np.float32)
        for metric in (EUCLIDEAN, MANHATTAN):
            plan = packed_state_plan(xs, ys, metric)
            assert plan is not None, (sy, sx)
            (psy, psx), _ = plan
            # random candidate indices + own positions
            ciy = rng.integers(0, h, 500).astype(np.int32)
            cix = rng.integers(0, w, 500).astype(np.int32)
            piy = rng.integers(0, h, 500).astype(np.int32)
            pix = rng.integers(0, w, 500).astype(np.int32)
            cand = jnp.asarray((ciy.astype(np.int64) << 15)
                               | cix.astype(np.int64)).astype(jnp.int32)
            got = np.asarray(pj._key_packed(
                jnp.asarray(piy), jnp.asarray(pix), cand, metric,
                (psy, psx)))
            want = np.asarray(pj._key(
                jnp.asarray(xs[pix]), jnp.asarray(xs[cix]),
                jnp.asarray(ys[piy]), jnp.asarray(ys[ciy]), metric))
            np.testing.assert_array_equal(got, want)
            # sentinel -> inf
            s = np.asarray(pj._key_packed(
                jnp.asarray(piy[:4]), jnp.asarray(pix[:4]),
                jnp.full(4, -1, jnp.int32), metric, (psy, psx)))
            assert np.isinf(s).all()
