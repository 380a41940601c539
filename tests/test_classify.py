"""Parity + contract tests for the classification family."""

import numpy as np
import pytest

from general_checks import create_test_raster, general_output_checks
from reference_impl import ref_bin, ref_jenks

from xrspatial_tpu.classify import (binary, box_plot, equal_interval,
                                    head_tail_breaks, maximum_breaks,
                                    natural_breaks, percentiles, quantile,
                                    reclassify, std_mean)


@pytest.fixture
def cdata():
    data = np.arange(20, dtype=np.float32).reshape(4, 5)
    data[0, 0] = np.nan
    data[3, 4] = np.inf
    return data


def test_binary(cdata):
    agg = create_test_raster(cdata)
    out = binary(agg, [1, 2, 3])
    expected = np.where(np.isfinite(cdata),
                        np.isin(cdata, [1, 2, 3]).astype(np.float32), np.nan)
    expected[3, 4] = np.nan
    general_output_checks(agg, out, expected)


def test_reclassify(cdata):
    agg = create_test_raster(cdata)
    bins = [5, 10, 20]
    new_values = [1.0, 2.0, 3.0]
    out = reclassify(agg, bins, new_values)
    expected = ref_bin(cdata, bins, new_values)
    general_output_checks(agg, out, expected)
    with pytest.raises(ValueError):
        reclassify(agg, [1, 2], [1])


def test_reclassify_upper_open(cdata):
    # values beyond the last bin -> NaN
    agg = create_test_raster(cdata)
    out = np.asarray(reclassify(agg, [5], [1.0]).data)
    assert np.isnan(out[2, 2])
    assert out[1, 0] == 1.0


def test_quantile(cdata):
    agg = create_test_raster(cdata)
    out = quantile(agg, k=4)
    finite = cdata[np.isfinite(cdata)]
    q = np.unique(np.percentile(finite, [25, 50, 75, 100]))
    expected = ref_bin(cdata, q, np.arange(4))
    general_output_checks(agg, out, expected)


def test_quantile_balanced_classes():
    rng = np.random.default_rng(3)
    data = rng.random((40, 40)).astype(np.float32)
    out = np.asarray(quantile(create_test_raster(data), k=4).data)
    _, counts = np.unique(out[np.isfinite(out)], return_counts=True)
    assert counts.max() - counts.min() <= 2


def test_equal_interval(cdata):
    agg = create_test_raster(cdata)
    out = equal_interval(agg, k=3)
    finite = cdata[np.isfinite(cdata)]
    mn, mx = finite.min(), finite.max()
    width = (mx - mn) / 3
    cuts = np.arange(mn + width, mx + width, width)[:3]
    cuts[-1] = mx
    expected = ref_bin(cdata, cuts, np.arange(len(cuts)))
    general_output_checks(agg, out, expected)


def test_std_mean():
    rng = np.random.default_rng(9)
    data = rng.normal(100, 10, (30, 30)).astype(np.float32)
    agg = create_test_raster(data)
    out = std_mean(agg)
    m, s, mx = data.mean(), data.std(), data.max()
    bins = np.sort(np.unique([m - 2 * s, m - s, m + s, m + 2 * s, mx]))
    expected = ref_bin(data, bins, np.arange(len(bins)))
    np.testing.assert_allclose(np.asarray(out.data), expected,
                               equal_nan=True)


def test_head_tail_breaks():
    rng = np.random.default_rng(4)
    data = rng.pareto(3, (30, 30)).astype(np.float32)  # heavy-tailed
    agg = create_test_raster(data)
    out = head_tail_breaks(agg)
    arr = np.asarray(out.data)
    assert np.isfinite(arr).all()
    # classes are contiguous integers starting at 0
    uniq = np.unique(arr)
    np.testing.assert_array_equal(uniq, np.arange(len(uniq)))
    # reproduce the iterative mean splitting
    bins = []
    d = data.ravel()
    while len(d) > 1:
        m = d.mean()
        bins.append(m)
        head = d[d > m]
        if len(head) == 0 or len(head) / len(d) > 0.40:
            break
        d = head
    bins.append(data.max())
    expected = ref_bin(data, np.array(bins), np.arange(len(bins)))
    np.testing.assert_allclose(arr, expected, equal_nan=True)


def test_percentiles(cdata):
    agg = create_test_raster(cdata)
    out = percentiles(agg, pct=[20, 40, 60, 80, 100])
    finite = cdata[np.isfinite(cdata)]
    q = np.unique(np.percentile(finite, [20, 40, 60, 80, 100]))
    expected = ref_bin(cdata, q, np.arange(len(q)))
    general_output_checks(agg, out, expected, rtol=1e-5)
    with pytest.raises(ValueError):
        percentiles(agg, pct=[0])
    with pytest.raises(ValueError):
        percentiles(agg, pct=[101])


def test_maximum_breaks():
    data = np.array([[1., 1.1, 1.2, 5.0],
                     [5.1, 5.2, 9.0, 9.1],
                     [1.05, 5.05, 9.05, 9.2]], dtype=np.float32)
    agg = create_test_raster(data)
    out = np.asarray(maximum_breaks(agg, k=3).data)
    # gaps at 1.2->5.0 and 5.2->9.0; breaks at midpoints 3.1 and 7.1
    expected = ref_bin(data, [3.1, 7.1, 9.2], [0, 1, 2])
    np.testing.assert_allclose(out, expected, equal_nan=True)


def test_box_plot():
    rng = np.random.default_rng(12)
    data = rng.normal(50, 5, (20, 20)).astype(np.float32)
    data[0, 0] = 200.0  # outlier above the fence
    agg = create_test_raster(data)
    out = np.asarray(box_plot(agg).data)
    q1, q2, q3 = np.percentile(data, [25, 50, 75])
    iqr = q3 - q1
    bins = np.sort(np.unique(
        [q1 - 1.5 * iqr, q1, q2, q3, q3 + 1.5 * iqr, data.max()]))
    bins = bins[bins <= data.max()]
    expected = ref_bin(data, bins, np.arange(len(bins)))
    np.testing.assert_allclose(out, expected, equal_nan=True)
    assert out[0, 0] == len(bins) - 1  # outlier in top class


def test_jenks_dp_parity():
    """lax.scan DP matches the loop-based Jenks oracle exactly."""
    from xrspatial_tpu.classify import _run_jenks
    rng = np.random.default_rng(5)
    for n, k in [(30, 4), (100, 5), (57, 3)]:
        data = (rng.random(n) * 100).astype(np.float32)
        ours = _run_jenks(data.copy(), k)
        ref = ref_jenks(data.copy(), k)
        np.testing.assert_allclose(ours, ref)


def test_natural_breaks():
    rng = np.random.default_rng(6)
    data = np.concatenate([rng.normal(10, 1, 200),
                           rng.normal(50, 2, 200),
                           rng.normal(90, 1, 200)]).astype(np.float32)
    rng.shuffle(data)
    data = data.reshape(20, 30)
    agg = create_test_raster(data)
    out = natural_breaks(agg, k=3)
    arr = np.asarray(out.data)
    assert set(np.unique(arr)) == {0.0, 1.0, 2.0}
    # the three classes recover the three clusters
    assert (arr[(data > 30) & (data < 70)] == 1.0).all()


def test_natural_breaks_sampled_deterministic():
    rng = np.random.default_rng(7)
    data = (rng.random((40, 40)) * 100).astype(np.float32)
    agg = create_test_raster(data)
    a = np.asarray(natural_breaks(agg, num_sample=500, k=4).data)
    b = np.asarray(natural_breaks(agg, num_sample=500, k=4).data)
    np.testing.assert_array_equal(a, b)


def test_natural_breaks_too_few_unique():
    data = np.array([[1.0, 2.0]] * 3, dtype=np.float32)
    agg = create_test_raster(data)
    with pytest.warns(Warning):
        out = natural_breaks(agg, k=5)
    assert set(np.unique(np.asarray(out.data))) <= {0.0, 1.0}


def test_quantile_docstring_golden():
    """Reference classify.py quantile docstring example (:480-492)."""
    from xrspatial_tpu.xrlib import DataArray
    data = np.array([
        [np.nan, 1., 2., 3., 4.],
        [5., 6., 7., 8., 9.],
        [10., 11., 12., 13., 14.],
        [15., 16., 17., 18., 19.],
        [20., 21., 22., 23., np.inf]], dtype=np.float64)
    agg = DataArray(data, attrs={"res": (10.0, 10.0)})
    out = np.asarray(quantile(agg, k=5).data)
    # quartile classes ascend with the data; NaN/inf stay NaN
    assert np.isnan(out[0, 0]) and np.isnan(out[4, 4])
    finite = out[np.isfinite(out)]
    assert finite.min() == 0.0 and finite.max() == 4.0
    assert (np.diff(finite) >= 0).all()


def test_equal_interval_constant_raster():
    # the reference raises ZeroDivisionError here; we classify everything
    # into one class instead (documented graceful deviation)
    agg = create_test_raster(np.ones((3, 4), dtype=np.float32))
    out = np.asarray(equal_interval(agg, k=3).data)
    assert (out == 0).all()


def test_radix_percentile_bitwise():
    """kernels/selection.py must be BIT-IDENTICAL to jnp.nanpercentile
    (same order statistics, same interpolation arithmetic)."""
    import jax.numpy as jnp

    from xrspatial_tpu.kernels.selection import nanpercentile_select

    rng = np.random.default_rng(5)
    cases = [
        (rng.random(100_000).astype(np.float32) * 2000 - 500,
         [20.0, 25.0, 50.0, 75.0, 100.0]),
        (rng.standard_normal(65_536).astype(np.float32), [33.3, 66.6]),
        (np.repeat(np.float32([1.5, -2.5, 7.0]), 1000), [10.0, 90.0]),
    ]
    # NaN holes + negative zeros + exact duplicates
    cases[0][0][::17] = np.nan
    cases[0][0][5] = -0.0
    for data, p in cases:
        a = np.asarray(nanpercentile_select(
            jnp.asarray(data), jnp.asarray(np.float32(p)), len(p)))
        b = np.asarray(jnp.nanpercentile(jnp.asarray(data),
                                         jnp.asarray(np.float32(p))))
        np.testing.assert_array_equal(a, b)
    # all-NaN input -> NaN
    allnan = np.full(4096, np.nan, np.float32)
    a = np.asarray(nanpercentile_select(jnp.asarray(allnan),
                                        jnp.asarray(np.float32([50.0])), 1))
    assert np.isnan(a).all()


@pytest.mark.slow
def test_radix_percentile_beyond_2pow24():
    """Above 2^24 elements the radix select must stay EXACT (int32
    digit histograms, round 5): jnp.nanpercentile's own f32 count sum
    and rank clamp degrade there, so the oracle is the true order
    statistics (np.partition of the finite values) pushed through the
    identical f32 interpolation formula.  Also pins the q=100 NaN-tail
    fix: the integer rank clamp selects the true max."""
    import jax.numpy as jnp

    from xrspatial_tpu.kernels.selection import nanpercentile_select

    rng = np.random.default_rng(7)
    # every-19th NaN keeps a NaN tail after the sort; size n so the
    # FINITE count (18/19 of n) still exceeds 2^24
    n = 2 ** 24 + 2 ** 20
    data = (rng.random(n, dtype=np.float32) * 2000.0 - 500.0)
    data[::19] = np.nan
    p = np.float32([0.0, 37.5, 99.9, 100.0])

    finite = np.sort(data[np.isfinite(data)])
    counts_i = finite.size
    assert counts_i > 2 ** 24  # the regime this test exists for
    counts = np.float32(counts_i)
    q = p / np.float32(100.0)
    t = q * (counts - np.float32(1.0))
    low = np.floor(t)
    high = np.ceil(t)
    hw = t - low
    lw = np.float32(1.0) - hw
    low = np.maximum(np.float32(0.0), np.minimum(low, counts - 1))
    high = np.maximum(np.float32(0.0), np.minimum(high, counts - 1))
    lo_r = np.minimum(low.astype(np.int64), counts_i - 1)
    hi_r = np.minimum(high.astype(np.int64), counts_i - 1)
    expected = (finite[lo_r] * lw + finite[hi_r] * hw).astype(np.float32)

    got = np.asarray(nanpercentile_select(
        jnp.asarray(data), jnp.asarray(p), len(p)))
    np.testing.assert_array_equal(got, expected)
    assert got[-1] == finite[-1]          # q=100 == true max, not NaN
    assert np.isfinite(got).all()


def test_radix_percentile_sharded_bitwise():
    """The mesh-sharded radix select (per-shard digit histograms +
    psum) must be bit-identical to jnp.nanpercentile AND to the
    single-device radix path — no shard is ever gathered, yet every
    device walks the same global prefix/remainder state."""
    import jax
    import jax.numpy as jnp

    from xrspatial_tpu.kernels.selection import (
        nanpercentile_select, nanpercentile_select_sharded)
    from xrspatial_tpu.parallel.halo import distribute, make_raster_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    mesh = make_raster_mesh()
    rng = np.random.default_rng(11)
    data = (rng.random((512, 512)).astype(np.float32) * 100.0 - 30.0)
    data[::13, ::7] = np.nan
    data[0, 1] = -0.0
    p = np.float32([10.0, 25.0, 50.0, 75.0, 99.0])
    sharded = distribute(data, mesh)
    a = np.asarray(nanpercentile_select_sharded(
        sharded, jnp.asarray(p), len(p), mesh))
    b = np.asarray(jnp.nanpercentile(jnp.asarray(data), jnp.asarray(p)))
    c = np.asarray(nanpercentile_select(
        jnp.asarray(data).ravel(), jnp.asarray(p), len(p)))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_quantile_sharded_dispatch(monkeypatch):
    """classify.quantile on a mesh-sharded raster routes through the
    sharded radix kernel (not a gather + device sort) and matches the
    unsharded result exactly."""
    import jax

    import xrspatial_tpu.classify as cls
    from xrspatial_tpu.kernels import selection
    from xrspatial_tpu.parallel.halo import distribute, make_raster_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    monkeypatch.setenv("XRSPATIAL_FORCE_RADIX_PERCENTILE", "1")
    calls = []
    orig = selection.nanpercentile_select_sharded

    def spy(v, q100, P, mesh):
        calls.append(P)
        return orig(v, q100, P, mesh)

    monkeypatch.setattr(selection, "nanpercentile_select_sharded", spy)
    mesh = make_raster_mesh()
    rng = np.random.default_rng(3)
    data = rng.random((256, 256)).astype(np.float32) * 10.0
    agg_plain = create_test_raster(data)
    agg_shard = create_test_raster(data)
    agg_shard.data = distribute(data, mesh)
    out_plain = np.asarray(cls.quantile(agg_plain, k=5).data)
    out_shard = np.asarray(cls.quantile(agg_shard, k=5).data)
    assert calls, "sharded quantile did not take the radix kernel"
    np.testing.assert_array_equal(out_plain, out_shard)


@pytest.mark.parametrize("classifier", [
    "binary", "reclassify", "quantile", "natural_breaks",
    "equal_interval", "percentiles", "std_mean", "head_tail_breaks",
    "maximum_breaks", "box_plot"])
@pytest.mark.parametrize("case", ["constant", "all_nan", "few_unique"])
def test_classify_degenerate_inputs(classifier, case):
    """Every classifier must handle constant rasters, all-NaN rasters,
    and k > distinct-values gracefully (the reference's paranoid edge
    matrix, test_classify.py; where the reference raises we degrade to
    one class / all-NaN — documented deviations)."""
    import warnings as _w

    data = {
        "constant": np.full((4, 5), 7.0, np.float32),
        "all_nan": np.full((4, 5), np.nan, np.float32),
        "few_unique": np.array([[1., 1., 2.], [2., 1., 2.]], np.float32),
    }[case]
    agg = create_test_raster(data)
    call = {
        "binary": lambda a: binary(a, [7]),
        "reclassify": lambda a: reclassify(a, bins=[7], new_values=[1]),
        "quantile": lambda a: quantile(a, k=4),
        "natural_breaks": lambda a: natural_breaks(a, k=4),
        "equal_interval": lambda a: equal_interval(a, k=4),
        "percentiles": lambda a: percentiles(a),
        "std_mean": std_mean,
        "head_tail_breaks": head_tail_breaks,
        "maximum_breaks": lambda a: maximum_breaks(a, k=4),
        "box_plot": box_plot,
    }[classifier]
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        out = np.asarray(call(agg).data)
    assert out.shape == data.shape
    assert out.dtype == np.float32
    if case == "all_nan":
        assert np.isnan(out).all()
    else:
        # NaN only where input is NaN; classes are small non-negative ids
        finite = out[np.isfinite(out)]
        assert finite.size == data[np.isfinite(data)].size
        assert (finite >= 0).all() and (finite < 10).all()
        if case == "constant" and classifier not in ("binary",
                                                     "reclassify"):
            assert np.unique(finite).size == 1


def test_classify_does_not_modify_input():
    """binary/reclassify must not mutate the input raster in place
    (reference test_classify.py::test_*_does_not_modify_input)."""
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    agg = create_test_raster(data.copy())
    binary(agg, [1, 2])
    reclassify(agg, bins=[5, 11], new_values=[0, 1])
    quantile(agg, k=3)
    np.testing.assert_array_equal(np.asarray(agg.data), data)


def test_quantile_k_larger_than_size():
    """k greater than the element count collapses to the available
    unique quantile edges, mirroring the reference's warning path."""
    agg = create_test_raster(np.array([[3.0, 1.0]], np.float32))
    out = np.asarray(quantile(agg, k=17).data)
    assert np.isfinite(out).all()
    assert set(np.unique(out)) <= set(np.arange(17.0))
