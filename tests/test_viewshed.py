"""Tests for viewshed (invariant-based, mirroring reference test_viewshed)."""

import os

import numpy as np
import pytest

from general_checks import create_test_raster

from xrspatial_tpu.viewshed import viewshed


def _raster(data):
    agg = create_test_raster(data.astype(np.float64), attrs={"res": (1, 1)})
    return agg


def test_invalid_viewpoint():
    agg = _raster(np.zeros((5, 5)))
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    with pytest.raises(ValueError):
        viewshed(agg, x=xs.min() - 1, y=0)
    with pytest.raises(ValueError):
        viewshed(agg, x=0, y=ys.max() + 1)


def test_viewpoint_is_180():
    agg = _raster(np.zeros((5, 5)))
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    v = np.asarray(viewshed(agg, x=xs[2], y=ys[2]).data)
    assert v[2, 2] == 180.0


def test_flat_terrain_all_visible():
    agg = _raster(np.zeros((6, 7)))
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    for (r, c) in [(0, 0), (3, 3), (5, 6), (2, 5)]:
        v = np.asarray(viewshed(agg, x=xs[c], y=ys[r],
                                observer_elev=1).data)
        assert (v > -1).all(), (r, c)
        # terrain below the observer: vertical angle in (0, 90)
        # (convention: 0 = straight down, 90 = level, 180 = viewpoint)
        others = v[v != 180.0]
        assert ((others > 0.0) & (others < 90.0)).all()


def test_observer_elev_scenarios():
    """Port of the reference's elevate-the-viewpoint matrix
    (test_viewshed.py:95-120): when the observer is above all terrain,
    everything is visible."""
    H = W = 5
    for obs_elev in (-1, 0, 1):
        for elev_at_vp in (-1, 0, 1):
            data = np.zeros((H, W))
            for r in range(H):
                for c in range(W):
                    data[:] = 0
                    data[r, c] = elev_at_vp
                    agg = _raster(data)
                    xs = np.asarray(agg["x"].data)
                    ys = np.asarray(agg["y"].data)
                    v = np.asarray(viewshed(agg, x=xs[c], y=ys[r],
                                            observer_elev=obs_elev).data)
                    assert v[r, c] == 180.0
                    if (obs_elev + elev_at_vp >= 0
                            and obs_elev >= abs(elev_at_vp)):
                        assert (v > -1).all(), (obs_elev, elev_at_vp, r, c)


def test_wall_blocks():
    data = np.zeros((5, 9))
    data[:, 4] = 10.0  # tall north-south wall
    agg = _raster(data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    v = np.asarray(viewshed(agg, x=xs[1], y=ys[2]).data)
    # cells behind the wall (east side) are invisible
    assert (v[:, 6:] == -1).all()
    # wall cells themselves are visible
    assert (v[2, 4] > -1)
    # cells west of the wall visible
    assert (v[:, :4] > -1).all()


def test_peak_shadows_far_side():
    data = np.zeros((9, 9))
    data[4, 4] = 100.0
    agg = _raster(data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    v = np.asarray(viewshed(agg, x=xs[0], y=ys[4]).data)
    # the peak hides the cells directly behind it
    assert v[4, 5] == -1
    assert v[4, 8] == -1
    assert v[4, 4] > -1  # the peak is visible


def test_symmetry():
    """Visibility of a symmetric terrain is symmetric
    (reference test_viewshed.py:97-120 invariant)."""
    rng = np.random.default_rng(0)
    half = rng.random((7, 4))
    center = rng.random((7, 1))
    data = np.concatenate([half, center, half[:, ::-1]], axis=1)  # mirror
    agg = _raster(data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    # observer on the mirror axis: visibility mirrors too
    v = np.asarray(viewshed(agg, x=xs[4], y=ys[3], observer_elev=0.5).data)
    vis = v > -1
    np.testing.assert_array_equal(vis, vis[:, ::-1])


def test_target_elev_reveals():
    data = np.zeros((5, 9))
    data[:, 4] = 2.0  # low wall
    agg = _raster(data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    v0 = np.asarray(viewshed(agg, x=xs[0], y=ys[2], observer_elev=1).data)
    vt = np.asarray(viewshed(agg, x=xs[0], y=ys[2], observer_elev=1,
                             target_elev=50).data)
    # tall targets visible even behind the wall
    assert (vt > -1).sum() > (v0 > -1).sum()
    assert (vt > -1).all()


def test_nan_cells_invisible_and_transparent():
    data = np.zeros((5, 7))
    data[2, 3] = np.nan
    agg = _raster(data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    v = np.asarray(viewshed(agg, x=xs[0], y=ys[2], observer_elev=2).data)
    assert v[2, 3] == -1          # NaN cell itself invisible
    assert v[2, 4] > -1           # does not block what's behind it


@pytest.mark.parametrize("shape,vp", [
    ((48, 64), (10, 10)),
    ((64, 48), (0, 0)),        # corner viewpoint
    pytest.param((57, 57), (56, 56), marks=pytest.mark.slow),
    pytest.param((40, 90), (20, 3), marks=pytest.mark.slow),
])
def test_exact_bucket_bitwise_vs_pairwise(shape, vp):
    """VERDICT r2 #1 'done' gate (CPU sizes): the angle-sorted bucket
    evaluation must agree BIT-FOR-BIT with the pairwise oracle —
    identical attrs, identical predicate, conservative candidate
    superset.  512^2/1024^2 run on chip (tools/validate_exact_viewshed.py
    + the bench parity phase)."""
    from xrspatial_tpu.kernels.viewshed import viewshed_grid
    from xrspatial_tpu.kernels.viewshed_exact import viewshed_grid_exact
    from xrspatial_tpu.utils import x64
    rng = np.random.default_rng(hash(shape) % 2**31)
    data = (rng.random(shape) * 60).astype(np.float64)
    data[shape[0] // 3, :] += 100.0  # a ridge
    data[np.unravel_index(rng.integers(0, data.size, 20), shape)] = np.nan
    with x64():
        pw = np.asarray(viewshed_grid(data, vp[0], vp[1],
                                      3.0, 0.5, 1.5, -1.0))
    ex = np.asarray(viewshed_grid_exact(data, vp[0], vp[1],
                                        3.0, 0.5, 1.5, -1.0, chunk=128))
    np.testing.assert_array_equal(pw, ex)


@pytest.mark.parametrize("vp", [(10, 20), (0, 0), (39, 55), (0, 30),
                                (17, 0), (39, 12), (20, 55)])
def test_attrs_fast_paths_bitwise(vp):
    """cell_attrs_host's slab-written numpy fast paths must be
    BIT-IDENTICAL to the generic xp= helper formulations (the quadrant
    masks are axis-aligned rectangles; all coordinates are exact
    half-integers, so no rounding differs).  Covers interior, corner,
    and edge viewpoints."""
    from xrspatial_tpu.kernels import viewshed as V
    rng = np.random.default_rng(vp[0] * 100 + vp[1])
    h, w = 40, 56
    data = (rng.random((h, w)) * 80).astype(np.float64)
    data[np.unravel_index(rng.integers(0, data.size, 15), data.shape)] \
        = np.nan
    vr, vc = vp
    rows = np.arange(h, dtype=np.float64)[:, None] + np.zeros((1, w))
    cols = np.arange(w, dtype=np.float64)[None, :] + np.zeros((h, 1))
    vp_r, vp_c = np.float64(vr), np.float64(vc)

    ref_offs = V._corner_offsets(rows, cols, vp_r, vp_c, xp=np)
    fast_offs = V._corner_offsets_np(h, w, vr, vc)
    for r, f in zip(ref_offs, fast_offs):
        np.testing.assert_array_equal(r, f)

    e_dy, e_dx, x_dy, x_dx = ref_offs
    np.testing.assert_array_equal(
        V._corner_elev(data, e_dy, e_dx, xp=np),
        V._corner_elev_np(data, vr, vc, enter=True))
    np.testing.assert_array_equal(
        V._corner_elev(data, x_dy, x_dx, xp=np),
        V._corner_elev_np(data, vr, vc, enter=False))

    with np.errstate(invalid="ignore"):
        np.testing.assert_array_equal(
            V._calculate_angle(cols + e_dx, rows + e_dy, vp_c, vp_r,
                               xp=np),
            V._calculate_angle_np(rows + e_dy - vp_r, cols + e_dx - vp_c))
        np.testing.assert_array_equal(
            V._calculate_angle(cols, rows, vp_c, vp_r, xp=np),
            V._calculate_angle_np(rows - vp_r, cols - vp_c))
        vp_elev = data[vr, vc] + 7.0
        np.testing.assert_array_equal(
            V._gradient(rows - vp_r, cols - vp_c, data, vp_elev,
                        1.25, -0.75, xp=np),
            V._gradient_np(rows - vp_r, cols - vp_c, data, vp_elev,
                           1.25, -0.75, (vr, vc)))
        enter_elev = V._corner_elev_np(data, vr, vc, enter=True)
        np.testing.assert_array_equal(
            V._gradient(rows + e_dy - vp_r, cols + e_dx - vp_c,
                        enter_elev, vp_elev, 1.25, -0.75, xp=np),
            V._gradient_np(rows + e_dy - vp_r, cols + e_dx - vp_c,
                           enter_elev, vp_elev, 1.25, -0.75, (vr, vc)))


@pytest.mark.parametrize("vp", [(10, 20), (0, 0), (39, 55), (0, 30),
                                (20, 55)])
def test_attrs_subset_bitwise(vp):
    """cell_attrs_subset (scattered-index f64 attrs) must be
    BIT-IDENTICAL to the corresponding elements of the full-plane
    cell_attrs_host — the f64 re-eval contract allows no deviation."""
    from xrspatial_tpu.kernels.viewshed import (cell_attrs_host,
                                                cell_attrs_subset)
    rng = np.random.default_rng(vp[0] * 7 + vp[1])
    h, w = 40, 56
    data = (rng.random((h, w)) * 80).astype(np.float64)
    data[np.unravel_index(rng.integers(0, data.size, 15), data.shape)] \
        = np.nan
    full = cell_attrs_host(data, vp[0], vp[1], 3.0, 0.5, 1.5, -1.0)
    idx = np.unique(np.concatenate([
        rng.integers(0, h * w, 200),
        np.array([0, h * w - 1, vp[0] * w + vp[1]]),
        np.arange(vp[0] * w, vp[0] * w + w),   # the crossing ray row
        np.arange(h) * w + vp[1],
    ]))
    sub = cell_attrs_subset(data, idx, vp[0], vp[1], 3.0, 0.5, 1.5, -1.0)
    assert sub["vp_elev"] == full["vp_elev"]
    for f in ("key", "a0", "a1", "a2", "g0", "g1", "g2", "grad_t",
              "is_vp", "valid_b"):
        np.testing.assert_array_equal(sub[f], full[f][idx], err_msg=f)


def test_f64_reeval_paths_bitwise_equal():
    """The two f64 re-eval runners the ambiguous-target gate routes
    between — full-table upload vs host-gathered (A, E) slices — must
    be bit-identical: same candidate supersets, same predicate, only
    the transport differs (viewshed_exact._screened_visibility)."""
    from xrspatial_tpu.kernels.viewshed import cell_attrs_host
    from xrspatial_tpu.kernels import viewshed_exact as VE
    from xrspatial_tpu.utils import x64
    rng = np.random.default_rng(5)
    data = (rng.random((40, 56)) * 60).astype(np.float64)
    data[13, :] += 120.0
    flat = rng.integers(0, data.size, 10)
    data[np.unravel_index(flat, data.shape)] = np.nan
    at = cell_attrs_host(data, 12, 30, 3.0, 0.5, 1.5, -1.0)
    cache = VE._tier_cache(at, 12, 30)
    # a strided target subset, padded exactly like the production
    # re-eval pads the ambiguous set
    sub = np.arange(0, at["a1"].size, 7, dtype=np.int64)
    L = 1 << (max(int(sub.size), 128) - 1).bit_length()
    sub = np.pad(sub, (0, L - sub.size), mode="edge")
    tperm, glob_i, tiers, A, C = VE._bucket_plan(at, 12, 30, 128,
                                                 targets=sub, cache=cache)
    from xrspatial_tpu.kernels.viewshed import cell_attrs_subset_fn
    attrs_of = cell_attrs_subset_fn(data, 12, 30, 3.0, 0.5, 1.5, -1.0)
    with x64():
        via_tables = VE._run_buckets_f64(at, tperm, glob_i, tiers, A, C)
        via_gather = VE._run_buckets_f64_gathered(attrs_of, tperm, glob_i,
                                                  tiers, A, C)
    np.testing.assert_array_equal(via_tables, via_gather)


@pytest.mark.slow
def test_default_path_contract_around_ceiling(monkeypatch):
    """The size-based default must be exact at <= _EXACT_MAX_CELLS and
    XDraw above it, and exact=True must give the exact kernel's output
    beyond the ceiling (the round-5 measured execution costs set the
    ceiling; the CONTRACT is what this test pins — the ceiling itself
    is monkeypatched so the test stays cheap at any production value)."""
    import importlib
    VSMOD = importlib.import_module("xrspatial_tpu.viewshed")
    from xrspatial_tpu.kernels.viewshed import viewshed_grid_los
    from xrspatial_tpu.kernels.viewshed_exact import viewshed_grid_exact
    monkeypatch.setattr(VSMOD, "_EXACT_MAX_CELLS", 128 * 128)
    rng = np.random.default_rng(21)

    # at the ceiling: default == exact
    n = 128
    data = (rng.random((n, n)) * 40).astype(np.float64)
    data[100:104, 50:60] += 250.0
    agg = _raster(data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    ns_res = float(ys[1] - ys[0])
    ew_res = float(xs[1] - xs[0])
    v = np.asarray(viewshed(agg, x=xs[40], y=ys[100]).data)
    ref = np.asarray(viewshed_grid_exact(data, 100, 40, 0.0, 0.0,
                                         ew_res, ns_res))
    np.testing.assert_array_equal(v, ref)

    # above the ceiling: default == XDraw, exact=True == exact kernel
    n = 300
    data = (rng.random((n, n)) * 40).astype(np.float64)
    data[100:104, 150:160] += 250.0
    agg = _raster(data)
    xs = np.asarray(agg["x"].data)
    ys = np.asarray(agg["y"].data)
    ns_res = float(ys[1] - ys[0])
    ew_res = float(xs[1] - xs[0])
    v_def = np.asarray(viewshed(agg, x=xs[70], y=ys[220]).data)
    ref_los = np.asarray(viewshed_grid_los(data, 220, 70, 0.0, 0.0,
                                           ew_res, ns_res))
    np.testing.assert_array_equal(v_def, ref_los)
    v_ex = np.asarray(viewshed(agg, x=xs[70], y=ys[220],
                               exact=True).data)
    ref_ex = np.asarray(viewshed_grid_exact(data, 220, 70, 0.0, 0.0,
                                            ew_res, ns_res))
    np.testing.assert_array_equal(v_ex, ref_ex)


def test_los_matches_pairwise():
    """The large-raster LOS path agrees with the exact sweep-semantics
    path away from ties."""
    from xrspatial_tpu.kernels.viewshed import (viewshed_grid,
                                                viewshed_grid_los)
    from xrspatial_tpu.utils import x64
    rng = np.random.default_rng(11)
    data = (rng.random((48, 64)) * 50).astype(np.float64)
    data[20:24, 30:34] += 200.0  # a mesa
    with x64():
        exact = np.asarray(viewshed_grid(data, 10, 10, 2.0, 0.0, 1.0, -1.0))
    los = np.asarray(viewshed_grid_los(data, 10, 10, 2.0, 0.0, 1.0, -1.0))
    vis_exact = exact > -1
    vis_los = los > -1
    agree = (vis_exact == vis_los).mean()
    # XDraw's interpolated-gradient wavefront agrees with the exact
    # pairwise predicate on ~99% of cells (0.9899 on this terrain)
    assert agree > 0.985, agree
    # vertical angles of commonly-visible cells match
    both = vis_exact & vis_los
    np.testing.assert_allclose(exact[both], los[both], rtol=1e-4, atol=1e-3)


@pytest.mark.skipif(os.environ.get("XRSPATIAL_SLOW_TESTS") != "1",
                    reason="exact 256^2 oracle takes ~40 s on CPU "
                           "(set XRSPATIAL_SLOW_TESTS=1)")
def test_los_agreement_bound_256():
    """Pin the measured XDraw-vs-exact agreement at 256^2 (VERDICT r1 #4).

    Measured on seeded fBm terrains (tools/measure_viewshed_agreement.py):
    0.9937 at 256^2, 0.9956 at 384^2 — the relative interpolation error
    shrinks with size.  Vertical angles of commonly-visible cells match
    to ~2e-5 degrees.
    """
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "tools"))
    from terrain_util import make_terrain

    from xrspatial_tpu.kernels.viewshed import (viewshed_grid,
                                                viewshed_grid_los)
    from xrspatial_tpu.utils import x64
    n = 256
    data = make_terrain(n, 3)
    with x64():
        exact = np.asarray(viewshed_grid(data, n // 3, (2 * n) // 3,
                                         10.0, 0.0, 1.0, -1.0))
    los = np.asarray(viewshed_grid_los(data, n // 3, (2 * n) // 3,
                                       10.0, 0.0, 1.0, -1.0))
    vis_e, vis_l = exact > -1, los > -1
    agree = (vis_e == vis_l).mean()
    assert agree >= 0.99, agree
    both = vis_e & vis_l
    np.testing.assert_allclose(exact[both], los[both], rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_exact_screen_bitwise_parity(monkeypatch):
    """The f32 interval screen (viewshed_exact._screened_visibility)
    must be BITWISE identical to the f64-only bucket evaluation — the
    screen only classifies, with sound tolerance bands, and ambiguous
    targets are re-evaluated in f64.  Flat terrain is the adversarial
    case: every cell sits exactly on the grazing boundary, so the
    screen must classify (almost) everything ambiguous and fall back."""
    import os

    from xrspatial_tpu.kernels.viewshed_exact import viewshed_grid_exact

    rng = np.random.default_rng(17)
    cases = [
        (rng.random((96, 160)) * 60.0, (30, 100), 8.0),
        (np.zeros((64, 96)), (32, 48), 3.0),  # grazing everywhere
        (np.tile(np.arange(96.0), (64, 1)), (30, 5), 1.0),  # ramp
    ]
    for data, vp, oe in cases:
        a = np.asarray(viewshed_grid_exact(data, vp[0], vp[1], oe, 0.0,
                                           1.0, -1.0))
        monkeypatch.setenv("XRSPATIAL_VS_NO_SCREEN", "1")
        b = np.asarray(viewshed_grid_exact(data, vp[0], vp[1], oe, 0.0,
                                           1.0, -1.0))
        monkeypatch.delenv("XRSPATIAL_VS_NO_SCREEN")
        assert np.array_equal(a, b, equal_nan=True)


def test_l2_screen_path_bitwise(monkeypatch):
    """With the small-ambiguity oracle shortcut disabled, the device-f64
    re-screen (level 2, unified-E windows) must produce the same final
    visibility as the shortcut path — both are sound classifiers over
    the same f64 predicate."""
    from xrspatial_tpu.kernels import viewshed_exact as VE
    rng = np.random.default_rng(11)
    data = (rng.random((72, 72)) * 70).astype(np.float64)
    data[30, :] += 90.0
    args = (data, 36, 20, 4.0, 0.0, 1.0, 1.0)
    via_shortcut = np.asarray(VE.viewshed_grid_exact(*args))
    monkeypatch.setattr(VE, "_L2_MIN_AMB", 0)
    via_screen2 = np.asarray(VE.viewshed_grid_exact(*args))
    np.testing.assert_array_equal(via_shortcut, via_screen2)
    # the volume guard routes large gathered plans to the same L2 path
    monkeypatch.setattr(VE, "_L2_MIN_AMB", 2048)
    monkeypatch.setattr(VE, "_DIRECT_MAX_ELEMS", 0)
    via_volume = np.asarray(VE.viewshed_grid_exact(*args))
    np.testing.assert_array_equal(via_shortcut, via_volume)


def test_l2_multislab_bitwise(monkeypatch):
    """The slabbed level-2 re-screen (angle-ordered target slabs, one
    shared f64 table build, unified window width) must match the
    unslabbed result bit-for-bit: slabs partition the target set and
    wider windows are sound supersets."""
    from xrspatial_tpu.kernels import viewshed_exact as VE
    # cone terrain: every sightline has constant gradient, so hundreds
    # of true near-ties stay ambiguous after the f32 screen (amb=286)
    h, w, vr, vc = 80, 88, 40, 22
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    data = 0.5 * np.sqrt((rr - vr) ** 2.0 + (cc - vc) ** 2.0)
    args = (data, vr, vc, 0.0, 0.0, 1.0, 1.0)
    base = np.asarray(VE.viewshed_grid_exact(*args))
    monkeypatch.setattr(VE, "_L2_MIN_AMB", 0)
    one_slab = np.asarray(VE.viewshed_grid_exact(*args))
    np.testing.assert_array_equal(base, one_slab)
    monkeypatch.setattr(VE, "_L2_SLAB", 64)   # 286 ambiguous -> 5 slabs
    multi = np.asarray(VE.viewshed_grid_exact(*args))
    np.testing.assert_array_equal(base, multi)


def test_pallas_screen_interpret_bitwise(monkeypatch):
    """The Pallas pair kernel (kernels/pallas_screen.py) must classify
    identically to the XLA scan screen: same plan, same predicate
    function object, windows are aligned-block supersets of the scan's
    (sound by the cover-test argument) — so the final visibility is
    bit-identical."""
    from xrspatial_tpu.kernels import viewshed_exact as VE
    rng = np.random.default_rng(9)
    data = (rng.random((96, 112)) * 60).astype(np.float64)
    data[40, :] += 80.0
    data[np.unravel_index(rng.integers(0, data.size, 12),
                          data.shape)] = np.nan
    args = (data, 50, 30, 3.0, 0.5, 1.0, -1.0)
    base = np.asarray(VE.viewshed_grid_exact(*args))
    monkeypatch.setattr(VE, "_PALLAS_SCREEN_INTERPRET", True)
    pal = np.asarray(VE.viewshed_grid_exact(*args))
    np.testing.assert_array_equal(base, pal)
