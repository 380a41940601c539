"""TPU smoke suite: run every op family once on the real chip.

Not part of the pytest run (tests force the CPU platform); invoke directly:
    python tools/tpu_smoke.py
Prints per-op wall time; exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from xrspatial_tpu import (DataArray, Dataset, aspect, binary, curvature,
                               equal_interval, generate_terrain, hillshade,
                               natural_breaks, ndvi, perlin, quantile,
                               regions, slope, viewshed)
    from xrspatial_tpu.analytics import summarize_terrain
    from xrspatial_tpu.bump import bump
    from xrspatial_tpu.convolution import circle_kernel, convolution_2d
    from xrspatial_tpu.focal import apply as focal_apply
    from xrspatial_tpu.focal import focal_stats, hotspots, mean
    from xrspatial_tpu.local import cell_stats
    from xrspatial_tpu.pathfinding import a_star_search
    from xrspatial_tpu.proximity import allocation, direction, proximity
    from xrspatial_tpu.zonal import crosstab, stats, trim

    rng = np.random.default_rng(0)
    n = 512
    data = (rng.random((n, n)) * 1000).astype(np.float32)
    agg = DataArray(data, dims=("y", "x"), name="dem",
                    attrs={"res": (1.0, 1.0)})
    agg["y"] = np.arange(n, dtype=float)[::-1]
    agg["x"] = np.arange(n, dtype=float)

    kernel = circle_kernel(1, 1, 1.5)
    zones = DataArray((data // 200).astype(np.int64), dims=("y", "x"))
    zones["y"] = np.arange(n, dtype=float)[::-1]
    zones["x"] = np.arange(n, dtype=float)
    targets = agg.copy(deep=True)
    tvals = np.zeros((n, n), np.float32)
    tvals[50, 50] = 1
    tvals[400, 300] = 1
    targets.data = tvals

    small = DataArray(data[:100, :100].copy(), dims=("y", "x"))
    small["y"] = np.arange(100, dtype=float)[::-1]
    small["x"] = np.arange(100, dtype=float)

    def _pallas_surface_parity():
        import jax.numpy as jnp

        from xrspatial_tpu.kernels.pallas_surface import surface_pallas
        from xrspatial_tpu.kernels.surface import (aspect_jit, curvature_jit,
                                                   hillshade_jit, slope_jit)
        rng2 = np.random.default_rng(3)
        d = jnp.asarray((rng2.random((2048, 2048)) * 500).astype(np.float32))
        which = ("slope", "aspect", "curvature", "hillshade")
        out = np.asarray(surface_pallas(
            d, jnp.float32(2.0), jnp.float32(3.0), jnp.float32(225.0),
            jnp.float32(25.0), which))
        refs = [slope_jit(d, jnp.float32(2.0), jnp.float32(3.0)),
                aspect_jit(d), curvature_jit(d, jnp.float32(2.5)),
                hillshade_jit(d, jnp.float32(225.0), jnp.float32(25.0))]
        for k, name in enumerate(which):
            ref = np.asarray(refs[k])
            m = ~(np.isnan(out[k]) | np.isnan(ref))
            assert (np.isnan(out[k]) == np.isnan(ref)).all(), name
            np.testing.assert_allclose(out[k][m], ref[m], atol=5e-4,
                                       err_msg=name)
        return out

    def _pallas_focal_parity():
        import jax.numpy as jnp

        from xrspatial_tpu.kernels.pallas_window import focal_stats_pallas
        from xrspatial_tpu.kernels.window import kernel_offsets, window_stats
        rng2 = np.random.default_rng(4)
        d = jnp.asarray((rng2.random((2048, 2048)) * 500).astype(np.float32))
        offs = kernel_offsets(kernel)
        sts = ("mean", "max", "min", "std", "var", "sum", "range")
        out = np.asarray(focal_stats_pallas(d, offs, sts))
        ref = window_stats(d, offs, sts)
        ref = np.asarray(jnp.stack([ref[s] for s in sts]))
        m = ~(np.isnan(out) | np.isnan(ref))
        assert (np.isnan(out) == np.isnan(ref)).all()
        np.testing.assert_allclose(out[m], ref[m], atol=1e-3)
        return out

    checks = [
        ("pallas surface parity", _pallas_surface_parity),
        ("pallas focal parity", _pallas_focal_parity),
        ("slope", lambda: slope(agg).data),
        ("aspect", lambda: aspect(agg).data),
        ("curvature", lambda: curvature(agg).data),
        ("hillshade", lambda: hillshade(agg).data),
        ("hillshade+shadows", lambda: hillshade(agg, shadows=True).data),
        ("geodesic slope", lambda: slope(
            _geo(DataArray, data[:64, :64]), method="geodesic").data),
        ("summarize_terrain", lambda: summarize_terrain(agg)["dem-slope"].data),
        ("focal mean x2", lambda: mean(agg, passes=2).data),
        ("focal_stats", lambda: focal_stats(agg, kernel).data),
        ("focal apply", lambda: focal_apply(agg, kernel).data),
        ("hotspots", lambda: hotspots(agg, kernel).data),
        ("convolution", lambda: convolution_2d(agg, kernel).data),
        ("quantile", lambda: quantile(agg, k=5).data),
        ("equal_interval", lambda: equal_interval(agg, k=5).data),
        ("natural_breaks", lambda: natural_breaks(agg, num_sample=2000,
                                                  k=4).data),
        ("binary", lambda: binary(agg, [1, 2, 3]).data),
        ("ndvi", lambda: ndvi(agg, DataArray(
            data + 1, dims=("y", "x"))).data),
        ("local cell_stats", lambda: cell_stats(Dataset({
            "a": agg, "b": DataArray(data * 2, dims=("y", "x"))})).data),
        ("zonal stats", lambda: stats(zones=zones, values=agg,
                                      stats_funcs=["mean", "count"])),
        ("zonal crosstab", lambda: crosstab(
            zones=zones, values=DataArray((data // 300).astype(np.float32),
                                          dims=("y", "x")))),
        ("regions", lambda: regions(DataArray(
            (data[:128, :128] // 250).astype(np.float32),
            dims=("y", "x"))).data),
        ("trim", lambda: trim(zones, values=(0,)).data),
        ("proximity", lambda: proximity(targets).data),
        ("allocation", lambda: allocation(targets).data),
        ("direction", lambda: direction(targets).data),
        ("viewshed exact (100^2)", lambda: viewshed(
            small, x=10.0, y=50.0, observer_elev=10).data),
        ("viewshed XDraw (512^2)", lambda: viewshed(
            agg, x=100.0, y=100.0, observer_elev=100).data),
        ("perlin", lambda: perlin(DataArray(
            np.zeros((256, 256), np.float32), dims=("y", "x"))).data),
        ("generate_terrain 512", lambda: generate_terrain(DataArray(
            np.zeros((512, 512), np.float32), dims=("y", "x"))).data),
        ("bump", lambda: bump(128, 128, count=100, spread=2).data),
        ("a_star", lambda: a_star_search(
            agg, (float(np.asarray(agg["y"].data)[5]),
                  float(np.asarray(agg["x"].data)[5])),
            (float(np.asarray(agg["y"].data)[50]),
             float(np.asarray(agg["x"].data)[50]))).data),
    ]

    failures = []
    for name, fn in checks:
        t0 = time.perf_counter()
        try:
            out = fn()
            if hasattr(out, "ravel"):
                _ = float(np.asarray(out).ravel()[0])
            dt = time.perf_counter() - t0
            print(f"OK   {name:<28} {dt*1e3:9.1f} ms", flush=True)
        except Exception as e:
            dt = time.perf_counter() - t0
            print(f"FAIL {name:<28} {dt*1e3:9.1f} ms "
                  f"{type(e).__name__}: {str(e)[:80]}", flush=True)
            traceback.print_exc(limit=2)
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL OK")
    return 0


def _geo(DataArray, data):
    agg = DataArray(np.asarray(data, np.float64), dims=("y", "x"))
    agg["y"] = np.linspace(45.0, 45.06, data.shape[0])
    agg["x"] = np.linspace(7.0, 7.06, data.shape[1])
    return agg


if __name__ == "__main__":
    sys.exit(main())
