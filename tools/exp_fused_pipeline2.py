"""Headline-pipeline fusion A/B (16k^2, one session) — FINDINGS RECORD.

Three ways to produce the headline outputs (slope, hillshade, focal
mean/max/min/std of one 16k^2 DEM), measured 2026-08-17 on the v5e:

1. three separate op calls ............ 25.1-28.8 ms (session-dependent)
2. 6-output mega-kernel (surface +
   focal fused into ONE pallas_call) .. 25.2-25.7 ms  (~300-320 GB/s)
3. 2-way split: surface pair in one
   surface_tiled call + focal_stats ... 23.3 ms       (pair 347 GB/s,
                                                       focal 382 GB/s)

The mega-kernel LOST to the split despite moving ~1 GB less HBM traffic:
per-kernel effective bandwidth on this chip drops with output count
(1 output 433 GB/s best-session; 2 outputs 347; 6 outputs ~300) — the
revolving-buffer output DMAs stop overlapping.  The mega-kernel
(kernels/pallas_pipeline.py) was therefore deleted; analytics.
terrain_pipeline ships the 2-way split.  This script re-measures the
split vs the separate calls at the API level.
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from bench import gaussian_bump, timed  # noqa: E402

import numpy as np  # noqa: E402

from xrspatial_tpu import hillshade, slope  # noqa: E402
from xrspatial_tpu.analytics import terrain_pipeline  # noqa: E402
from xrspatial_tpu.convolution import circle_kernel  # noqa: E402
from xrspatial_tpu.focal import focal_stats  # noqa: E402
from xrspatial_tpu.xrlib import DataArray  # noqa: E402

N = 16384
data = gaussian_bump(N, N)
agg = DataArray(data, dims=("y", "x"), name="dem", attrs={"res": (1.0, 1.0)})
mpix = N * N / 1e6
red1 = jax.jit(lambda a: jnp.sum(a[..., 0, :]))
kern = circle_kernel(1, 1, 1.5)
stats = ["mean", "max", "min", "std"]


def run_pipeline():
    ds = terrain_pipeline(agg, surface=("slope", "hillshade"),
                          stats_funcs=tuple(stats))
    return red1(ds["dem-slope"].data) + red1(ds["dem-hillshade"].data) \
        + red1(ds["focal_stats"].data)


t_pipe = timed(run_pipeline, reps=12, burst=4)
print(f"terrain_pipeline: {t_pipe*1e3:.2f} ms ({mpix/t_pipe:.0f} Mpix/s)",
      flush=True)

t_sl = timed(lambda: red1(slope(agg).data), reps=12, burst=6)
t_hs = timed(lambda: red1(hillshade(agg).data), reps=12, burst=6)
t_fs = timed(lambda: red1(focal_stats(agg, kern, stats_funcs=stats).data),
             reps=12, burst=4)
tot = t_sl + t_hs + t_fs
print(f"separate: slope {t_sl*1e3:.2f} + hillshade {t_hs*1e3:.2f} + "
      f"focal {t_fs*1e3:.2f} = {tot*1e3:.2f} ms ({mpix/tot:.0f} Mpix/s)",
      flush=True)
