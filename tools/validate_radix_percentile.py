"""On-chip validation + timing of the radix-select percentile
(kernels/selection.py) vs jnp.nanpercentile.  Findings 2026-08-17
(v5e, 4096^2): bitwise True; 4-bit-digit radix select 8.6 ms vs the
sort-based nanpercentile 44 ms (an 8-bit-digit variant measured
64 ms — one-hot construction dominates); quantile API 72.8 ->
35.5 ms (the remaining cost is the host np.unique roundtrip +
the bin pass).
"""
import sys
import numpy as np
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench import gaussian_bump, timed
from xrspatial_tpu import quantile
from xrspatial_tpu.kernels.selection import nanpercentile_select
from xrspatial_tpu.xrlib import DataArray
n = 4096
dem = gaussian_bump(n, n)
agg = DataArray(dem, dims=("y","x"), attrs={"res":(1.0,1.0)})
p = jnp.asarray(np.float32([20, 40, 60, 80, 100]))
a = np.asarray(nanpercentile_select(dem.ravel(), p, 5))
b = np.asarray(jnp.nanpercentile(dem.ravel(), p))
print("bitwise:", np.array_equal(a, b), "vals:", a[:3], flush=True)
assert np.array_equal(a, b)
t = timed(lambda: nanpercentile_select(dem.ravel(), p, 5), reps=10, burst=5)
print(f"radix select (5 pcts) 4096^2: {t*1e3:.1f} ms", flush=True)
t = timed(lambda: jnp.nanpercentile(dem.ravel(), p), reps=6, burst=2)
print(f"jnp.nanpercentile 4096^2: {t*1e3:.1f} ms", flush=True)
t = timed(lambda: quantile(agg, k=5).data, reps=6, burst=2)
print(f"quantile API 4096^2: {t*1e3:.1f} ms", flush=True)
