"""On-chip validation: packed-index JFA vs the coordinate-carrying
Pallas path — outputs must be BITWISE equal (packed_state_plan proves
key parity), plus burst timings.  Findings 2026-08-17 (v5e): bitwise
True for proximity (euclidean), allocation, direction at 1024^2;
proximity 4096^2 25.64 ms, allocation 37.90 ms.
"""
import os, sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench import timed
from xrspatial_tpu.proximity import allocation, direction, proximity
from xrspatial_tpu.xrlib import DataArray

def case(n, seed=3):
    rng = np.random.default_rng(seed)
    img = np.zeros((n, n), np.float32)
    img[rng.integers(0, n, max(8, n//16)), rng.integers(0, n, max(8, n//16))] = \
        rng.integers(1, 9, max(8, n//16)).astype(np.float32)
    da = DataArray(jnp.asarray(img), dims=("y","x"))
    da["y"] = np.arange(n, dtype=float)[::-1]
    da["x"] = np.arange(n, dtype=float)
    return da

n = 1024
da = case(n)
for name, fn, kw in [("prox_euc", proximity, {}),
                     ("prox_man", proximity, {"distance_metric": "MANHATTAN"}),
                     ("alloc", allocation, {}),
                     ("direction", direction, {})]:
    a = np.asarray(fn(da, **kw).data)
    os.environ["XRSPATIAL_NO_PACKED_JFA"] = "1"
    b = np.asarray(fn(da, **kw).data)
    del os.environ["XRSPATIAL_NO_PACKED_JFA"]
    bit = np.array_equal(a, b, equal_nan=True)
    neq = int((np.nan_to_num(a, nan=-7) != np.nan_to_num(b, nan=-7)).sum())
    print(f"{name}: bitwise={bit} n_diff={neq}", flush=True)

n = 4096
da = case(n)
t = timed(lambda: proximity(da).data, reps=9, burst=3)
print(f"proximity 4096^2 packed API: {t*1e3:.2f} ms", flush=True)
t = timed(lambda: allocation(da).data, reps=6, burst=3)
print(f"allocation 4096^2 packed API: {t*1e3:.2f} ms", flush=True)
