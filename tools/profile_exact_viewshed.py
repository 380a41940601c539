"""Phase-level profile of the exact bucket-LOS viewshed on TPU.

Thin wrapper over the production path's built-in phase timer
(XRSPATIAL_VS_TIMING=1): prints host cache, bucket plan, table
build+upload, the f32 screen scan, and the ambiguous-target f64
re-eval (with ambiguity count / bucket count / window sizes), then the
end-to-end wall time.  Used round 3 to find where the 273 s at 4096^2
went (answer: f64 host attrs + 13-field f64 table gathers + a
count-bucketed sparse re-eval plan — all redesigned in round 4).

Usage: python tools/profile_exact_viewshed.py 1024 [2048 ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XRSPATIAL_VS_TIMING"] = "1"

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from terrain_util import make_terrain

print("backend:", jax.default_backend(), flush=True)


def profile(n, chunk=512, reps=2):
    from xrspatial_tpu.kernels.viewshed_exact import viewshed_grid_exact

    data = np.asarray(make_terrain(n, 0), dtype=np.float64)
    for rep in range(reps):
        t0 = time.perf_counter()
        out = viewshed_grid_exact(data, n // 2 + 3, n // 2 - 7,
                                  2.0, 0.0, 1.0, 1.0, chunk=chunk)
        _ = float(np.asarray(out)[0, 0])   # tunnel barrier
        print(f"== {n}^2 rep{rep}: {time.perf_counter() - t0:.2f}s",
              flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    for n in sizes:
        profile(n)
