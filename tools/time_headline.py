"""Time the three headline ops at 16k^2 on the real chip (no parity,
no secondary benches) — the quick A/B harness for stencil-kernel work.

Usage: python tools/time_headline.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import gaussian_bump, timed


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    from xrspatial_tpu import hillshade, slope
    from xrspatial_tpu.convolution import circle_kernel
    from xrspatial_tpu.focal import focal_stats
    from xrspatial_tpu.xrlib import DataArray

    data = gaussian_bump(n, n)
    jax.block_until_ready(data)
    agg = DataArray(data, dims=("y", "x"), name="dem",
                    attrs={"res": (1.0, 1.0)})
    mpix = n * n / 1e6
    reduce = jax.jit(lambda a: jnp.sum(a[..., 0, :]))
    kernel = circle_kernel(1, 1, 1.5)

    ops = {
        "slope": lambda: reduce(slope(agg).data),
        "hillshade": lambda: reduce(hillshade(agg).data),
        "focal_stats": lambda: reduce(focal_stats(
            agg, kernel, stats_funcs=["mean", "max", "min", "std"]).data),
    }
    total = 0.0
    for name, fn in ops.items():
        heavy = name == "focal_stats"
        t = timed(fn, reps=12 if heavy else 30, burst=6 if heavy else 10)
        total += t
        print(f"{name}: {t*1e3:.2f} ms ({mpix/t:.0f} Mpix/s)", flush=True)
    print(f"pipeline: {total*1e3:.2f} ms ({mpix/total/1e3:.2f} Gpix/s)")


if __name__ == "__main__":
    main()
