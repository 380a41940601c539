"""EXPERIMENT (round 3): single-rsqrt _atan_of_sqrt for the slope kernel.

The shipped ``_atan_of_sqrt`` evaluates BOTH ``jnp.sqrt(s)`` and
``jax.lax.rsqrt(s)`` on every lane (vectorized select keeps both sides
live).  Since sqrt(s) == s * rsqrt(s) up to ~1 extra ulp, one rsqrt plus
a multiply covers both branches.  The divide->rsqrt swap earlier bought
6.51 -> 4.96 ms at 16k^2, so transcendental-class ops are a measurable
share of the slope epilogue; this removes one more.

ABAB same-session timing of the PRODUCTION surface_tiled slope at 16k^2
(surface_tiled.clear_cache() forces a retrace after monkeypatching; the
persistent compile cache makes the repeat traces free), plus an on-chip
maxdiff of the variant vs the fused-XLA twin at 4096^2.

Run on the real TPU: python tools/exp_atan_rsqrt.py
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
from xrspatial_tpu.kernels import pallas_surface2 as ps2
from xrspatial_tpu.kernels.surface import slope_jit

N = 16384


# HISTORICAL baseline: the round-3 sqrt+rsqrt implementation, inlined —
# the variant below SHIPPED as ps2._atan_of_sqrt, so importing the
# production symbol as "current" would A/B the variant against itself.
def _atan_current(s):
    from xrspatial_tpu.kernels.pallas_surface import _atan_poly
    big = s > 1.0
    t = jnp.where(big, jax.lax.rsqrt(jnp.maximum(s, 1e-30)),
                  jnp.sqrt(s))
    r = t * _atan_poly(t * t)
    return jnp.where(big, jnp.float32(np.pi / 2.0) - r, r)


def _atan_one_rsqrt(s):
    from xrspatial_tpu.kernels.pallas_surface import _atan_poly
    big = s > 1.0
    rs = jax.lax.rsqrt(jnp.maximum(s, 1e-30))
    t = jnp.where(big, rs, s * rs)
    r = t * _atan_poly(t * t)
    return jnp.where(big, jnp.float32(np.pi / 2.0) - r, r)


def set_variant(fn):
    ps2._atan_of_sqrt = fn
    ps2.surface_tiled.clear_cache()


def time_slope(label):
    data = gaussian_bump(N, N)
    cs = jnp.float32(1.0)
    fn = lambda: ps2.surface_tiled(  # noqa: E731
        data, cs, cs, jnp.float32(225.0), jnp.float32(25.0),
        which=("slope",))[0]
    red = jax.jit(lambda a: jnp.sum(a[0, :]))
    t = timed(lambda: red(fn()), reps=30, burst=10)
    print(f"{label}: {t*1e3:.2f} ms ({N*N/1e6/t:.0f} Mpix/s, "
          f"{2*N*N*4/t/1e9:.0f} GB/s)", flush=True)
    return t


def main():
    # correctness first: variant vs the fused-XLA twin at 4096^2
    n = 4096
    d = gaussian_bump(n, n)
    cs = jnp.float32(1.0)
    set_variant(_atan_one_rsqrt)
    a = np.asarray(ps2.surface_tiled(d, cs, cs, jnp.float32(225.0),
                                     jnp.float32(25.0), which=("slope",))[0])
    b = np.asarray(slope_jit(d, cs, cs))
    m = ~np.isnan(a) & ~np.isnan(b)
    nan_ok = (np.isnan(a) == np.isnan(b)).all()
    print(f"one-rsqrt vs XLA twin @4096^2: maxdiff "
          f"{np.abs(a[m]-b[m]).max():.3e} deg, nan_ok={nan_ok}", flush=True)

    results = {"current": [], "one_rsqrt": []}
    for _ in range(2):
        set_variant(_atan_current)
        results["current"].append(time_slope("slope current (sqrt+rsqrt)"))
        set_variant(_atan_one_rsqrt)
        results["one_rsqrt"].append(time_slope("slope one-rsqrt"))
    for k, v in results.items():
        print(f"{k}: best {min(v)*1e3:.2f} ms  runs "
              f"{[f'{x*1e3:.2f}' for x in v]}")


if __name__ == "__main__":
    main()
