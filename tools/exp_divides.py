"""EXPERIMENT (round 3): eliminate per-lane divides in Pallas bodies.

Mosaic does NOT strength-reduce divides — even `/ 2.0` compiles to a
real per-lane divide (hillshade 16k^2 ~3.8-4.3 ms -> 3.4 ms from the
`* 0.5` swap alone).  This validates + times the follow-ups:

  - aspect: _atan2's ratio as y * (1/x) — reciprocal lowering beats the
    generic divide (8.9 -> 8.6 ms).  A min/max range-reduction variant
    with ONE division LOSES (9.8 ms): the abs/min/max/select lattice
    costs more than the divide it saves.  The shipped form keeps the
    old quadrant structure.
  - curvature: scalar divide hoisted off the lanes (bit-identical to
    the XLA twin — XLA performs the same hoist)
  - focal_stats: mean/var share one reciprocal (2 divides -> 1)

Measured (same session, 16k^2): slope 4.58 ms, hillshade 3.36 ms,
aspect 8.67 ms, curvature 6.68 ms, focal_stats x4 12.8 ms.

Same-session A/B for aspect (old _atan2 monkeypatched back in); on-chip
maxdiff vs the fused-XLA twins for aspect + curvature; new-code timings
for curvature + focal_stats.

Run on the real TPU: python tools/exp_divides.py
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
from xrspatial_tpu.kernels import pallas_surface as ps
from xrspatial_tpu.kernels import pallas_surface2 as ps2
from xrspatial_tpu.kernels.surface import aspect_jit, curvature_jit

N = 16384
HALF_PI = ps.HALF_PI

_atan2_new = ps._atan2


def _atan2_old(y, x):
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = ps._atan(y / safe_x)
    pi = jnp.float32(jnp.pi)
    out = jnp.where(
        x > 0.0, base,
        jnp.where(x < 0.0,
                  jnp.where(y < 0.0, base - pi, base + pi),
                  jnp.where(y > 0.0, HALF_PI,
                            jnp.where(y < 0.0, -HALF_PI, 0.0))))
    return jnp.where(jnp.isnan(x) | jnp.isnan(y), jnp.nan, out)


def set_atan2(fn):
    ps._atan2 = fn
    ps2._atan2 = fn
    ps2.surface_tiled.clear_cache()


def time_surface(which, label, data, reps=30, burst=10):
    cs = jnp.float32(1.0)
    red = jax.jit(lambda a: jnp.sum(a[0, :]))
    fn = lambda: red(ps2.surface_tiled(  # noqa: E731
        data, cs, cs, jnp.float32(225.0), jnp.float32(25.0),
        which=which)[0])
    t = timed(fn, reps=reps, burst=burst)
    print(f"{label}: {t*1e3:.2f} ms ({N*N/1e6/t:.0f} Mpix/s)", flush=True)
    return t


def main():
    cs = jnp.float32(1.0)
    # --- correctness: new kernels vs the fused-XLA twins at 4096^2 ----
    n = 4096
    d = gaussian_bump(n, n)
    a = np.asarray(ps2.surface_tiled(d, cs, cs, jnp.float32(225.0),
                                     jnp.float32(25.0), which=("aspect",))[0])
    b = np.asarray(aspect_jit(d))
    m = ~np.isnan(a) & ~np.isnan(b)
    # aspect is circular: compare wrapped degrees
    diff = np.abs(a[m] - b[m])
    diff = np.minimum(diff, 360.0 - diff)
    print(f"aspect maxdiff vs XLA twin: {diff.max():.3e} deg "
          f"(nan_ok={(np.isnan(a) == np.isnan(b)).all()})", flush=True)

    a = np.asarray(ps2.surface_tiled(d, cs, cs, jnp.float32(225.0),
                                     jnp.float32(25.0),
                                     which=("curvature",))[0])
    b = np.asarray(curvature_jit(d, cs))
    m = ~np.isnan(a) & ~np.isnan(b)
    print(f"curvature maxdiff vs XLA twin: {np.abs(a[m]-b[m]).max():.3e} "
          f"(nan_ok={(np.isnan(a) == np.isnan(b)).all()})", flush=True)

    # --- timing ------------------------------------------------------
    data = gaussian_bump(N, N)
    for _ in range(2):
        set_atan2(_atan2_old)
        time_surface(("aspect",), "aspect old atan2 (2 divides)", data)
        set_atan2(_atan2_new)
        time_surface(("aspect",), "aspect new atan2 (1 divide) ", data)

    time_surface(("curvature",), "curvature (hoisted scalar divide)", data)
    time_surface(("hillshade",), "hillshade (*0.5)", data)

    from xrspatial_tpu.convolution import circle_kernel
    from xrspatial_tpu.focal import focal_stats
    from xrspatial_tpu.xrlib import DataArray
    agg = DataArray(data, dims=("y", "x"), name="dem",
                    attrs={"res": (1.0, 1.0)})
    red = jax.jit(lambda a: jnp.sum(a[..., 0, :]))
    kernel = circle_kernel(1, 1, 1.5)
    t = timed(lambda: red(focal_stats(
        agg, kernel, stats_funcs=["mean", "max", "min", "std"]).data),
        reps=12, burst=6)
    print(f"focal_stats x4 (shared inv_cnt): {t*1e3:.2f} ms "
          f"({N*N/1e6/t:.0f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
