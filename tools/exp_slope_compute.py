"""Is slope bandwidth-bound or compute-bound?  (VERDICT r3 weak #3)

Times the production slope stencil (pallas_surface2.surface_tiled)
against a variant whose `_atan_of_sqrt` epilogue is monkeypatched to a
1-multiply stand-in (same memory traffic, ~no transcendental FLOPs),
and against the measured pure-stream copy at the same 128x8192 tile
(tools/measure_stream.py).  If the no-atan variant closes most of the
gap to the copy ceiling, slope's deficit is VPU compute (the 7-term
atan Horner over every pixel), not a pipeline inefficiency.

Usage: python tools/exp_slope_compute.py [N]   (default 16384)
"""
import os
import sys
import time  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import timed


def main(n):
    from xrspatial_tpu.kernels import pallas_surface2 as ps2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n), np.float32) * 300.0)
    gb = x.size * 4 / 1e9
    f32 = jnp.float32

    def fresh_run():
        # surface_tiled's jit cache would ignore the monkeypatch; a
        # fresh jit of the unwrapped function retraces and picks up the
        # patched module global (both variants pay the same wrapper)
        fn = jax.jit(ps2.surface_tiled.__wrapped__,
                     static_argnames=("which", "th", "tw", "interpret"))
        return lambda: fn(x, f32(1.0), f32(1.0), f32(225.0), f32(25.0),
                          which=("slope",))[0]

    t_prod = timed(fresh_run(), reps=18, burst=6)
    print(f"slope (production atan): {t_prod*1e3:7.2f} ms  "
          f"{2*gb/t_prod:6.1f} GB/s", flush=True)

    real_atan = ps2._atan_of_sqrt
    try:
        # same operand count/dtype, negligible FLOPs
        ps2._atan_of_sqrt = lambda t2: t2 * 0.57
        t_noatan = timed(fresh_run(), reps=18, burst=6)
        print(f"slope (atan -> 1 mul):   {t_noatan*1e3:7.2f} ms  "
              f"{2*gb/t_noatan:6.1f} GB/s", flush=True)
    finally:
        ps2._atan_of_sqrt = real_atan

    print(f"\natan epilogue cost: {(t_prod-t_noatan)*1e3:.2f} ms "
          f"({(t_prod-t_noatan)/t_prod*100:.0f}% of slope)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
