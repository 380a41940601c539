"""A/B: 9-window Horn stencil vs separable (vertical smooth + horiz diff).

Interior-only kernels (no seam bands) on a 16k^2 tile grid — isolates the
stencil-core cost.  Run on chip; compare within this one session.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench import gaussian_bump, timed  # noqa: E402
from xrspatial_tpu.kernels.pallas_surface2 import _atan_of_sqrt  # noqa: E402

DEG = 57.29577951308232
N = 16384
TH, TW = 256, 4096


def make(call_kind):
    def kernel(in_ref, out_ref):
        x = in_ref[...]
        if call_kind == "nine":
            a, b, c = x[:-2, :-2], x[:-2, 1:-1], x[:-2, 2:]
            d, f = x[1:-1, :-2], x[1:-1, 2:]
            g, hh, ii = x[2:, :-2], x[2:, 1:-1], x[2:, 2:]
            dzdx8 = (c + 2.0 * f + ii) - (a + 2.0 * d + g)
            dzdy8 = (g + 2.0 * hh + ii) - (a + 2.0 * b + c)
        elif call_kind == "sep":
            s = x[:-2, :] + 2.0 * x[1:-1, :] + x[2:, :]     # vertical smooth
            dv = x[2:, :] - x[:-2, :]                        # vertical diff
            dzdx8 = s[:, 2:] - s[:, :-2]
            dzdy8 = dv[:, :-2] + 2.0 * dv[:, 1:-1] + dv[:, 2:]
        gx = dzdx8 * 0.125
        gy = dzdy8 * 0.125
        out_ref[1:TH - 1, 1:TW - 1] = _atan_of_sqrt(gx * gx + gy * gy) * DEG
        nanrow = jnp.full((1, TW), jnp.nan, jnp.float32)
        out_ref[0:1, :] = nanrow
        out_ref[TH - 1:TH, :] = nanrow

    vmem = pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(data):
        return pl.pallas_call(
            kernel,
            grid=(N // TH, N // TW),
            in_specs=[vmem],
            out_specs=vmem,
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(data)

    return run


def main():
    data = gaussian_bump(N, N)
    jax.block_until_ready(data)
    gb = 2 * N * N * 4 / 1e9

    runs = {k: make(k) for k in ("nine", "sep")}
    a = np.asarray(runs["nine"](data)[5:100, 5:100])
    b = np.asarray(runs["sep"](data)[5:100, 5:100])
    print("maxdiff nine-vs-sep:", np.max(np.abs(a - b)), flush=True)

    for k, fn in runs.items():
        t = timed(lambda fn=fn: fn(data), reps=20, burst=10)
        print(f"{k}: {t*1e3:.2f} ms ({gb/t:.0f} GB/s)", flush=True)
    # interleave a second time to expose drift
    for k, fn in runs.items():
        t = timed(lambda fn=fn: fn(data), reps=20, burst=10)
        print(f"{k} (2nd): {t*1e3:.2f} ms ({gb/t:.0f} GB/s)", flush=True)

    # full production path for context
    from xrspatial_tpu.kernels.pallas_surface2 import surface_tiled
    one = jnp.float32(1.0)
    t = timed(lambda: surface_tiled(data, one, one, jnp.float32(225.0),
                                    jnp.float32(25.0), ("slope",))[0],
              reps=20, burst=10)
    print(f"surface_tiled slope (prod): {t*1e3:.2f} ms ({gb/t:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
