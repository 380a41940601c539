"""Measure the chip's ACHIEVABLE HBM stream rate through this stack.

VERDICT r3 weak #3: stencil bandwidth claims ("bandwidth-steady
~400-467 GB/s") were unanchored — nominal v5e HBM is ~819 GB/s but
nothing recorded what a pure stream actually sustains through the
Pallas tiling + axon tunnel measurement path.  This tool times:

- `pallas copy` (1 read + 1 write, the stencil kernels' traffic shape)
  at the surface kernels' 128x8192 tile and focal's 256x4096 tile;
- `pallas add` (2r + 1w, closer to multi-operand focal reads);
- `xla copy` (jnp `x + 0.0`) for the fused-XLA comparison.

Uses bench.py's burst timing (the only honest clock through the
tunnel).  Results -> BENCH_NOTES.md "roofline" table; the stencil
kernels are then judged against the MEASURED ceiling, not the nominal
one.

Usage: python tools/measure_stream.py [N]   (default 16384)
"""
import os
import sys
import time  # noqa: F401  (bench helpers use it)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import timed


@partial(jax.jit, static_argnames=("th", "tw"))
def pallas_copy(x, th, tw):
    h, w = x.shape

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(h // th, w // tw), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x)


@partial(jax.jit, static_argnames=("th", "tw"))
def pallas_add(x, y, th, tw):
    h, w = x.shape

    def kernel(x_ref, y_ref, o_ref):
        o_ref[...] = x_ref[...] + y_ref[...]

    spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(h // th, w // tw), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, y)


@jax.jit
def xla_copy(x):
    return x + jnp.float32(0.0)


def main(n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, n), np.float32))
    y = jnp.asarray(rng.random((n, n), np.float32))
    gb = x.size * 4 / 1e9
    rows = []
    for label, fn, traffic in [
        ("pallas copy 128x8192", lambda: pallas_copy(x, 128, 8192), 2),
        ("pallas copy 256x4096", lambda: pallas_copy(x, 256, 4096), 2),
        # 3 buffers x full-size tiles x double-buffering busts the 16 MB
        # scoped-VMEM limit (measured: 24 MB demanded at 128x8192);
        # half-size tiles keep the add within budget
        ("pallas add  128x4096", lambda: pallas_add(x, y, 128, 4096), 3),
        ("pallas add  256x2048", lambda: pallas_add(x, y, 256, 2048), 3),
        ("xla copy (x+0)      ", lambda: xla_copy(x), 2),
    ]:
        t = timed(fn, reps=18, burst=6)
        rows.append((label, t * 1e3, traffic * gb / t))
        print(f"{label}: {t*1e3:7.2f} ms  {traffic*gb/t:7.1f} GB/s",
              flush=True)
    best = max(r[2] for r in rows)
    print(f"\nmeasured stream ceiling: {best:.0f} GB/s "
          f"({best/819*100:.0f}% of nominal 819)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
