"""EXPERIMENT (round 2): what limits the surface stencil on TPU?

Round-1 finding: the emit_pipeline stencil plateaus at ~170-180 GB/s
(GB/s = read+write of the ideal 2*N^2*4 bytes) for every tile shape,
while a plain XLA copy hits 335 GB/s.  This experiment separates the
candidate limits:

  A. XLA elementwise copy              -> HBM ceiling of this methodology
  B. production padded pallas slope    -> reference point
  C. pipeline PURE COPY, same windows  -> DMA/schedule ceiling (no math)
  D. lax.conv-based slope              -> XLA's own stencil engine
  E. pipeline slope, no-atan epilogue  -> VPU cost of the atan polynomial
  F. row-strip windows (full-ish width, halo rows only) slope
  G. XLA shifted-reads slope (production XLA path)

Run on the real TPU:  python tools/exp_stencil2.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xrspatial_tpu.kernels.pallas_surface import _atan, DEG

N = 16384


def _sync(o):
    return float(np.asarray(o.ravel()[-1]))


def bench(label, fn, reps=8):
    o = fn()
    _sync(o)
    t0 = time.perf_counter(); _sync(o); rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    _sync(o)
    dt = (time.perf_counter() - t0 - rt) / reps
    print(f"{label}: {dt*1e3:.2f} ms ({2*N*N*4/dt/1e9:.0f} GB/s eff)",
          flush=True)
    return dt


# ---- C/E/F: parameterized pipeline kernel over padded input ------------
@partial(jax.jit, static_argnames=("th", "tw", "mode"))
def pipe_stencil(data, th, tw, mode):
    """mode: 'copy' (interior passthrough), 'grad' (no atan), 'slope'."""
    h, w = data.shape
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    sh = -(-(th + 2) // 8) * 8
    sw = -(-(tw + 2) // 128) * 128
    padded = jnp.pad(
        data, ((1, (hp - th + sh) - h - 1), (1, (wp - tw + sw) - w - 1)),
        constant_values=jnp.nan)
    gi, gj = hp // th, wp // tw

    def outer(in_hbm, out_hbm):
        def inner(in_ref, out_ref):
            def s(dy, dx):
                return in_ref[1 + dy:1 + dy + th, 1 + dx:1 + dx + tw]
            if mode == "copy":
                out_ref[...] = s(0, 0)
                return
            a, b, c = s(-1, -1), s(-1, 0), s(-1, 1)
            d, f = s(0, -1), s(0, 1)
            g, hh, ii = s(1, -1), s(1, 0), s(1, 1)
            dzdx = ((c + 2.0 * f + ii) - (a + 2.0 * d + g)) * 0.125
            dzdy = ((g + 2.0 * hh + ii) - (a + 2.0 * b + c)) * 0.125
            mag = jnp.sqrt(dzdx * dzdx + dzdy * dzdy)
            if mode == "grad":
                out_ref[...] = mag
            else:
                out_ref[...] = _atan(mag) * DEG

        pltpu.emit_pipeline(
            inner,
            grid=(gi, gj),
            in_specs=[pl.BlockSpec(
                (pl.BoundedSlice(sh), pl.BoundedSlice(sw)),
                lambda i, j: (pl.ds(i * th, sh), pl.ds(j * tw, sw)))],
            out_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j))],
        )(in_hbm, out_hbm)

    out = pl.pallas_call(
        outer,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(16 * 1024 * 1024,
                                 3 * (2 * sh * sw + 2 * th * tw) * 4)),
    )(padded)
    return out[:h, :w]


# ---- D: conv-based slope ------------------------------------------------
@jax.jit
def conv_slope(data):
    h, w = data.shape
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = jnp.asarray([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)
    k = jnp.stack([kx, ky])[:, None]                     # (2,1,3,3) OIHW
    x = data[None, None]                                  # (1,1,H,W)
    g = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)[0]            # (2,H,W)
    mag = jnp.sqrt(g[0] * g[0] + g[1] * g[1]) * 0.125
    out = jnp.arctan(mag) * DEG
    ring = jnp.full((h, w), jnp.nan, jnp.float32)
    return jax.lax.dynamic_update_slice(ring, out[1:-1, 1:-1], (1, 1))


def main():
    x = jnp.asarray(np.random.default_rng(0).random((N, N), np.float32))
    _sync(x)

    cp = jax.jit(lambda a: a + 1.0)
    bench("A xla copy(+1)", lambda: cp(x))

    from xrspatial_tpu.kernels.pallas_surface import surface_pallas
    ref = surface_pallas(x, jnp.float32(1), jnp.float32(1), jnp.float32(225),
                         jnp.float32(25), ("slope",), squeeze=True)
    bench("B production pallas slope", lambda: surface_pallas(
        x, jnp.float32(1), jnp.float32(1), jnp.float32(225),
        jnp.float32(25), ("slope",), squeeze=True))

    for th, tw in ((256, 512), (256, 2048), (512, 1024)):
        try:
            bench(f"C pipe copy {th}x{tw}",
                  lambda: pipe_stencil(x, th, tw, "copy"))
        except Exception as e:
            print(f"C {th}x{tw} FAIL: {type(e).__name__} {str(e)[:120]}")

    try:
        got = conv_slope(x)
        diff = float(jnp.nanmax(jnp.abs(ref - got)))
        print(f"D conv slope maxdiff: {diff:.2e}")
        bench("D conv slope", lambda: conv_slope(x))
    except Exception as e:
        print(f"D FAIL: {type(e).__name__} {str(e)[:160]}")

    for th, tw in ((256, 512), (256, 2048), (512, 1024), (128, 4096)):
        try:
            bench(f"E pipe grad {th}x{tw}",
                  lambda: pipe_stencil(x, th, tw, "grad"))
            got = pipe_stencil(x, th, tw, "slope")
            diff = float(jnp.nanmax(jnp.abs(ref - got)))
            bench(f"E pipe slope {th}x{tw} (maxdiff {diff:.1e})",
                  lambda: pipe_stencil(x, th, tw, "slope"))
        except Exception as e:
            print(f"E {th}x{tw} FAIL: {type(e).__name__} {str(e)[:120]}")

    # F: row strips (2 lane tiles wide so every grid dim >= 2)
    for th, tw in ((64, 8192), (32, 8192), (128, 8192)):
        try:
            bench(f"F strip slope {th}x{tw}",
                  lambda: pipe_stencil(x, th, tw, "slope"))
        except Exception as e:
            print(f"F {th}x{tw} FAIL: {type(e).__name__} {str(e)[:120]}")

    from xrspatial_tpu.kernels.surface import slope_jit
    bench("G xla shifted slope",
          lambda: slope_jit(x, jnp.float32(1.0), jnp.float32(1.0)))


if __name__ == "__main__":
    main()
