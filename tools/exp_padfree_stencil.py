"""EXPERIMENT (kept for round-2 work): pad-free 2-D interior-tile
emit_pipeline slope kernel.

Interior tiles cover rows [8, h-8) x cols [128, w-128); their halo
windows start at (i*th, j*tw) — always in-bounds and 8/128-aligned, so
every in-window slice is static (offsets 7/8/9 x 127/128/129).  The thin
edge bands (8 rows / 128 cols) are computed by the XLA path on slices
and spliced with in-place dynamic-update-slice.  No NaN pad copy.

MEASURED (v5e, 16k^2, 2026-08-16): 12.0 ms vs 14.3 ms for the padded
production kernel — only ~15% despite removing the 6.6 ms pad copy; the
pipelined stencil itself runs at ~170-180 GB/s end-to-end regardless of
tile shape (256x512 ... 512x4096 all equal), while an XLA elementwise
copy reaches 335 GB/s.  The pipeline kernel, not the pad, is the floor.
Lessons encoded here for the production kernels if that floor ever
lifts:
  - dynamic sublane starts must be PROVABLY 8-aligned: write index
    arithmetic as 8*(...) (divisibility analysis is syntactic);
  - BoundedSlice element-offset windows work for OUTPUTS too;
  - the default scoped-VMEM limit is 16 MB; raise it with
    pltpu.CompilerParams(vmem_limit_bytes=...);
  - full-width row tiles lose their pad savings to lane rolls
    (pltpu.roll across a 16k row costs a full VMEM pass per neighbor).
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


@partial(jax.jit, static_argnames=("th", "tw"))
def slope_2d(data, csx, csy, th=256, tw=2048):
    data = data.astype(jnp.float32)
    h, w = data.shape
    assert h % 8 == 0 and w % 128 == 0 and h >= 2 * th and w >= 2 * tw
    sh, sw = th + 16, tw + 256
    ih, iw = h - 16, w - 256          # interior extent
    ni = -(-ih // th)
    nj = -(-iw // tw)

    def outer(csx_ref, csy_ref, in_hbm, out_hbm):
        csx_v = csx_ref[0]
        csy_v = csy_ref[0]

        def inner(in_ref, out_ref):
            def sh_(dy, dx):
                return in_ref[8 + dy:8 + dy + th, 128 + dx:128 + dx + tw]

            a, b, c = sh_(-1, -1), sh_(-1, 0), sh_(-1, 1)
            d, f = sh_(0, -1), sh_(0, 1)
            g, hh, ii = sh_(1, -1), sh_(1, 0), sh_(1, 1)
            dzdx = ((c + 2.0 * f + ii) - (a + 2.0 * d + g)) / (8.0 * csx_v)
            dzdy = ((g + 2.0 * hh + ii) - (a + 2.0 * b + c)) / (8.0 * csy_v)
            out_ref[...] = _atan(jnp.sqrt(dzdx * dzdx + dzdy * dzdy)) * DEG

        def ystart(i):  # window row start, clamped so the last tile overlaps
            return jnp.minimum(i * (th // 8), (h - sh) // 8) * 8

        def xstart(j):
            return jnp.minimum(j * (tw // 128), (w - sw) // 128) * 128

        pltpu.emit_pipeline(
            inner,
            grid=(ni, nj),
            in_specs=[pl.BlockSpec(
                (pl.BoundedSlice(sh), pl.BoundedSlice(sw)),
                lambda i, j: (pl.ds(ystart(i), sh), pl.ds(xstart(j), sw)))],
            out_specs=[pl.BlockSpec(
                (pl.BoundedSlice(th), pl.BoundedSlice(tw)),
                lambda i, j: (pl.ds(ystart(i) + 8, th),
                              pl.ds(xstart(j) + 128, tw)))],
        )(in_hbm, out_hbm)

    scalar = lambda v: jnp.asarray([v], jnp.float32)
    interior = pl.pallas_call(
        outer,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=40 * h * w,
                                      bytes_accessed=2 * h * w * 4,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(scalar(csx), scalar(csy), data)

    # thin edge bands via XLA shifted reads on slices (includes the
    # 1-cell NaN ring for free via the local pad)
    def band(rows_slice):
        p = jnp.pad(rows_slice, 1, constant_values=jnp.nan)
        a, b, c = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
        d, f = p[1:-1, :-2], p[1:-1, 2:]
        g, hh, ii = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
        dzdx = ((c + 2.0 * f + ii) - (a + 2.0 * d + g)) / (8.0 * csx)
        dzdy = ((g + 2.0 * hh + ii) - (a + 2.0 * b + c)) / (8.0 * csy)
        return jnp.arctan(jnp.sqrt(dzdx * dzdx + dzdy * dzdy)) * DEG

    out = interior
    out = out.at[0:8].set(band(data[0:9])[:8])
    out = out.at[h - 8:h].set(band(data[h - 9:])[1:])
    out = out.at[:, 0:128].set(band(data[:, 0:129])[:, :128])
    out = out.at[:, w - 128:w].set(band(data[:, w - 129:])[:, 1:])
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    ring = (rows >= 1) & (rows < h - 1) & (cols >= 1) & (cols < w - 1)
    return jnp.where(ring, out, jnp.nan)


if __name__ == "__main__":
    from xrspatial_tpu.kernels.surface import slope_jit

    N = 16384
    x = jnp.asarray(np.random.default_rng(0).random((N, N), np.float32))
    float(jnp.sum(x))

    ref = slope_jit(x, jnp.float32(1.0), jnp.float32(1.0))

    def bench(label, fn):
        o = fn(); float(jnp.sum(o[0]))
        t0 = time.perf_counter()
        for _ in range(8):
            o = fn()
        float(jnp.sum(o[0]))
        dt = (time.perf_counter() - t0) / 8
        print(f"{label}: {dt*1e3:.2f} ms ({2*N*N*4/dt/1e9:.0f} GB/s)")

    for th, tw in ((256, 2048), (256, 4096), (512, 2048), (128, 4096)):
        try:
            got = slope_2d(x, 1.0, 1.0, th=th, tw=tw)
            diff = float(jnp.nanmax(jnp.abs(ref - got)))
            nan_same = bool(jnp.all(jnp.isnan(ref) == jnp.isnan(got)))
            print(f"th={th} tw={tw}: maxdiff {diff:.3e} nan-match {nan_same}")
            bench(f"2d {th}x{tw}", lambda: slope_2d(x, 1.0, 1.0, th=th, tw=tw))
        except Exception as e:
            print(f"{th}x{tw} FAIL: {type(e).__name__} {str(e)[:140]}")
    from xrspatial_tpu.kernels.pallas_surface import surface_pallas
    bench("padded pallas", lambda: surface_pallas(
        x, jnp.float32(1), jnp.float32(1), jnp.float32(225),
        jnp.float32(25), ("slope",), squeeze=True))
