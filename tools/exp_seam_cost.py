"""Isolate the seam-machinery cost in surface_tiled at 16k^2.

Variants: (a) production, (b) skip column DUS, (c) skip row bands
(zeros), (d) bare pallas_call.  Within one session.
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
import xrspatial_tpu.kernels.pallas_surface2 as ps2  # noqa: E402

N = 16384
TH, TW = ps2.TILE_H, ps2.TILE_W


def variant(mode):
    """Copy of surface_tiled's slope path with pieces toggled."""
    _make_kernel = ps2._make_kernel
    which = ("slope",)

    @jax.jit
    def run(data):
        h, w = data.shape
        th, tw = TH, TW
        gi, gj = h // th, w // tw
        padded = data
        csx = jnp.float32(1.0)
        csy = jnp.float32(1.0)
        az = jnp.float32(225.0)
        alt = jnp.float32(25.0)
        azrad = (360.0 - az) * (jnp.pi / 180.0)
        phi = azrad - jnp.pi / 2.0

        colpos = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        ring_c = (colpos == 0) | (colpos >= w - 1)
        rowpos = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        ring_r = (rowpos == 0) | (rowpos >= h - 1)

        if mode in ("prod", "nodus"):
            def row_group(o):
                md_ = padded[o::th]
                if o == 0:
                    up_ = jnp.concatenate([padded[0:1],
                                           padded[th - 1::th][:-1]])
                    dn_ = padded[1::th]
                else:
                    up_ = padded[th - 2::th]
                    dn_ = jnp.concatenate([padded[0::th][1:], padded[0:1]])
                nb = (up_[:, :-2], up_[:, 1:-1], up_[:, 2:],
                      md_[:, :-2], md_[:, 1:-1], md_[:, 2:],
                      dn_[:, :-2], dn_[:, 1:-1], dn_[:, 2:])
                rr = np.arange(gi) * th + o
                ok = jnp.asarray((rr > 0) & (rr < h - 1))[:, None]
                return [jnp.where(ok & ~ring_c,
                                  jnp.pad(p, ((0, 0), (1, 1)),
                                          constant_values=jnp.nan), jnp.nan)
                        for p in ps2._band_products(nb, which, csx, csy,
                                                    az, alt)]
            rb0 = row_group(0)
            rb1 = row_group(th - 1)
            rowbands = [jnp.pad(jnp.stack([r0, r1], axis=1),
                                ((0, 0), (0, 6), (0, 0))).reshape(8 * gi, w)
                        for r0, r1 in zip(rb0, rb1)]
        else:
            rowbands = [jnp.zeros((8 * gi, w), jnp.float32)]

        scal = lambda v: jnp.full((1, 1), v, jnp.float32)  # noqa: E731
        smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
        vmem = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
        rb_spec = pl.BlockSpec((8, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            ps2._make_kernel(which, th, tw),
            grid=(gi, gj),
            in_specs=[smem] * 6 + [vmem] + [rb_spec],
            out_specs=[vmem],
            out_shape=[jax.ShapeDtypeStruct((h, w), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=max(48 * 1024 * 1024, 10 * th * tw * 4)),
        )(scal(csx), scal(csy), scal(jnp.sin(alt * (jnp.pi / 180.0))),
          scal(jnp.cos(alt * (jnp.pi / 180.0))), scal(jnp.sin(phi)),
          scal(jnp.cos(phi)), padded, *rowbands)
        out = outs[0]
        if mode == "bare":
            return out
        if mode in ("prod", "norows"):
            for j in range(1, gj):
                cc = j * tw
                tri = jax.lax.slice_in_dim(padded, cc - 2, cc + 2, axis=1)
                nb = (tri[:-2, 0:2], tri[:-2, 1:3], tri[:-2, 2:4],
                      tri[1:-1, 0:2], tri[1:-1, 1:3], tri[1:-1, 2:4],
                      tri[2:, 0:2], tri[2:, 1:3], tri[2:, 2:4])
                bands = ps2._band_products(nb, which, csx, csy, az, alt)
                patch = jnp.pad(bands[0], ((1, 1), (0, 0)),
                                constant_values=jnp.nan)
                patch = jnp.where(ring_r, jnp.nan, patch)
                out = jax.lax.dynamic_update_slice(out, patch, (0, cc - 1))
            nan_col = jnp.full((h, 1), jnp.nan, jnp.float32)
            out = jax.lax.dynamic_update_slice(out, nan_col, (0, 0))
            out = jax.lax.dynamic_update_slice(out, nan_col, (0, w - 1))
        return out

    return run


def main():
    data = gaussian_bump(N, N)
    jax.block_until_ready(data)
    gb = 2 * N * N * 4 / 1e9
    fns = {m: variant(m) for m in ("bare", "nodus", "norows", "prod")}
    for fn in fns.values():  # compile all first
        np.asarray(fn(data)[0, 0])
    for rep in range(3):
        for mode, fn in fns.items():
            t = timed(lambda: fn(data), reps=20, burst=10)
            print(f"[{rep}] {mode}: {t*1e3:.2f} ms ({gb/t:.0f} GB/s)",
                  flush=True)


if __name__ == "__main__":
    main()
