"""Pallas TPU kernel: fused 3x3 surface stencil (slope/aspect/curvature/
hillshade) in one streaming pass.

This kernel streams (TILE+2)-windows HBM->VMEM via async DMA and computes
every requested surface product from the 9 in-register neighbor views
(HBM traffic = 1 read + K writes).  Replaces the reference's per-op
Numba/CUDA kernels (slope.py:56-76, aspect.py:56-90, curvature.py:31-41,
hillshade.py:20-35) with one parameterized program.

PERF STATUS (v5e, 8k^2): the XLA shifted-reads path (kernels/surface.py)
currently beats this kernel (10 ms vs 16 ms for 4 products) because the
halo DMA here is serialized with compute — cross-grid-step double
buffering deadlocks under the Mosaic runtime (works in interpret mode) and
needs the emit_pipeline API.  The ops therefore default to the XLA path;
this kernel is kept tested (interpret-mode parity) as the optimization
groundwork.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .surface import DEG

__all__ = ["surface_pallas"]

TILE_H = 256
TILE_W = 512

HALF_PI = float(jnp.pi) / 2.0


def _atan(x):
    """float32 arctangent — Mosaic has no atan primitive.

    Odd minimax polynomial on |t|<=1 with 1/x range reduction;
    max error ~1e-7 (well inside the 1e-5 parity contract).
    """
    ax = jnp.abs(x)
    big = ax > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(ax, 1e-30), ax)
    r = t * _atan_poly(t * t)
    r = jnp.where(big, HALF_PI - r, r)
    return jnp.where(x < 0.0, -r, r)


def _atan_poly(t2):
    """Shared 7-term minimax Horner evaluation for _atan/_atan_of_sqrt
    (single source: a coefficient tweak must hit both identically)."""
    p = jnp.float32(-0.0040540580)
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * t2 + jnp.float32(c)
    return p


def _atan2(y, x):
    """float32 atan2 from _atan with quadrant corrections.

    The ratio is y * (1/x), not y / x: Mosaic's reciprocal lowering is
    measurably cheaper than its generic divide (aspect 16k^2 8.9 ->
    8.6 ms, tools/exp_divides.py; a min/max range-reduction variant
    with ONE division was tried and LOSES, 9.8 ms — the extra
    abs/min/max/select lattice costs more than the divide it saves).
    Trade-off: when BOTH |x| and |y| are below ~1e-38 (subnormal
    gradients, unreachable for real DEM data), 1/x overflows and the
    result saturates to +-pi/2 where y/x would give a mid-quadrant
    angle; maxdiff vs the XLA twin on terrain data is 3.1e-5 deg.
    |safe_x| is clamped above the reciprocal-overflow threshold so the
    reciprocal stays finite — without it, y == 0 with 0 < |x| < ~2.9e-39
    gave 0 * inf = NaN where y/x gives 0 (reachable only on the CPU
    interpret path; TPU flushes subnormals)."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    safe_x = jnp.where(jnp.abs(safe_x) < 1e-37,
                       jnp.where(safe_x < 0.0, jnp.float32(-1e-37),
                                 jnp.float32(1e-37)), safe_x)
    base = _atan(y * (1.0 / safe_x))
    pi = jnp.float32(jnp.pi)
    out = jnp.where(
        x > 0.0, base,
        jnp.where(x < 0.0,
                  jnp.where(y < 0.0, base - pi, base + pi),
                  jnp.where(y > 0.0, HALF_PI,
                            jnp.where(y < 0.0, -HALF_PI, 0.0))))
    # NaN inputs fall through every comparison to the 0.0 branch — restore
    return jnp.where(jnp.isnan(x) | jnp.isnan(y), jnp.nan, out)


def _atan_of_sqrt(s):
    """atan(sqrt(s)) for s >= 0 with ONE rsqrt and no divide/sqrt.

    The |t|<=1 range reduction of _atan needs t = sqrt(s) or 1/sqrt(s);
    a vectorized select evaluates both sides on every lane, so instead
    of paying sqrt AND rsqrt the small branch reuses the rsqrt:
    sqrt(s) == s * rsqrt(s) up to ~1 extra ulp (slope maxdiff vs the
    XLA twin 1.9e-5 deg on chip, gate 5e-4; 16k^2 5.21 -> 4.89 ms,
    tools/exp_atan_rsqrt.py).  The max(s, 1e-30) keeps s == 0 finite
    (0 * inf would be NaN).  Same minimax polynomial as _atan."""
    big = s > 1.0
    rs = jax.lax.rsqrt(jnp.maximum(s, 1e-30))
    t = jnp.where(big, rs, s * rs)
    r = t * _atan_poly(t * t)
    return jnp.where(big, HALF_PI - r, r)


def _round_up(x, m):
    return -(-x // m) * m


def _make_kernel(which, th, tw, sh, sw, gi, gj):
    def outer(csx_ref, csy_ref, az_ref, alt_ref, in_hbm, out_hbm):
        # scalars live in SMEM on the outer kernel; the inner pipeline body
        # closes over them (tiny blocks cannot ride the DMA pipeline: slice
        # shapes must align to the (8, 128) tiling)
        csx = csx_ref[0, 0]
        csy = csy_ref[0, 0]
        az_v = az_ref[0, 0]
        alt_v = alt_ref[0, 0]

        def inner(in_ref, out_ref):
            def shift(dy, dx):
                return in_ref[1 + dy:1 + dy + th, 1 + dx:1 + dx + tw]

            a = shift(-1, -1)
            b = shift(-1, 0)
            c = shift(-1, 1)
            d = shift(0, -1)
            e = shift(0, 0)
            f = shift(0, 1)
            g = shift(1, -1)
            h = shift(1, 0)
            ii = shift(1, 1)

            need_horn = any(s in which for s in ("slope", "aspect"))
            if need_horn:
                dzdx8 = (c + 2.0 * f + ii) - (a + 2.0 * d + g)
                dzdy8 = (g + 2.0 * h + ii) - (a + 2.0 * b + c)

            for k, stat in enumerate(which):
                if stat == "slope":
                    gx = dzdx8 * (0.125 / csx)
                    gy = dzdy8 * (0.125 / csy)
                    out_ref[k] = _atan_of_sqrt(gx * gx + gy * gy) * DEG
                elif stat == "aspect":
                    gx = dzdx8 * 0.125
                    gy = dzdy8 * 0.125
                    angle = _atan2(gy, -gx) * (180.0 / jnp.pi)
                    compass = jnp.where(
                        angle < 0.0, 90.0 - angle,
                        jnp.where(angle > 90.0, 450.0 - angle,
                                  90.0 - angle))
                    flat = (gx == 0.0) & (gy == 0.0)
                    out_ref[k] = jnp.where(flat, -1.0, compass)
                elif stat == "curvature":
                    cs = (csx + csy) * 0.5
                    dd = (h + b) * 0.5 - e
                    ee = (f + d) * 0.5 - e
                    # scalar divide hoisted out of the lanes (Mosaic
                    # does not strength-reduce per-lane divides)
                    out_ref[k] = (dd + ee) * (-200.0 / (cs * cs))
                elif stat == "hillshade":
                    # transcendental-free epilogue (see
                    # kernels/surface.py::hillshade_from_gradient)
                    gxr = (h - b) * 0.5
                    gyc = (f - d) * 0.5
                    azrad = (360.0 - az_v) * (jnp.pi / 180.0)
                    altrad = alt_v * (jnp.pi / 180.0)
                    phi = azrad - jnp.pi / 2.0
                    sin_a = jnp.sin(altrad)
                    cos_a = jnp.cos(altrad)
                    cos_p = jnp.cos(phi)
                    sin_p = jnp.sin(phi)
                    shaded = ((sin_a + cos_a * (cos_p * gyc - sin_p * gxr))
                              * jax.lax.rsqrt(
                                  1.0 + gxr * gxr + gyc * gyc))
                    # * 0.5 is bit-identical to / 2.0 but Mosaic pays a
                    # real per-lane divide for the latter (hillshade
                    # 16k^2 ~3.8-4.3 -> 3.4 ms measured on surface2)
                    out_ref[k] = (shaded + 1.0) * 0.5

        nk = len(which)
        pltpu.emit_pipeline(
            inner,
            grid=(gi, gj),
            in_specs=[pl.BlockSpec(
                (pl.BoundedSlice(sh), pl.BoundedSlice(sw)),
                lambda i, j: (pl.ds(i * th, sh), pl.ds(j * tw, sw)))],
            out_specs=[pl.BlockSpec((nk, th, tw), lambda i, j: (0, i, j))],
        )(in_hbm, out_hbm)

    return outer


@partial(jax.jit, static_argnames=("which", "interpret", "squeeze"))
def surface_pallas(data, cellsize_x, cellsize_y, azimuth, angle_altitude,
                   which=("slope",), interpret=False, squeeze=False):
    """(K, H, W) stacked surface products with 1-cell NaN borders.

    One double-buffered streaming pass (pltpu.emit_pipeline) computes every
    product in `which` (subset of slope/aspect/curvature/hillshade) —
    measured ~2x the fused-XLA path at 8k^2 (near HBM roofline).
    """
    data = data.astype(jnp.float32)
    h, w = data.shape
    th = min(TILE_H, _round_up(max(8, h), 8))
    tw = min(TILE_W, _round_up(max(128, w), 128))
    # grid dims of 1 trip a Slice-pytree canonicalization bug in the
    # pipeline emitter; halve tiles until every grid dim is >= 2
    while -(-h // th) < 2 and th > 8:
        th = _round_up(max(th // 2, 8), 8)
    while -(-w // tw) < 2 and tw > 128:
        tw = _round_up(max(tw // 2, 128), 128)
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    sh = _round_up(th + 2, 8)
    sw = _round_up(tw + 2, 128)

    padded = jnp.pad(
        data, ((1, (hp - th + sh) - h - 1), (1, (wp - tw + sw) - w - 1)),
        constant_values=jnp.nan)

    k = len(which)
    scalar = lambda v: jnp.full((1, 1), v, jnp.float32)  # noqa: E731
    outer = _make_kernel(which, th, tw, sh, sw, hp // th, wp // tw)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        outer,
        in_specs=[smem, smem, smem, smem,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((k, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                16 * 1024 * 1024,
                3 * (2 * sh * sw + 2 * k * th * tw) * 4)),
        interpret=interpret,
    )(scalar(cellsize_x), scalar(cellsize_y), scalar(azimuth),
      scalar(angle_altitude), padded)
    out = out[:, :h, :w]
    # in-jit squeeze for single-product calls: slicing outside the jit
    # would materialize an extra full copy
    return out[0] if (squeeze and len(which) == 1) else out
