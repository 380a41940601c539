"""Pallas pair-evaluation kernel for the exact-viewshed f32 screen.

OPT-IN alternative to the XLA scan screen (`XRSPATIAL_SCREEN_PALLAS=1`).
History: this kernel was built when the scan screen appeared
execution-bound (warm 25 s at 256^2, ~990 s at 1024^2) — measurements
later found to be 1-core *CPU* runs (a profiling helper forced
``jax_platforms=cpu`` at import; BENCH_NOTES round 5 post-mortem).  On
the real chip the scan screen is fine (256^2 0.26 s, 512^2 0.8 s warm
end-to-end) and this kernel matches it warm while costing 145-375 s
cold compile, so it ships validated-but-not-default.  The design note
stands: every candidate window is DMA'd into VMEM once per bucket
group, the lean `_screen_pairs` predicate runs on (T, 128) lane chunks
entirely in registers/VMEM, and the per-target (hi, lo) bounds
accumulate in the kernel — HBM traffic is tables-once + targets-once.

Structure (mirrors `_screen_scan`'s plan exactly — bit-identical):

- grid (G, 1) over the A/B bucket groups (2-D grid: 1-D grids have hit
  Mosaic pytree bugs before, CLAUDE.md);
- the per-group, per-tier first-block indices ride as ONE scalar-
  prefetch operand (G, ntier); each tier's stacked field table
  (nblk, 16, E) is passed TWICE with block shape (nb, 16, E) and index
  maps `r//nb` and `r//nb + 1` — the two nb-aligned blocks always
  cover the planned window [r, r+nb) of E-element blocks, and the
  extra rows are sound supersets (candidates outside the planned
  window cannot cover any of the group's targets, so they fail the
  predicate's cover test; zero-pad rows have a0w == a2w == 0 and can
  never satisfy `al > a0w & al < a2w` for al >= 0);
- the global table is small and rides whole.

Reference for the predicate semantics: viewshed_exact._screen_pairs
(the identical function object is reused inside the kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["screen_hilo_pallas"]

_LANES = 128


def _make_kernel(ntier, T, Lg, screen_pairs, f13):
    nf = len(f13)

    def kernel(rows_ref, al_ref, klo_ref, khi_ref, it_ref,
               gstk_ref, gidx_ref, *refs):
        tier_refs = refs[:4 * ntier]
        hi_ref = refs[4 * ntier]
        lo_ref = refs[4 * ntier + 1]
        al = al_ref[0, 0, :][:, None]
        klo = klo_ref[0, 0, :][:, None]
        khi = khi_ref[0, 0, :][:, None]
        it = it_ref[0, 0, :][:, None]
        ninf = jnp.float32(-jnp.inf)

        def pairs(carry, fld, idx):
            # fld (16, 128) f32 (rows >= nf are zero pads), idx (128,)
            h, l = carry
            c = {f: fld[k][None, :] for k, f in enumerate(f13)}
            c["idx"] = idx[None, :]
            h2, l2 = screen_pairs(al, klo, khi, it, c)
            return jnp.maximum(h, h2), jnp.maximum(l, l2)

        hi = jnp.full((T,), ninf)
        lo = jnp.full((T,), ninf)
        for c in range(Lg // _LANES):
            sl = slice(c * _LANES, (c + 1) * _LANES)
            hi, lo = pairs((hi, lo), gstk_ref[:, sl], gidx_ref[0, sl])

        for t in range(ntier):
            sa, sb, ia, ib = tier_refs[4 * t:4 * t + 4]
            nb = sa.shape[0]
            E = sa.shape[2]
            for sref, iref in ((sa, ia), (sb, ib)):
                for e in range(E // _LANES):
                    sl = slice(e * _LANES, (e + 1) * _LANES)

                    def body(b, carry, sref=sref, iref=iref, sl=sl):
                        fld = sref[pl.ds(b, 1), :, sl][0]
                        idx = iref[pl.ds(b, 1), 0, sl][0]
                        return pairs(carry, fld, idx)

                    hi, lo = jax.lax.fori_loop(0, nb, body, (hi, lo))
        hi_ref[0, 0, :] = hi
        lo_ref[0, 0, :] = lo

    return kernel


@partial(jax.jit, static_argnames=("A", "C", "Es", "NBs", "B",
                                   "interpret"))
def screen_hilo_pallas(glob, stacks, al_t, klo_t, khi_t, it_t, rows,
                       A, C, Es, NBs, B, interpret=False):
    """Per-target sound (hi, lo) blocked-gradient bounds — the Pallas
    twin of `_screen_scan`'s scan body.  Inputs are `_expand_stack`
    outputs plus the per-target f32 vectors (angle, key bands, int32
    index) in bucket order; returns two (A*C,) f32 vectors."""
    from .viewshed_exact import _F13, _screen_pairs

    G = A // B
    T = B * C
    gstk, gidx = glob
    Lg = gidx.shape[0]
    gstk = jnp.pad(gstk, ((0, 16 - gstk.shape[0]), (0, 0)))
    ins = [al_t.reshape(G, 1, T), klo_t.reshape(G, 1, T),
           khi_t.reshape(G, 1, T), it_t.reshape(G, 1, T), gstk,
           gidx[None]]

    def tgt_spec():
        # (G, 1, T) with (1, 1, T) blocks: Mosaic requires the last two
        # BLOCK dims to divide (8, 128) or equal the array dims — the
        # dummy middle axis satisfies that for any G
        return pl.BlockSpec((1, 1, T), lambda g, z, r: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [tgt_spec() for _ in range(4)]
    in_specs += [pl.BlockSpec((16, Lg), lambda g, z, r: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, Lg), lambda g, z, r: (0, 0),
                              memory_space=pltpu.VMEM)]

    rows2 = []
    for t, ((stk, idx), E, NB) in enumerate(zip(stacks, Es, NBs)):
        nblk = idx.shape[0]
        nb = min(NB, nblk)
        nbp = -(-nblk // nb) * nb
        nbb = nbp // nb
        stk = jnp.pad(stk, ((0, nbp - nblk), (0, 3), (0, 0)))
        idx = jnp.pad(idx, ((0, nbp - nblk), (0, 0)))[:, None, :]
        rows2.append(jnp.minimum(rows[t], nblk - nb).astype(jnp.int32))

        def smap(k, t=t, nb=nb, nbb=nbb):
            return lambda g, z, r: (
                jnp.minimum(r[g, t] // nb + k, nbb - 1), 0, 0)

        def imap(k, t=t, nb=nb, nbb=nbb):
            return lambda g, z, r: (
                jnp.minimum(r[g, t] // nb + k, nbb - 1), 0, 0)

        ins += [stk, stk, idx, idx]
        in_specs += [
            pl.BlockSpec((nb, 16, E), smap(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 16, E), smap(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, E), imap(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, E), imap(1), memory_space=pltpu.VMEM),
        ]

    rows_pref = (jnp.stack(rows2, axis=1) if rows2
                 else jnp.zeros((G, 1), jnp.int32))
    out_spec = pl.BlockSpec((1, 1, T), lambda g, z, r: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = _make_kernel(len(stacks), T, Lg, _screen_pairs, _F13)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, 1),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
    )
    hi, lo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, 1, T), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rows_pref, *ins)
    return hi.reshape(A * C), lo.reshape(A * C)
