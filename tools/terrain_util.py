"""Seeded synthetic terrain for the viewshed tools — IMPORT-SIDE-EFFECT
FREE.

History lesson (round 5): this function used to live in
measure_viewshed_agreement.py, whose import forces
``jax_platforms=cpu`` unless VS_TPU=1.  Every "TPU" profiling script
that imported make_terrain from there silently ran on one CPU core —
producing the bogus 25 s @256^2 / ~990 s @1024^2 exact-viewshed
figures that round 5 first published and then retracted (BENCH_NOTES
round 5 post-mortem; real chip: 0.26 s / ~10 s).  Terrain synthesis
therefore lives here, importing numpy only; tools that want a specific
backend must configure it themselves and PRINT
``jax.default_backend()`` so the platform is part of the record.
"""
import numpy as np


def make_terrain(n, seed):
    """Smooth multi-scale terrain: sum of bilinearly-upsampled noise."""
    rng = np.random.default_rng(seed)
    out = np.zeros((n, n), np.float64)
    k = 4
    amp = 400.0
    while k <= n:
        coarse = rng.standard_normal((k, k))
        # bilinear upsample to n x n
        yi = np.linspace(0, k - 1, n)
        xi = np.linspace(0, k - 1, n)
        y0 = np.clip(yi.astype(int), 0, k - 2)
        x0 = np.clip(xi.astype(int), 0, k - 2)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        c = (coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
             + coarse[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
             + coarse[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
             + coarse[np.ix_(y0 + 1, x0 + 1)] * fy * fx)
        out += amp * c
        amp /= 2.2
        k *= 2
    return out.astype(np.float32)
