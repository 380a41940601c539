"""Shared benchmark scaffolding (reference benchmarks/benchmarks/common.py).

``get_dataarray`` reproduces the reference's Gaussian-bump-with-noise
DEM recipe (common.py:7-62) on device.  ``Benchmarking`` mirrors the
reference's ASV base class: parameterized over raster width, one
``time()`` helper per op.  The reference parameterizes over backends
("numpy", "cupy", "rtxpy"); here there is one backend — the JAX device —
so the type axis collapses.
"""

from __future__ import annotations

import time

import numpy as np


def get_dataarray(shape, seed=71942, is_int=False, include_nan=False):
    import jax.numpy as jnp

    from xrspatial_tpu.xrlib import DataArray
    ny, nx = shape
    x = np.linspace(-180, 180, nx)
    y = np.linspace(-90, 90, ny)
    x2, y2 = np.meshgrid(x, y)
    rng = np.random.default_rng(seed)
    if is_int:
        z = rng.integers(-nx, nx, size=shape).astype(np.float32)
    else:
        z = 100.0 * np.exp(-x2 ** 2 / 5e5 - y2 ** 2 / 2e5)
        z += rng.normal(0.0, 2.0, (ny, nx))
    if include_nan:
        z[0, 0] = np.nan
    agg = DataArray(jnp.asarray(z, dtype=jnp.float32), dims=("y", "x"),
                    name="dem", attrs={"res": (1.0, 1.0)})
    agg["y"] = y
    agg["x"] = x
    return agg


def sync(out):
    """Scalar-fetch completion barrier (block_until_ready is a no-op
    through the device tunnel)."""
    import jax
    import jax.numpy as jnp
    for leaf in jax.tree_util.tree_leaves(getattr(out, "data", out)):
        if isinstance(leaf, jax.Array):
            if leaf.ndim == 0:
                float(leaf.astype(jnp.float32))
            else:
                float(jnp.sum(leaf.ravel()[0:1].astype(jnp.float32)))
            return
    # host result (DataFrame etc.) is already materialized


class Benchmarking:
    """Parameterized timing harness in the reference's ASV shape."""

    params = ([256, 1024, 4096],)
    param_names = ("nx",)
    repeat = 3

    def __init__(self, func=None):
        self.func = func

    def setup(self, nx):
        self.agg = get_dataarray((nx, nx))

    def time(self, nx):
        return self.func(self.agg)

    def run(self):
        """Run every time_* method over params; yield (name, nx, secs)."""
        for nx in self.params[0]:
            try:
                self.setup(nx)
            except NotImplementedError:
                continue
            for name in dir(self):
                if not name.startswith("time_"):
                    continue
                fn = getattr(self, name)
                try:
                    out = fn(nx)
                    sync(out)  # compile + warm
                    best = float("inf")
                    for _ in range(self.repeat):
                        t0 = time.perf_counter()
                        out = fn(nx)
                        sync(out)
                        best = min(best, time.perf_counter() - t0)
                    yield name, nx, best
                except Exception as e:
                    yield name, nx, e
