"""Validate + time the exact Manhattan scan transform on real TPU.

Compares kernels/jfa.py::manhattan_transform (via jump_flood dispatch)
against the metric-general JFA on-chip, and burst-times 4096^2/8192^2.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from xrspatial_tpu.kernels import jfa


def make_case(n, n_targets, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((n, n), np.float32)
    ys = rng.integers(0, n, n_targets)
    xs = rng.integers(0, n, n_targets)
    img[ys, xs] = rng.integers(1, 10, n_targets).astype(np.float32)
    return img


def fetch(x):
    return float(jnp.asarray(x).ravel()[0])


def check(n):
    img = jnp.asarray(make_case(n, max(8, n // 16)))
    xc = jnp.arange(n, dtype=jnp.float32)
    yc = jnp.arange(n, dtype=jnp.float32)[::-1]  # descending y, raster-style
    mask = img != 0

    t0 = time.time()
    scan = jfa.jump_flood(mask, xc, yc, jfa.MANHATTAN, values=img)
    d_scan = np.asarray(scan[0])
    v_scan = np.asarray(scan[3])
    t1 = time.time()
    print(f"n={n} scan path done {t1 - t0:.1f}s", flush=True)

    strides = tuple(int(k) for k in jfa._stride_schedule(n))
    tx0 = jnp.where(mask, xc[None, :], jnp.inf)
    ty0 = jnp.where(mask, yc[:, None], jnp.inf)
    tval0 = jnp.where(mask, img, 0.0)
    ref = jfa._jfa_rounds(tx0, ty0, tval0, xc, yc, strides, jfa.MANHATTAN,
                          (n, n))
    d_ref = np.asarray(ref[3])
    v_ref = np.asarray(ref[2])
    print(f"n={n} jfa ref done {time.time() - t1:.1f}s", flush=True)

    dmax = float(np.nanmax(np.abs(d_scan - d_ref)))
    # allocation values may differ only where distances tie for 2 targets
    neq = v_scan != v_ref
    print(f"n={n} dist_maxerr={dmax:.3e} alloc_mismatch={int(neq.sum())}",
          flush=True)
    return dmax


def bench(n, burst=4):
    img = jnp.asarray(make_case(n, max(8, n // 16)))
    xc = jnp.arange(n, dtype=jnp.float32)
    yc = jnp.arange(n, dtype=jnp.float32)[::-1]
    mask = jnp.asarray(img != 0)

    def dist_only(m):
        return jfa.jump_flood(m, xc, yc, jfa.MANHATTAN, values=None,
                              need_coords=False)[0]

    out = dist_only(mask)
    fetch(out[:1, :1])  # warm + barrier
    t0 = time.time()
    for _ in range(burst):
        out = dist_only(mask)
    fetch(out[:1, :1])
    dt = (time.time() - t0) / burst
    print(f"n={n} manhattan scan proximity: {dt * 1e3:.2f} ms "
          f"({n * n / dt / 1e6:.0f} Mpix/s)", flush=True)


if __name__ == "__main__":
    for n in (512, 1024, 2048):
        check(n)
    bench(4096)
    bench(8192)
