"""On-chip parity + timing for the in-kernel column-seam focal kernel."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import gaussian_bump, timed  # noqa: E402
from xrspatial_tpu.kernels.pallas_window2 import focal_stats_tiled  # noqa: E402
from xrspatial_tpu.kernels.window import window_stats  # noqa: E402

STATS = ("mean", "max", "min", "std")


def offsets_circle(r):
    out = []
    for dy in range(-int(r), int(r) + 1):
        for dx in range(-int(r), int(r) + 1):
            if dy * dy + dx * dx <= r * r:
                out.append((dy, dx))
    return tuple(out)


def check(h, w, r):
    offs = offsets_circle(r)
    data = gaussian_bump(h, w)
    data = data.at[h // 3, : w // 2].set(jnp.nan)
    a = np.asarray(focal_stats_tiled(data, offs, STATS))
    bd = window_stats(data, offs, STATS)
    b = np.stack([np.asarray(bd[s]) for s in STATS])
    nan_ok = (np.isnan(a) == np.isnan(b)).all()
    m = ~np.isnan(a) & ~np.isnan(b)
    md = np.max(np.abs(a[m] - b[m])) if m.any() else 0.0
    print(f"  {h}x{w} r={r}: nan_ok={nan_ok} maxdiff={md:.2e}", flush=True)


def main():
    check(2048, 2048, 1.5)
    check(4608, 8320, 1.5)
    check(1000, 900, 2.5)

    N = 16384
    offs = offsets_circle(1.5)
    data = gaussian_bump(N, N)
    jax.block_until_ready(data)
    gb = 5 * N * N * 4 / 1e9
    t = timed(lambda: focal_stats_tiled(data, offs, STATS)[0],
              reps=12, burst=6)
    print(f"focal_stats(4) 16k^2: {t*1e3:.2f} ms ({gb/t:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
