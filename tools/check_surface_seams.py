"""On-chip parity + timing for the in-kernel column-seam surface kernel."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import gaussian_bump, timed  # noqa: E402
from xrspatial_tpu.kernels.pallas_surface2 import surface_tiled  # noqa: E402
from xrspatial_tpu.kernels.surface import surface_multi  # noqa: E402

one = jnp.float32(1.0)
az = jnp.float32(225.0)
alt = jnp.float32(25.0)
WHICH = ("slope", "hillshade", "aspect", "curvature")


def check(h, w):
    data = gaussian_bump(h, w)
    # sprinkle NaNs to exercise propagation
    data = data.at[h // 3, : w // 2].set(jnp.nan)
    a = surface_tiled(data, one, one, az, alt, WHICH)
    b = surface_multi(data, one, one, az, alt, WHICH)
    for name, ai in zip(WHICH, a):
        ai, bi = np.asarray(ai), np.asarray(b[name])
        nan_ok = (np.isnan(ai) == np.isnan(bi)).all()
        m = ~np.isnan(ai) & ~np.isnan(bi)
        md = np.max(np.abs(ai[m] - bi[m])) if m.any() else 0.0
        print(f"  {h}x{w} {name}: nan_ok={nan_ok} maxdiff={md:.2e}",
              flush=True)


def main():
    check(2048, 2048)
    check(4608, 8320)   # ragged vs 256/4096 tiles
    check(1000, 900)    # ragged small

    N = 16384
    data = gaussian_bump(N, N)
    jax.block_until_ready(data)
    gb = 2 * N * N * 4 / 1e9
    t = timed(lambda: surface_tiled(data, one, one, az, alt, ("slope",))[0],
              reps=20, burst=10)
    print(f"slope 16k^2: {t*1e3:.2f} ms ({gb/t:.0f} GB/s)", flush=True)
    t = timed(lambda: surface_tiled(data, one, one, az, alt,
                                    ("slope", "hillshade"))[0],
              reps=16, burst=8)
    print(f"slope+hillshade 16k^2: {t*1e3:.2f} ms "
          f"({3*N*N*4/1e9/t:.0f} GB/s of 1r+2w)", flush=True)


if __name__ == "__main__":
    main()
