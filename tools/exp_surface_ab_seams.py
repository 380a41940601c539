"""One-session A/B: surface_tiled with in-kernel column seams (worktree)
vs the committed DUS version (git HEAD copy loaded side-by-side)."""
import importlib.util
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import gaussian_bump, timed  # noqa: E402


def load_old():
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         "HEAD:xrspatial_tpu/kernels/pallas_surface2.py"],
        capture_output=True, text=True, check=True).stdout
    path = "/tmp/old_pallas_surface2.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("old_ps2", path)
    mod = importlib.util.module_from_spec(spec)
    # satisfy its relative imports by aliasing the package modules
    import xrspatial_tpu.kernels.pallas_surface  # noqa: F401
    import xrspatial_tpu.kernels.surface  # noqa: F401
    src = src.replace("from .pallas_surface import",
                      "from xrspatial_tpu.kernels.pallas_surface import")
    src = src.replace("from .surface import",
                      "from xrspatial_tpu.kernels.surface import")
    with open(path, "w") as f:
        f.write(src)
    spec.loader.exec_module(mod)
    return mod


def main():
    old = load_old()
    from xrspatial_tpu.kernels.pallas_surface2 import surface_tiled as new

    N = 16384
    one = jnp.float32(1.0)
    az = jnp.float32(225.0)
    alt = jnp.float32(25.0)
    data = gaussian_bump(N, N)
    jax.block_until_ready(data)
    gb1 = 2 * N * N * 4 / 1e9
    gb2 = 3 * N * N * 4 / 1e9

    legs = {
        "old slope": (lambda: old.surface_tiled(
            data, one, one, az, alt, ("slope",))[0], gb1),
        "new slope": (lambda: new(
            data, one, one, az, alt, ("slope",))[0], gb1),
        "old pair": (lambda: old.surface_tiled(
            data, one, one, az, alt, ("slope", "hillshade"))[0], gb2),
        "new pair": (lambda: new(
            data, one, one, az, alt, ("slope", "hillshade"))[0], gb2),
    }
    for fn, _ in legs.values():
        np.asarray(fn()[0, 5])  # compile + sync
    for rep in range(2):
        for name, (fn, gb) in legs.items():
            t = timed(fn, reps=16, burst=8)
            print(f"[{rep}] {name}: {t*1e3:.2f} ms ({gb/t:.0f} GB/s)",
                  flush=True)


if __name__ == "__main__":
    main()
