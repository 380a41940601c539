"""Tile-shape sweep for the tiled surface/focal kernels, one session.
Usage: python tools/exp_tile_shapes.py [N]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import gaussian_bump, timed


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    from xrspatial_tpu.convolution import circle_kernel
    from xrspatial_tpu.kernels.pallas_surface2 import surface_tiled
    from xrspatial_tpu.kernels.pallas_window2 import focal_stats_tiled
    from xrspatial_tpu.kernels.window import kernel_offsets

    data = gaussian_bump(n, n)
    jax.block_until_ready(data)
    offs = kernel_offsets(circle_kernel(1, 1, 1.5))
    sts = ("mean", "max", "min", "std")
    mpix = n * n / 1e6
    red = jax.jit(lambda a: jnp.sum(a[..., 0, :]))

    for th, tw in [(256, 2048), (256, 4096), (512, 2048), (128, 4096)]:
        t = timed(lambda: red(surface_tiled(
            data, jnp.float32(1), jnp.float32(1), jnp.float32(225),
            jnp.float32(25), ("slope",), th, tw)[0]), reps=24, burst=8)
        print(f"slope {th}x{tw}: {t*1e3:.2f} ms ({mpix/t:.0f} Mpix/s)",
              flush=True)
    for th, tw in [(256, 2048), (256, 4096), (512, 2048), (128, 2048)]:
        t = timed(lambda: red(focal_stats_tiled(data, offs, sts, th, tw)),
                  reps=12, burst=6)
        print(f"focal {th}x{tw}: {t*1e3:.2f} ms ({mpix/t:.0f} Mpix/s)",
              flush=True)


if __name__ == "__main__":
    main()
