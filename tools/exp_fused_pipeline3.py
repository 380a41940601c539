"""Round-3 A/B: single-pass fused headline kernel vs the 2-way split.

FINDINGS (v5e, 16k^2, one session, 2026-08-17): fused kernel 22.2 ms
(~315 GB/s of 1r+6w) vs split API 21.8 ms; sliced-window focal variant
26.5 ms; tile shapes 128-512 x 2048-4096 within noise or OOM (512-row
tiles ask 184-205 MB scoped VMEM, 67-89 MB of it register spill slots).
Focal-alone scaling probe: x1 4.89 ms 440 GB/s, x2 6.90 467, x4 11.51
466 — the single-op kernels are bandwidth-steady; the 7-output fusion
is what collapses throughput.  => split stays the default
(analytics._use_fused_pipeline), fused kernel is opt-in.
Usage: python tools/exp_fused_pipeline3.py [N]
"""
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
    from xrspatial_tpu.analytics import terrain_pipeline
    from xrspatial_tpu.convolution import circle_kernel
    from xrspatial_tpu.kernels.pallas_pipeline import pipeline_tiled
    from xrspatial_tpu.kernels.pallas_window2 import focal_stats_tiled
    from xrspatial_tpu.kernels.window import kernel_offsets
    from xrspatial_tpu.xrlib import DataArray

    data = gaussian_bump(n, n)
    jax.block_until_ready(data)
    agg = DataArray(data, dims=("y", "x"), name="dem",
                    attrs={"res": (1.0, 1.0)})
    offs = kernel_offsets(circle_kernel(1, 1, 1.5))
    sts = ("mean", "max", "min", "std")
    mpix = n * n / 1e6
    red = jax.jit(lambda a: jnp.sum(a[..., 0, :]))
    f32 = jnp.float32

    os.environ["XRSPATIAL_FUSED_PIPELINE"] = "1"  # fused is opt-in now

    def run_api():
        ds = terrain_pipeline(agg, surface=("slope", "hillshade"),
                              stats_funcs=sts)
        return (red(ds["dem-slope"].data) + red(ds["dem-hillshade"].data)
                + red(ds["focal_stats"].data))

    # correctness first, at 2048^2 (holding two 16k^2 result sets would
    # blow the ~14 GB HBM budget)
    import numpy as np
    small = DataArray(gaussian_bump(2048, 2048), dims=("y", "x"),
                      name="dem", attrs={"res": (1.0, 1.0)})
    ds_f = terrain_pipeline(small, surface=("slope", "hillshade"),
                            stats_funcs=sts)
    del os.environ["XRSPATIAL_FUSED_PIPELINE"]
    ds_s = terrain_pipeline(small, surface=("slope", "hillshade"),
                            stats_funcs=sts)
    os.environ["XRSPATIAL_FUSED_PIPELINE"] = "1"
    for v in ("dem-slope", "dem-hillshade", "focal_stats"):
        a = np.asarray(ds_f[v].data)
        b = np.asarray(ds_s[v].data)
        m = ~np.isnan(a)
        assert (m == ~np.isnan(b)).all(), v
        print(f"parity {v}: maxdiff {np.abs(a[m]-b[m]).max():.2e}",
              flush=True)
    del ds_f, ds_s, small

    t_f = timed(run_api, reps=12, burst=4)
    print(f"fused API: {t_f*1e3:.2f} ms ({mpix/t_f:.0f} Mpix/s)",
          flush=True)
    del os.environ["XRSPATIAL_FUSED_PIPELINE"]
    t_s = timed(run_api, reps=12, burst=4)
    print(f"split API: {t_s*1e3:.2f} ms ({mpix/t_s:.0f} Mpix/s)",
          flush=True)

    # tile-shape variants of the raw fused kernel
    for th, tw in [(256, 4096), (128, 4096), (256, 2048), (512, 4096)]:
        try:
            t = timed(lambda: red(pipeline_tiled(
                data, f32(1), f32(1), f32(225), f32(25), offs, sts,
                ("slope", "hillshade"), th, tw)[0]), reps=12, burst=4)
            print(f"fused kernel {th}x{tw}: {t*1e3:.2f} ms "
                  f"({mpix/t:.0f} Mpix/s)", flush=True)
        except Exception as e:
            print(f"fused kernel {th}x{tw}: {type(e).__name__}: {e}",
                  flush=True)

    # focal output-count scaling probe (is the focal kernel write-bound?)
    for ss in [("mean",), ("mean", "max"), sts]:
        t = timed(lambda: red(focal_stats_tiled(data, offs, ss)),
                  reps=12, burst=4)
        gb = (1 + len(ss)) * n * n * 4 / 1e9
        print(f"focal x{len(ss)}: {t*1e3:.2f} ms ({gb/t:.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
