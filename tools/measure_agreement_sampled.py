"""XDraw-vs-exact agreement at XDraw-default sizes (VERDICT r4 task 2).

At 8192^2 and 16384^2 the full exact grid is too expensive to serve as
an oracle, so agreement is measured on a RANDOM SAMPLE of cells whose
exact visibility comes from the f64 bucket predicate restricted to the
sampled targets (`_run_buckets_f64_gathered` — bit-identical to the
full oracle for its targets, pinned by
tests/test_viewshed.py::test_f64_reeval_paths_bitwise_equal).  The
XDraw field itself is computed at full size on the default platform.

Usage: python tools/measure_agreement_sampled.py [sizes...]
Env: VS_SAMPLES (default 4096), VS_SEEDS (default "3,7").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU-forced unless VS_TPU=1: agreement is an algorithmic property
# (same XLA f32 program either way) and the CPU run leaves the tunnel
# free.  NB the JAX_PLATFORMS env var is overridden by sitecustomize
# at interpreter start — only this in-process update works.
if os.environ.get("VS_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from terrain_util import make_terrain

print("backend:", jax.default_backend(), flush=True)


def sampled_exact_visibility(data, vr, vc, obs, tgt_elev, ew, ns,
                             sample):
    """Exact (GRASS-predicate, f64) visibility of `sample` flat cells."""
    from xrspatial_tpu.kernels.viewshed import (cell_attrs_host,
                                                cell_attrs_subset_fn)
    from xrspatial_tpu.kernels.viewshed_exact import (
        _bucket_plan, _run_buckets_f64_gathered)
    from xrspatial_tpu.utils import x64

    data64 = np.asarray(data, dtype=np.float64)
    at = cell_attrs_host(data64, vr, vc, obs, tgt_elev, ew, ns)
    L = 1 << (max(int(sample.size), 128) - 1).bit_length()
    sub = np.pad(np.sort(sample), (0, L - sample.size), mode="edge")
    tperm, glob_idx, tiers, A, C = _bucket_plan(at, vr, vc, 128,
                                                targets=sub)
    attrs_of = cell_attrs_subset_fn(data64, vr, vc, obs, tgt_elev,
                                    ew, ns)
    with x64():
        vis = _run_buckets_f64_gathered(attrs_of, tperm, glob_idx,
                                        tiers, A, C)
    out = np.zeros(data64.size, dtype=bool)
    out[tperm] = vis
    return out[sample]


def main():
    from xrspatial_tpu.kernels.viewshed import viewshed_grid_los

    m = int(os.environ.get("VS_SAMPLES", "4096"))
    seeds = [int(s) for s in os.environ.get("VS_SEEDS", "3,7").split(",")]
    sizes = [int(s) for s in (sys.argv[1:] or ["8192"])]
    for n in sizes:
        aggs = []
        for seed in seeds:
            data = make_terrain(n, seed)
            vr, vc = n // 3, (2 * n) // 3
            t0 = time.time()
            los = np.asarray(viewshed_grid_los(
                data, vr, vc, 10.0, 0.0, 1.0, -1.0))
            t_los = time.time() - t0
            rng = np.random.default_rng(seed)
            sample = rng.choice(n * n, size=m, replace=False)
            sample = sample[sample != vr * n + vc]
            t0 = time.time()
            vis_e = sampled_exact_visibility(data, vr, vc, 10.0, 0.0,
                                             1.0, -1.0, sample)
            t_exact = time.time() - t0
            vis_l = los.ravel()[sample] > -1
            agree = float((vis_e == vis_l).mean())
            aggs.append(agree)
            print(f"n={n} seed={seed} sampled({sample.size}) "
                  f"agreement={agree:.6f} "
                  f"(xdraw {t_los:.1f}s, exact-sample {t_exact:.1f}s)",
                  flush=True)
        print(f"n={n} MIN sampled agreement={min(aggs):.6f}", flush=True)


if __name__ == "__main__":
    main()
