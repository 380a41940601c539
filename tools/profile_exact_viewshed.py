"""Phase-level profile of the exact bucket-LOS viewshed on TPU.

Times: host attrs, bucket plan, table build+upload, the f32 screen
scan (device), the ambiguous-target f64 re-eval, epilogue.  Used to
find where the 273 s at 4096^2 actually goes.

Usage: python tools/profile_exact_viewshed.py 1024 [2048]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from measure_viewshed_agreement import make_terrain


def profile(n, chunk=512):
    from xrspatial_tpu.kernels.viewshed import cell_attrs_host
    from xrspatial_tpu.kernels import viewshed_exact as VE
    from xrspatial_tpu.utils import x64

    data = make_terrain(n, 7).astype(np.float64)
    vp = (n // 3, (2 * n) // 3)

    t0 = time.perf_counter()
    at = cell_attrs_host(data, vp[0], vp[1], 10.0, 0.0, 1.0, -1.0)
    t_attrs = time.perf_counter() - t0

    t0 = time.perf_counter()
    tperm, glob_idx, tiers, A, C = VE._bucket_plan(at, vp[0], vp[1], chunk)
    t_plan = time.perf_counter() - t0
    Es = [E for _, _, E in tiers]
    print(f"n={n} C={C} A={A} glob={glob_idx.size} tierEs={Es} "
          f"sumE={sum(Es)+VE._round_up(glob_idx.size,1024)}", flush=True)

    t0 = time.perf_counter()
    tgt32 = {
        "a1": jnp.asarray(at["a1"][tperm].astype(np.float32)),
        "key": jnp.asarray(at["key"][tperm].astype(np.float32)),
        "idx": jnp.asarray(tperm.astype(np.int32)),
    }
    glob, tier_tabs, tier_los = VE._build_tables(
        at, glob_idx, tiers, VE._blocker_table_screen)
    float(tgt32["a1"][0])  # sync uploads
    t_tables = time.perf_counter() - t0

    # screen scan: cold then warm
    t0 = time.perf_counter()
    hi, lo = VE._eval_buckets_screen_run(tgt32, glob, tier_tabs,
                                         tier_los, A, C)
    hi_np = np.asarray(hi)
    lo_np = np.asarray(lo)
    t_screen_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    hi, lo = VE._eval_buckets_screen_run(tgt32, glob, tier_tabs,
                                         tier_los, A, C)
    float(hi[0, 0]); float(lo[0, 0])
    np.asarray(hi)
    t_screen_warm = time.perf_counter() - t0

    # classify
    t0 = time.perf_counter()
    hi64 = hi_np.ravel().astype(np.float64)
    lo64 = lo_np.ravel().astype(np.float64)
    gt32 = at["grad_t"][tperm].astype(np.float32).astype(np.float64)
    amb = ~((hi64 <= gt32 - 1e-6) | (lo64 > gt32 + 1e-6))
    amb_idx = np.unique(tperm[amb])
    t_classify = time.perf_counter() - t0
    print(f"n={n} ambiguous={amb_idx.size} "
          f"({amb_idx.size / tperm.size * 100:.3f}%)", flush=True)

    # f64 re-eval of ambiguous
    t_reeval = 0.0
    if amb_idx.size:
        t0 = time.perf_counter()
        L = 1 << (max(int(amb_idx.size), 128) - 1).bit_length()
        sub = np.pad(amb_idx, (0, L - amb_idx.size), mode="edge")
        tperm_a, glob_i, tiers_a, A_a, C_a = VE._bucket_plan(
            at, vp[0], vp[1], min(chunk, 128), targets=sub)
        with x64():
            VE._run_buckets_f64(at, tperm_a, glob_i, tiers_a, A_a, C_a)
        t_reeval = time.perf_counter() - t0

    print(f"n={n}: attrs={t_attrs:.2f}s plan={t_plan:.2f}s "
          f"tables={t_tables:.2f}s screen_cold={t_screen_cold:.2f}s "
          f"screen_warm={t_screen_warm:.2f}s classify={t_classify:.2f}s "
          f"reeval={t_reeval:.2f}s", flush=True)


if __name__ == "__main__":
    for s in (sys.argv[1:] or ["1024"]):
        profile(int(s), chunk=int(os.environ.get("VS_CHUNK", "512")))
