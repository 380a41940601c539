"""Same-session cost decomposition of the exact-viewshed screen scan.

Q: is the warm screen time per-STEP overhead (A scan steps) or
per-WORK (n * sumE pair evals)?  Times the jitted screen over a
truncated number of buckets A' in {64, 256, 1024, full} at fixed C,
then sweeps C.  All timings warm, same process, scalar-fetch barrier.

Usage: python tools/exp_screen_cost.py 1024
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


def timeit(fn, reps=3):
    out = fn()
    jax.tree_util.tree_map(lambda a: float(np.asarray(a).ravel()[-1]), out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(
            lambda a: float(np.asarray(a).ravel()[-1]), out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main(n, chunk, Aps):
    from xrspatial_tpu.kernels.viewshed import cell_attrs_host
    from xrspatial_tpu.kernels import viewshed_exact as VE

    data = make_terrain(n, 7).astype(np.float64)
    vp = (n // 3, (2 * n) // 3)
    at = cell_attrs_host(data, vp[0], vp[1], 10.0, 0.0, 1.0, -1.0)

    for C in chunk:
        tperm, glob_idx, tiers, A, C_ = VE._bucket_plan(at, vp[0], vp[1], C)
        Es = [E for _, _, E in tiers]
        sumE = sum(Es) + VE._round_up(glob_idx.size, 1024)
        tgt32 = {
            "a1": jnp.asarray(at["a1"][tperm].astype(np.float32)),
            "key": jnp.asarray(at["key"][tperm].astype(np.float32)),
            "idx": jnp.asarray(tperm.astype(np.int32)),
        }
        glob, tier_tabs, tier_los = VE._build_tables(
            at, glob_idx, tiers, VE._blocker_table_screen)

        for Ap in Aps:
            if Ap > A:
                continue
            # truncate: same tables, fewer scan steps
            t = timeit(lambda: VE._eval_buckets_screen_run(
                tgt32, glob, tier_tabs,
                [l[:Ap] for l in tier_los], Ap, C_))
            pairs = Ap * C_ * sumE
            print(f"n={n} C={C_} A'={Ap}/{A} sumE={sumE}: {t:.3f}s "
                  f"({pairs/t/1e9:.2f} Gpair/s, "
                  f"{t/Ap*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chunks = [int(c) for c in sys.argv[2:]] or [512, 2048]
    main(n, chunks, [int(a) for a in os.environ.get("APS", "64,256").split(",")])
