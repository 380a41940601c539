"""Measure XDraw-vs-exact viewshed agreement at scale (VERDICT r1 #4).

Runs the O(N^2) pairwise GRASS predicate and the octant-scan XDraw on
the same seeded terrains and reports cell agreement + vertical-angle
error on cells both deem visible.  CPU-forced (the pairwise oracle is
float64; CPU is the honest oracle platform and avoids tying up the TPU
tunnel for minutes).

Usage: python tools/measure_viewshed_agreement.py [sizes...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VS_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


from terrain_util import make_terrain  # noqa: F401,E402

print("backend:", jax.default_backend(), flush=True)


def main():
    from xrspatial_tpu.kernels.viewshed import viewshed_grid, viewshed_grid_los
    from xrspatial_tpu.utils import x64
    seeds = [int(s) for s in os.environ.get("VS_SEEDS", "3,7").split(",")]
    sizes = [int(s) for s in (sys.argv[1:] or ["512"])]
    for n in sizes:
        aggs = []
        for seed in seeds:
            data = make_terrain(n, seed)
            vr, vc = n // 3, (2 * n) // 3
            t0 = time.time()
            with x64():
                exact = np.asarray(viewshed_grid(
                    data, vr, vc, 10.0, 0.0, 1.0, -1.0))
            t_exact = time.time() - t0
            t0 = time.time()
            los = np.asarray(viewshed_grid_los(
                data, vr, vc, 10.0, 0.0, 1.0, -1.0))
            t_los = time.time() - t0
            vis_e = exact > -1
            vis_l = los > -1
            agree = float((vis_e == vis_l).mean())
            both = vis_e & vis_l
            ang_err = float(np.abs(exact[both] - los[both]).max())
            aggs.append(agree)
            print(f"n={n} seed={seed} agreement={agree:.6f} "
                  f"angle_maxerr={ang_err:.2e} "
                  f"(exact {t_exact:.1f}s, xdraw {t_los:.1f}s)", flush=True)
        print(f"n={n} MIN agreement={min(aggs):.6f}", flush=True)


if __name__ == "__main__":
    main()
