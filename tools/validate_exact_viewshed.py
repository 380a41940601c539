"""On-chip validation of the exact bucket-LOS viewshed (VERDICT r2 #1).

Asserts bit-level visibility agreement between the angle-sorted bucket
evaluation (kernels/viewshed_exact.py) and the pairwise GRASS-predicate
oracle on seeded fBm terrains:
- FULL-grid pairwise comparison at sizes where the O(N^2) oracle is
  tractable (<= 512^2);
- SAMPLED-target pairwise comparison at larger sizes (each sampled
  target independently verified against ALL N cells — the same
  predicate, so agreement must be bitwise).

Also times the exact path and XDraw at each size (the exact=True cost
quantification VERDICT r2 #8 asks for; results recorded in BENCH_NOTES).

Usage:
  python tools/validate_exact_viewshed.py 128 256          # CPU quick
  VS_TPU=1 python tools/validate_exact_viewshed.py 512 1024 2048
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

import jax.numpy as jnp
import numpy as np

from terrain_util import make_terrain

print("backend:", jax.default_backend(), flush=True)

# full pairwise oracle above this size is intractable; sample targets
FULL_ORACLE_MAX = 512 * 512
N_SAMPLED = 4096
# the f64-emulated sampled oracle OOMs HBM beyond ~1024^2 with 4096
# targets; shrink the sample there (still a strong bitwise check)
N_SAMPLED_BIG = 1024


def _sampled_oracle(at, sample_idx):
    """Pairwise blocked-max for the sampled targets against ALL cells,
    chunked over blockers with a running max (device, f64)."""
    from functools import partial

    from xrspatial_tpu.kernels.viewshed import _interp_blocked_max
    from xrspatial_tpu.utils import x64

    n = at["a1"].size
    bchunk = 1 << 14
    nb = -(-n // bchunk)
    npad = nb * bchunk

    def pad(x, cv=0.0):
        return np.pad(x, (0, npad - n), constant_values=cv)

    with x64():
        planes = {f: jnp.asarray(pad(at[f]).reshape(nb, bchunk))
                  for f in ("key", "a0", "a1", "a2", "g0", "g1", "g2")}
        valid = jnp.asarray(pad(at["valid_b"], False).reshape(nb, bchunk))
        bidx = jnp.asarray(pad(np.arange(n, dtype=np.int64), -1)
                           .reshape(nb, bchunk))
        al = jnp.asarray(at["a1"][sample_idx])[:, None]
        kt = jnp.asarray(at["key"][sample_idx])[:, None]
        it = jnp.asarray(sample_idx.astype(np.int64))[:, None]

        @jax.jit
        def run(al, kt, it, planes, valid, bidx, gts):
            # plane arrays ride as ARGUMENTS: a closed-over device array
            # becomes a compile-payload constant, and at 2048^2 the f64
            # planes (235 MB) overflow the remote-compile request
            # (HTTP 413)
            def body(carry, inp):
                ks, a0s, a1s, a2s, g0s, g1s, g2s, vs, ids = inp
                m = _interp_blocked_max(
                    al, kt, it, ks[None], a0s[None], a1s[None], a2s[None],
                    g0s[None], g1s[None], g2s[None], vs[None], ids[None])
                return jnp.maximum(carry, m), None

            init = jnp.full((al.shape[0],), -jnp.inf, jnp.float64)
            blocked, _ = jax.lax.scan(
                body, init,
                (planes["key"], planes["a0"], planes["a1"], planes["a2"],
                 planes["g0"], planes["g1"], planes["g2"], valid, bidx))
            return blocked <= gts

        return np.asarray(run(al, kt, it, planes, valid, bidx,
                              jnp.asarray(at["grad_t"][sample_idx])))


def main():
    from xrspatial_tpu.kernels.viewshed import (cell_attrs_host,
                                                viewshed_grid,
                                                viewshed_grid_los)
    from xrspatial_tpu.kernels.viewshed_exact import viewshed_grid_exact
    from xrspatial_tpu.utils import x64

    sizes = [int(s) for s in (sys.argv[1:] or ["256"])]
    rngseed = int(os.environ.get("VS_SEED", "7"))
    ok = True
    for n in sizes:
        data = make_terrain(n, rngseed).astype(np.float64)
        vp = (n // 3, (2 * n) // 3)
        t0 = time.perf_counter()
        ex = np.asarray(viewshed_grid_exact(data, vp[0], vp[1],
                                            10.0, 0.0, 1.0, -1.0))
        t_ex = time.perf_counter() - t0
        if os.environ.get("VS_WARM") == "1":
            # warm re-run (compile + plan cached): the steady-state cost
            t0 = time.perf_counter()
            np.asarray(viewshed_grid_exact(data, vp[0], vp[1],
                                           10.0, 0.0, 1.0, -1.0))
            print(f"n={n}: exact warm {time.perf_counter()-t0:.2f}s "
                  f"(cold {t_ex:.2f}s)", flush=True)

        t0 = time.perf_counter()
        los = viewshed_grid_los(data, vp[0], vp[1], 10.0, 0.0, 1.0, -1.0)
        los = np.asarray(los)
        t_los = time.perf_counter() - t0

        if n * n <= FULL_ORACLE_MAX:
            t0 = time.perf_counter()
            with x64():
                pw = np.asarray(viewshed_grid(data, vp[0], vp[1],
                                              10.0, 0.0, 1.0, -1.0))
            t_pw = time.perf_counter() - t0
            bit = np.array_equal(pw, ex)
            ok &= bit
            print(f"n={n}: FULL oracle bitwise={bit} "
                  f"exact={t_ex:.2f}s pairwise={t_pw:.2f}s "
                  f"xdraw={t_los:.3f}s "
                  f"xdraw_agree={((pw > -1) == (los > -1)).mean():.4f}",
                  flush=True)
        else:
            at = cell_attrs_host(data, vp[0], vp[1], 10.0, 0.0, 1.0, -1.0)
            rng = np.random.default_rng(99)
            ns = N_SAMPLED if n * n <= 1024 * 1024 else N_SAMPLED_BIG
            sample = np.sort(rng.choice(n * n, size=ns,
                                        replace=False))
            t0 = time.perf_counter()
            vis_s = _sampled_oracle(at, sample)
            t_pw = time.perf_counter() - t0
            bit = np.array_equal(vis_s, ex.ravel()[sample] > -1)
            ok &= bit
            print(f"n={n}: SAMPLED({ns}) oracle bitwise={bit} "
                  f"exact={t_ex:.2f}s sampled_oracle={t_pw:.2f}s "
                  f"xdraw={t_los:.3f}s "
                  f"xdraw_agree={((ex > -1) == (los > -1)).mean():.4f}",
                  flush=True)
    print("VALIDATION", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
