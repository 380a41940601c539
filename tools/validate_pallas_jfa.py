"""Validate the Pallas JFA rounds vs the XLA scan path on real TPU.

Checks exact agreement of distances/allocation at several sizes and
times 4096^2 proximity both ways (VERDICT r1 #2: target <=150 ms).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def make_case(n, n_targets, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((n, n), np.float32)
    ys = rng.integers(0, n, n_targets)
    xs = rng.integers(0, n, n_targets)
    img[ys, xs] = rng.integers(1, 10, n_targets).astype(np.float32)
    return img


def run(img_d, xc, yc, metric):
    """Device outputs of jump_flood (no host fetch)."""
    from xrspatial_tpu.kernels import jfa
    mask = img_d != 0
    return jfa.jump_flood(mask, xc, yc, metric, values=img_d)


def check(n, metric):
    img = jnp.asarray(make_case(n, max(8, n // 16)))
    if metric == 1:  # great circle needs genuine lon/lat degrees
        xc = jnp.asarray(np.linspace(-170.0, 170.0, n, dtype=np.float32))
        yc = jnp.asarray(np.linspace(75.0, -75.0, n, dtype=np.float32))
    else:
        xc = jnp.arange(n, dtype=jnp.float32)
        yc = jnp.arange(n, dtype=jnp.float32)
    t0 = time.time()
    os.environ["XRSPATIAL_NO_PALLAS"] = "1"
    ref = [np.asarray(a) for a in run(img, xc, yc, metric)]
    t1 = time.time()
    print(f"n={n} metric={metric} xla done {t1-t0:.1f}s", flush=True)
    os.environ["XRSPATIAL_NO_PALLAS"] = "0"
    got = [np.asarray(a) for a in run(img, xc, yc, metric)]
    print(f"n={n} metric={metric} pallas done {time.time()-t1:.1f}s",
          flush=True)
    dmax = float(np.nanmax(np.abs(got[0] - ref[0])))
    alloc_neq = int((got[3] != ref[3]).sum())
    print(f"n={n} metric={metric} dist_maxerr={dmax:.3e} "
          f"alloc_mismatch={alloc_neq}", flush=True)


def timing(n):
    # scalar-fetch barrier; full-array fetch would dominate the tunnel
    img = jnp.asarray(make_case(n, max(16, n // 16)))
    xc = jnp.arange(n, dtype=jnp.float32)
    yc = jnp.arange(n, dtype=jnp.float32)
    for tag, env in [("pallas", "0"), ("xla", "1")]:
        os.environ["XRSPATIAL_NO_PALLAS"] = env
        t0 = time.time()
        s = float(jnp.sum(run(img, xc, yc, 0)[0]))
        print(f"{tag} first(incl compile): {time.time()-t0:.2f}s "
              f"sum={s:.4e}", flush=True)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            s = float(jnp.sum(run(img, xc, yc, 0)[0]))
        dt = (time.time() - t0) / reps
        print(f"{tag} {n}^2 proximity: {dt*1e3:.1f} ms "
              f"({n*n/dt/1e6:.0f} Mpix/s)", flush=True)


def main():
    # usage: validate_pallas_jfa.py check N METRIC | time N
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    if mode == "time":
        timing(n)
    else:
        metric = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        check(n, metric)


if __name__ == "__main__":
    main()
