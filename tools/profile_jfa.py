"""Per-phase timing of the Pallas JFA at 4096^2 (C=2, metric 0)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from xrspatial_tpu.kernels import pallas_jfa as pj

N = 4096
T = pj.T


def timeit(label, fn, reps=5):
    s = float(jnp.sum(fn()[0]))  # compile+warm
    t0 = time.time()
    for _ in range(reps):
        s = float(jnp.sum(fn()[0]))
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms  (sum={s:.3e})", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    hp = wp = N + 2 * T
    img = np.full((hp, wp), np.inf, np.float32)
    ys = rng.integers(T, T + N, 256)
    xs = rng.integers(T, T + N, 256)
    img[ys, xs] = xs.astype(np.float32)
    tx = jnp.asarray(img)
    ty = jnp.asarray(np.where(np.isfinite(img),
                              ys.mean().astype(np.float32), np.inf))
    px = jnp.arange(wp, dtype=jnp.float32).reshape(1, -1)
    py = jnp.arange(hp, dtype=jnp.float32).reshape(-1, 1)
    state = [tx, ty]

    # one large round
    timeit("large m=4 x1", lambda: pj._large_round(4, state, px, py, 2, 0))

    # the large-round scan as used in jfa_rounds_pallas
    ms = [k // pj.T for k in (4096, 2048, 1024, 512) if k >= pj.T]

    def big_scan():
        def body(st, m):
            return tuple(pj._large_round(m, list(st), px, py, 2, 0)), None
        st, _ = jax.lax.scan(body, tuple(state),
                             jnp.asarray(ms, jnp.int32))
        return list(st)
    timeit(f"large scan x{len(ms)}", big_scan)

    # small groups (mirror the greedy split for the 4096 schedule)
    for g in [(256,), (128, 64, 32), (16, 8, 4, 2, 1, 2, 1)]:
        if g[0] >= pj.T:
            continue
        timeit(f"small {g}", lambda g=g: pj._multi_round_small(
            state, px, py, g, 2, 0))


if __name__ == "__main__":
    main()
