"""Per-phase timing of the Pallas JFA at 4096^2 (C=2, metric 0).

Current-API version (xs/ys ride as 1-D -> (8, wp)/(hp, 128) strips).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from bench import timed  # noqa: E402
from xrspatial_tpu.kernels import pallas_jfa as pj  # noqa: E402

N = 4096
T = pj.T


def main():
    rng = np.random.default_rng(0)
    h = w = N
    hp = wp = N + 2 * T
    mask = np.zeros((h, w), bool)
    ys_i = rng.integers(0, h, 256)
    xs_i = rng.integers(0, w, 256)
    mask[ys_i, xs_i] = True
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))
    inf = jnp.float32(jnp.inf)
    m = jnp.asarray(mask)
    tx_w = jnp.where(m, px, inf)
    ty_w = jnp.where(m, py, inf)
    pads = ((T, T + hp - h - T), (T, T + wp - w - T))
    pads = ((T, hp - h - T + T), (T, wp - w - T + T))
    state = [jnp.pad(tx_w, ((T, T), (T, T)), constant_values=inf),
             jnp.pad(ty_w, ((T, T), (T, T)), constant_values=inf)]
    xsp = jnp.pad(xs, (T, T), mode="edge")
    ysp = jnp.pad(ys, (T, T), mode="edge")
    xs2 = jnp.broadcast_to(xsp[None, :], (8, wp))
    ys2 = jnp.broadcast_to(ysp[:, None], (hp, 128))
    jax.block_until_ready(state)

    one_tile = lambda mm: pj._large_round(mm, state, xs2, ys2, 2, 0)  # noqa: E731
    t = timed(lambda: one_tile(4)[0], reps=10, burst=5)
    print(f"large TILE-JUMP round (m=4): {t*1e3:.2f} ms "
          f"({1.699/t:.0f} GB/s of 9r+1w)", flush=True)

    ms = [8, 4, 2, 1]

    def big_scan():
        def body(st, mm):
            return tuple(pj._large_round(mm, list(st), xs2, ys2,
                                         2, 0)), None
        st, _ = jax.lax.scan(body, tuple(state),
                             jnp.asarray(ms, jnp.int32))
        return st[0]
    t = timed(big_scan, reps=8, burst=4)
    print(f"large scan x4 (tile-jump): {t*1e3:.2f} ms", flush=True)

    for g in [(128, 64, 32, 16, 8, 4, 2, 1), (2, 1)]:
        t = timed(lambda g=g: pj._multi_round_small(
            state, xs2, ys2, g, 2, 0)[0], reps=8, burst=4)
        print(f"small group {g}: {t*1e3:.2f} ms", flush=True)

    # epilogue: crop + exact key + finalize
    @jax.jit
    def epi(st):
        tx = st[0][T:T + h, T:T + w]
        ty = st[1][T:T + h, T:T + w]
        best = pj._key_exact(px, tx, py, ty, 0)
        return jnp.sqrt(best)
    t = timed(lambda: epi(state), reps=10, burst=5)
    print(f"epilogue (crop+key+sqrt): {t*1e3:.2f} ms", flush=True)

    # full jump_flood + API
    from xrspatial_tpu.proximity import proximity
    from xrspatial_tpu.xrlib import DataArray
    tgt = DataArray(m.astype(jnp.float32), dims=("y", "x"))
    tgt["y"] = np.arange(h, dtype=float)[::-1]
    tgt["x"] = np.arange(w, dtype=float)
    t = timed(lambda: proximity(tgt).data, reps=8, burst=4)
    print(f"proximity API end-to-end: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
