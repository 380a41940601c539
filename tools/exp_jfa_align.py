"""JFA small-group alignment probe + large-round tile-size sweep.

Hypothesis: the fused small-group kernel's window slices sit at
lane offsets k, 2k (k = 64, 32, ...) — misaligned for every k < 128 —
forcing per-operand relayouts; a single ks=(128,) group is fully
aligned and should run near the tile-jump rounds' byte rate if
alignment is the bottleneck.
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
    mask[rng.integers(0, h, 256), rng.integers(0, w, 256)] = True
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))
    inf = jnp.float32(jnp.inf)
    m = jnp.asarray(mask)
    state = [jnp.pad(jnp.where(m, px, inf), ((T, T), (T, T)),
                     constant_values=inf),
             jnp.pad(jnp.where(m, py, inf), ((T, T), (T, T)),
                     constant_values=inf)]
    xs2 = jnp.broadcast_to(jnp.pad(xs, (T, T), mode="edge")[None, :],
                           (8, wp))
    ys2 = jnp.broadcast_to(jnp.pad(ys, (T, T), mode="edge")[:, None],
                           (hp, 128))
    jax.block_until_ready(state)

    for ks in [(128,), (64,), (64, 32), (64, 32, 16, 8, 4, 2, 1, 2, 1)]:
        t = timed(lambda ks=ks: pj._multi_round_small(
            state, xs2, ys2, ks, 2, 0)[0], reps=8, burst=4)
        print(f"small group {ks}: {t*1e3:.2f} ms", flush=True)

    for t_, mm in [(256, 8), (512, 4), (512, 2), (512, 1)]:
        tt = timed(lambda t_=t_, mm=mm: pj._large_round(
            mm, state, xs2, ys2, 2, 0, t=t_)[0], reps=10, burst=5)
        print(f"large t={t_} m={mm} (stride {t_*mm}): {tt*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
