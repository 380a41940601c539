"""JFA small-round group-split A/B — FINDINGS RECORD (v5e, 4096^2, one
session, 2026-08-17):

    1x9 (one fused 9-round kernel)   34.97 ms   (the round-2 design)
    2x  ((64,32,16,8),(4,2,1,2,1))   31.81 ms
    3x3                              27.51 ms
    9x1 (one round per kernel)       22.30 ms   <- shipped

Together with tools/exp_jfa_align.py (per-round cost inside a fused
group is ~3.7 ms regardless of window size or channel count, while a
complete fresh single-round sweep costs ~2.5 ms including all its HBM
reads), this kills the fused-group design: in-VMEM revisiting of the
composite costs MORE per round than streaming the state again.  A
fixed-shape pltpu.roll variant was also tried (tools/exp_jfa_fixed.py):
wins for 1 round (2.67 vs 5.12 ms) but loses badly at depth (9 rounds
91.7 ms — 18 rolls/round).  pallas_jfa.py now runs every small stride
as its own single-round kernel.
"""
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from bench import timed
from xrspatial_tpu.kernels import pallas_jfa as pj
N = 4096; T = pj.T
rng = np.random.default_rng(0)
h = w = N; hp = wp = N + 2*T
mask = np.zeros((h, w), bool)
mask[rng.integers(0, h, 256), rng.integers(0, w, 256)] = True
xs = jnp.arange(w, dtype=jnp.float32); ys = jnp.arange(h, dtype=jnp.float32)
px = jnp.broadcast_to(xs[None,:], (h,w)); py = jnp.broadcast_to(ys[:,None], (h,w))
inf = jnp.float32(jnp.inf); m = jnp.asarray(mask)
state = [jnp.pad(jnp.where(m, px, inf), ((T,T),(T,T)), constant_values=inf),
         jnp.pad(jnp.where(m, py, inf), ((T,T),(T,T)), constant_values=inf)]
xs2 = jnp.broadcast_to(jnp.pad(xs,(T,T),mode="edge")[None,:],(8,wp))
ys2 = jnp.broadcast_to(jnp.pad(ys,(T,T),mode="edge")[:,None],(hp,128))
jax.block_until_ready(state)

SPLITS = {
  "1x9": [(64,32,16,8,4,2,1,2,1)],
  "3x3": [(64,32,16),(8,4,2),(1,2,1)],
  "2x":  [(64,32,16,8),(4,2,1,2,1)],
  "9x1": [(64,),(32,),(16,),(8,),(4,),(2,),(1,),(2,),(1,)],
}
def run(groups):
    st = state
    for g in groups:
        st = pj._multi_round_small(st, xs2, ys2, g, 2, 0)
    return st[0]
for name, groups in SPLITS.items():
    t = timed(lambda g=groups: run(g), reps=8, burst=4)
    print(f"{name}: {t*1e3:.2f} ms", flush=True)
