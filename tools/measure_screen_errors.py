"""Measure the f32 screen's actual deviation from the f64 attributes.

Anchors the error-budget constants in kernels/viewshed_exact.py
(_E_ANG / _TAU_C / _TAU_GR / _TAU_K): the device-expanded f32 fields
(_expand_table) are compared against the f64 host planes
(cell_attrs_host) over full grids with rugged terrain and random
viewpoints.  Every _TAU constant must be >= 3x the measured maximum on
BOTH backends (tests run the screen on CPU, production on TPU).

Run:  python tools/measure_screen_errors.py          (axon TPU)
      JAX_PLATFORMS=cpu python tools/...             (CPU backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from xrspatial_tpu.kernels import viewshed_exact as VE
from xrspatial_tpu.kernels.viewshed import cell_attrs_host


def measure(size, seed, res=(1.5, -0.75), f64=False):
    from xrspatial_tpu.utils import x64
    rng = np.random.default_rng(seed)
    data = (rng.random((size, size)) * 500).astype(np.float64)
    data += np.linspace(0, 300, size)[:, None]          # ramp component
    vp = (int(rng.integers(0, size)), int(rng.integers(0, size)))
    ew, ns = res
    at = cell_attrs_host(data, vp[0], vp[1], 3.0, 0.5, ew, ns)
    h = w = size
    n = h * w
    vp_elev = at["vp_elev"]

    # expand EVERY cell on device exactly as the screen does
    ft = np.float64 if f64 else np.float32
    idx = np.arange(n, dtype=np.int32)
    d_c = (data - vp_elev).astype(ft).ravel()
    from xrspatial_tpu.kernels.viewshed import _corner_elev_np
    d_e = (_corner_elev_np(data, vp[0], vp[1], True)
           - vp_elev).astype(ft).ravel()
    d_x = (_corner_elev_np(data, vp[0], vp[1], False)
           - vp_elev).astype(ft).ravel()
    taus = VE._TAUS_F64 if f64 else VE._TAUS_F32
    with x64() if f64 else _null():
        tab = {"idx": jnp.asarray(idx), "sh": jnp.zeros(n, bool),
               "dc": jnp.asarray(d_c), "de": jnp.asarray(d_e),
               "dx": jnp.asarray(d_x)}
        ex = jax.jit(VE._expand_table, static_argnames=("w", "taus"))(
            tab, w, jnp.int32(vp[0]), jnp.int32(vp[1]),
            jnp.asarray(ew, ft), jnp.asarray(ns, ft), taus)
        ex = {k: np.asarray(v) for k, v in ex.items()}

    crossing = at["a0"] > at["a2"]
    a0_true = np.where(crossing, at["a0"] - 2 * np.pi, at["a0"])
    ok = at["valid_b"]

    def err(name, f32v, f64v, mask=ok, rel=False):
        d = np.abs(f32v.astype(np.float64) - f64v)
        if rel:
            d = d / np.maximum(np.abs(f64v), 1e-30)
        m = float(np.nanmax(np.where(mask, d, 0)))
        print(f"  {name:10s} max {'rel' if rel else 'abs'} err {m:.3e}")
        return m

    errs = {}
    # a0w/a0n embed +-tau_c; recover the raw unwrapped angle
    errs["a0"] = err("a0", ex["a0w"] + taus[0], a0_true)
    errs["a1e"] = err("a1e", ex["a1e"], at["a1"])
    errs["a2"] = err("a2", ex["a2w"] - taus[0], at["a2"])
    # gradient errors are RELATIVE to |g| (the band in production is
    # _TG_ABS + _TAU_GR * max|g|)
    errs["g1"] = err("g1", ex["g1"], at["g1"], rel=True)
    errs["mx"] = err("max3", ex["mx"],
                     np.maximum(at["g0"], np.maximum(at["g1"], at["g2"])),
                     rel=True)
    errs["key"] = err("key", ex["key"], at["key"], rel=True)

    # target-side gradient as _screen_run computes it
    d_t = (data + 0.5 - vp_elev).astype(ft).ravel()
    rows, cols = np.divmod(np.arange(n), w)
    dy = (rows - vp[0]).astype(ft)
    dx2 = (cols - vp[1]).astype(ft)
    key32 = (dx2 * ft(ew)) ** 2 + (dy * ft(ns)) ** 2
    gt32 = np.arctan(d_t / np.sqrt(np.where(key32 == 0, 1, key32)))
    errs["gt"] = err("grad_t", gt32, at["grad_t"],
                     mask=ok & ~at["is_vp"], rel=True)
    if not f64:
        # sort-key angle plane vs true f64 center angle
        errs["a1h"] = err("a1 host", VE._angle_plane32(h, w, vp[0],
                                                       vp[1]).ravel(),
                          at["a1"])
    return errs


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    f64 = "--f64" in sys.argv
    worst = {}
    for size, seed in [(256, 0), (256, 1), (512, 2), (1024, 3)]:
        print(f"== {size}^2 seed {seed} on {jax.devices()[0].platform}"
              f"{' f64' if f64 else ''}")
        for k, v in measure(size, seed, f64=f64).items():
            worst[k] = max(worst.get(k, 0.0), v)
    print("\nWORST:", {k: f"{v:.3e}" for k, v in worst.items()})
    taus = VE._TAUS_F64 if f64 else VE._TAUS_F32
    e_ang = taus[0] / 3.0 if f64 else VE._E_ANG
    print(f"budget: E_ANG={e_ang:.1e} (angles abs), "
          f"TAU_GR={taus[3]:.1e} (gradients REL), "
          f"TAU_K={taus[5]:.1e} (key rel)")
    ang = max(worst["a0"], worst["a1e"], worst["a2"],
              worst.get("a1h", 0.0))
    g = max(worst["g1"], worst["mx"], worst["gt"])
    ok = (ang * 3 <= e_ang * 1.01
          and g * 3 <= taus[3] * 1.01
          and worst["key"] * 3 <= taus[5] * 1.01)
    print("BUDGET", "OK" if ok else "VIOLATED")
