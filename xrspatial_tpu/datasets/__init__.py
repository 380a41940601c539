"""Example datasets and terrain synthesis helpers.

Counterpart of reference ``xrspatial/datasets/__init__.py``.  Bundled
sample data (sentinel-2 bands) loads from a ``data/`` directory next to
this file when present; ``make_terrain`` reproduces the reference's
fBm-style multi-octave terrain (datasets/__init__.py:51-133) using the
on-device perlin kernel instead of the external ``noise`` package + dask.
"""

from __future__ import annotations

import os

import numpy as np

from ..perlin import octave_tables
from ..utils import x64
from ..xrlib import DataArray

__all__ = ["available_datasets", "get_data", "make_terrain"]

_module_path = os.path.dirname(os.path.abspath(__file__))
_available_datasets = [p for p in next(os.walk(_module_path))[1]
                       if not p.startswith("__")]
available_datasets = _available_datasets
available = available_datasets


def get_data(dataset):
    """Open example multispectral band data by dataset name.

    Loads every ``.npz`` band file in the dataset folder (arrays stored
    with keys ``data``/``name``/optionally coordinate vectors).
    """
    data = {}
    if dataset not in _available_datasets:
        raise ValueError(
            f'The dataset {dataset} is not available. '
            f'Available folders are {available_datasets}.')
    folder_path = os.path.abspath(os.path.join(_module_path, dataset))
    for band_file in sorted(next(os.walk(folder_path))[2]):
        path = os.path.join(folder_path, band_file)
        if band_file.endswith(".npz"):
            with np.load(path) as f:
                arr = DataArray(f["data"], dims=("y", "x"),
                                name=str(f["name"]))
                if "y" in f and "x" in f:
                    arr["y"] = f["y"]
                    arr["x"] = f["x"]
                if "res" in f:
                    res = f["res"]
                    arr.attrs["res"] = (float(res[0]), float(res[1]))
                data[str(f["name"])] = arr
    return data


def make_terrain(shape=(1024, 1024), scale=100.0, octaves=6,
                 persistence=0.5, lacunarity=2.0, chunks=None) -> DataArray:
    """Generate pseudo-random fBm terrain on device.

    Parameters mirror the reference (scale/octaves/persistence/
    lacunarity); `chunks` is accepted for API compatibility and ignored —
    sharding replaces dask chunking in this framework.
    """
    import jax
    import jax.numpy as jnp

    from ..terrain import carve_octave, pack_octaves

    h, w = shape
    ys = np.arange(h, dtype=np.float32) / scale
    xs = np.arange(w, dtype=np.float32) / scale

    # host-hashed lattices + one packed upload (see perlin.py); fBm
    # accumulation stays f64 as before (x64 at the call boundary)
    octs, weights = [], []
    amplitude, frequency = 1.0, 1.0
    for i in range(octaves):
        octs.append(octave_tables(42 + i, xs * np.float32(frequency),
                                  ys * np.float32(frequency)))
        weights.append(amplitude)
        amplitude *= persistence
        frequency *= lacunarity
    tables, idx, frac, plan = pack_octaves(octs)

    with x64():
        @jax.jit
        def run(tables, idx, frac):
            from ..perlin import octave_eval
            acc = jnp.zeros((h, w), dtype=jnp.float64)
            for entry, weight in zip(plan, weights):
                fields = carve_octave(tables, idx, frac, entry)
                acc = acc + weight * octave_eval(*fields)
            return acc.astype(jnp.float32)

        data = run(jnp.asarray(tables), jnp.asarray(idx), jnp.asarray(frac))

    out = DataArray(data, name="terrain", dims=("y", "x"),
                    attrs={"res": 1})
    out["y"] = np.linspace(0, 500, h, endpoint=False) + 250.0 / h
    out["x"] = np.linspace(0, 500, w, endpoint=False) + 250.0 / w
    return out
