"""Canonical DataArray/Dataset implementation used across the package.

Uses real xarray when it is importable (full compatibility), otherwise the
bundled JAX-backed shim in :mod:`xrspatial_tpu.xr_compat`.
"""

try:  # pragma: no cover - environment dependent
    import xarray as _xr

    DataArray = _xr.DataArray
    Dataset = _xr.Dataset
    concat = _xr.concat
    HAVE_XARRAY = True
except ImportError:
    from .xr_compat import DataArray, Dataset, concat  # noqa: F401

    HAVE_XARRAY = False

__all__ = ["DataArray", "Dataset", "concat", "HAVE_XARRAY"]
