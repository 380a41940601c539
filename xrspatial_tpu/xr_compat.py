"""Minimal xarray-compatible data model backed by JAX/NumPy arrays.

The upstream reference (xarray-spatial) builds every public API on
``xr.DataArray`` / ``xr.Dataset``.  This environment ships without xarray, so
the framework provides its own lightweight, API-compatible subset, designed so
that (a) user code written against xarray's common surface keeps working, and
(b) the payload ``.data`` can live on a TPU as a ``jax.Array`` without any
host round-trips.  If real xarray is importable we use it directly instead —
every op in this package only relies on the shared API subset implemented
here.

Reference parity notes: mirrors the construction/semantics exercised by the
reference test harness (``/root/reference/xrspatial/tests/general_checks.py``)
and the per-op output contract ``xr.DataArray(out, coords=agg.coords,
dims=agg.dims, attrs=agg.attrs)`` (e.g. ``slope.py:367-371``).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Hashable, Iterator, Optional, Sequence, Union

import numpy as np

try:  # jax arrays are first-class payloads but numpy-only use must work too
    import jax
    import jax.numpy as jnp

    _JAX_ARRAY_TYPES = (jax.Array,)
except Exception:  # pragma: no cover
    jax = None
    jnp = None
    _JAX_ARRAY_TYPES = ()

__all__ = ["DataArray", "Dataset", "concat"]


def _is_array(obj) -> bool:
    return isinstance(obj, (np.ndarray,) + _JAX_ARRAY_TYPES)


def _asarray(obj):
    """Coerce to an array without forcing device→host transfer."""
    if _is_array(obj):
        return obj
    if isinstance(obj, DataArray):
        return obj._data
    return np.asarray(obj)


def _to_numpy(obj) -> np.ndarray:
    return np.asarray(obj)


def _default_dims(ndim: int) -> tuple:
    return tuple(f"dim_{i}" for i in range(ndim))


class _AttrsDict(dict):
    """Plain dict used for .attrs; defined for clarity of intent."""


class Coordinates(Mapping):
    """Ordered mapping of name -> 1-D (or scalar) coordinate DataArray.

    Iteration yields coordinate *names*, matching xarray.
    """

    def __init__(self, coords: Optional[Mapping] = None, dim_order: Sequence[Hashable] = ()):
        self._coords: dict = {}
        self._dim_order = tuple(dim_order)
        if coords is not None:
            items = coords.items() if isinstance(coords, Mapping) else coords
            for k, v in items:
                self[k] = v

    # -- Mapping interface -------------------------------------------------
    def __getitem__(self, key) -> "DataArray":
        return self._coords[key]

    def __setitem__(self, key, value) -> None:
        if isinstance(value, DataArray):
            arr = value
            if arr.name != key:
                arr = DataArray(
                    arr._data, dims=arr.dims, name=key,
                    attrs=dict(arr.attrs), coords=None, fastpath=True,
                )
                # share the attrs dict so later mutation propagates
                arr._attrs = value._attrs
        elif isinstance(value, tuple) and len(value) in (2, 3) and not _is_array(value):
            # xarray-style (dims, data[, attrs]) tuple
            dims = (value[0],) if isinstance(value[0], str) else tuple(value[0])
            data = _asarray(value[1])
            attrs = dict(value[2]) if len(value) == 3 else {}
            arr = DataArray(data, dims=dims, name=key, attrs=attrs, fastpath=True)
        else:
            data = _asarray(value)
            dims = (key,) if getattr(data, "ndim", 0) == 1 else _default_dims(getattr(data, "ndim", 0))
            arr = DataArray(data, dims=dims, name=key, fastpath=True)
        self._coords[key] = arr

    def __delitem__(self, key) -> None:
        del self._coords[key]

    def __iter__(self) -> Iterator:
        return iter(self._coords)

    def __len__(self) -> int:
        return len(self._coords)

    def __contains__(self, key) -> bool:
        return key in self._coords

    def keys(self):
        return self._coords.keys()

    def values(self):
        return self._coords.values()

    def items(self):
        return self._coords.items()

    def copy(self) -> "Coordinates":
        new = Coordinates(dim_order=self._dim_order)
        for k, v in self._coords.items():
            new._coords[k] = v.copy(deep=False)
        return new

    def equals(self, other: "Coordinates") -> bool:
        if set(self.keys()) != set(other.keys()):
            return False
        return all(self[k].equals(other[k]) for k in self.keys())

    def __repr__(self) -> str:
        lines = ["Coordinates:"]
        for k, v in self._coords.items():
            lines.append(f"  * {k:<10} ({', '.join(map(str, v.dims))}) {v.dtype}")
        return "\n".join(lines)


class DataArray:
    """N-d labelled array: data + dims + coords + attrs + name.

    The payload may be a ``numpy.ndarray`` **or** a ``jax.Array`` (possibly
    sharded over a device mesh); all metadata stays on host.
    """

    __slots__ = ("_data", "_dims", "_coords", "_attrs", "name")

    def __init__(self, data, coords=None, dims=None, name=None, attrs=None,
                 fastpath=False):
        if isinstance(data, DataArray):
            if coords is None:
                coords = data.coords
            if dims is None:
                dims = data.dims
            if attrs is None:
                attrs = data.attrs
            if name is None:
                name = data.name
            data = data._data
        if not _is_array(data):
            data = np.asarray(data)
        self._data = data

        if dims is None:
            if isinstance(coords, Coordinates) and len(coords._dim_order) == data.ndim:
                dims = coords._dim_order
            else:
                dims = _default_dims(data.ndim)
        elif isinstance(dims, str):
            dims = (dims,)
        else:
            dims = tuple(dims)
        if len(dims) != data.ndim:
            raise ValueError(
                f"dims {dims!r} do not match data ndim {data.ndim}")
        self._dims = dims

        self._attrs = _AttrsDict(attrs or {})
        self.name = name

        self._coords = Coordinates(dim_order=dims)
        if coords is not None:
            if isinstance(coords, (Coordinates, dict, Mapping)):
                for k, v in coords.items():
                    self._coords[k] = v
            elif isinstance(coords, (list, tuple)):
                # positional list of coordinate arrays, one per dim
                for d, v in zip(dims, coords):
                    self._coords[d] = v
            else:
                raise TypeError(f"unsupported coords type {type(coords)}")

    # -- core properties ---------------------------------------------------
    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, value):
        value = _asarray(value)
        if value.shape != self._data.shape:
            raise ValueError("replacement data must match shape")
        self._data = value

    @property
    def values(self) -> np.ndarray:
        return _to_numpy(self._data)

    @values.setter
    def values(self, value):
        self.data = value

    @property
    def dims(self) -> tuple:
        return self._dims

    @property
    def coords(self) -> Coordinates:
        return self._coords

    @property
    def attrs(self) -> dict:
        return self._attrs

    @attrs.setter
    def attrs(self, value):
        self._attrs = _AttrsDict(value or {})

    @property
    def shape(self) -> tuple:
        return tuple(self._data.shape)

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def ndim(self) -> int:
        return self._data.ndim

    @property
    def size(self) -> int:
        return int(np.prod(self._data.shape)) if self._data.shape else 1

    @property
    def sizes(self) -> dict:
        return dict(zip(self._dims, self.shape))

    @property
    def chunks(self):
        # no dask in the TPU-native stack; kept for API compatibility
        return None

    # -- indexing ----------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            if key in self._coords:
                return self._coords[key]
            raise KeyError(key)
        data = self._data[key]
        # best-effort dims/coords propagation for basic slicing
        if not isinstance(key, tuple):
            key = (key,)
        if any(k is Ellipsis for k in key):
            # expand ... into full slices so positional dim matching below
            # stays aligned (d3[..., 0] must drop the LAST dim, not walk
            # the keys against the leading dims)
            i = key.index(Ellipsis)
            explicit = len(key) - 1
            fill = (slice(None),) * (len(self._dims) - explicit)
            key = key[:i] + fill + key[i + 1:]
        new_dims = []
        new_coords = {}
        ki = 0
        for d in self._dims:
            k = key[ki] if ki < len(key) else slice(None)
            ki += 1
            if isinstance(k, (int, np.integer)):
                continue
            new_dims.append(d)
            if d in self._coords:
                new_coords[d] = DataArray(
                    self._coords[d]._data[k], dims=(d,), name=d,
                    attrs=dict(self._coords[d].attrs), fastpath=True)
        # non-dim coords pass through if all their dims survive
        for cname, cval in self._coords.items():
            if cname in new_coords or cname in self._dims:
                continue
            if all(cd in new_dims for cd in cval.dims):
                new_coords[cname] = cval
        if len(new_dims) != data.ndim:
            return DataArray(data, name=self.name, attrs=dict(self._attrs))
        return DataArray(data, coords=new_coords, dims=new_dims,
                         name=self.name, attrs=dict(self._attrs))

    def __setitem__(self, key, value):
        if isinstance(key, str):
            self._coords[key] = value
        else:
            data = np.array(self.values)
            data[key] = _to_numpy(_asarray(value))
            self._data = data if isinstance(self._data, np.ndarray) else (
                jnp.asarray(data) if jnp is not None else data)

    def isel(self, indexers: Optional[Mapping] = None, **kw):
        indexers = dict(indexers or {}, **kw)
        key = tuple(indexers.get(d, slice(None)) for d in self._dims)
        return self[key]

    def sel(self, indexers: Optional[Mapping] = None, method: Optional[str] = None, **kw):
        indexers = dict(indexers or {}, **kw)
        out = {}
        for d, target in indexers.items():
            cvals = _to_numpy(self._coords[d]._data)
            if isinstance(target, slice):
                lo, hi = target.start, target.stop
                mask = np.ones(len(cvals), dtype=bool)
                ascending = len(cvals) < 2 or cvals[0] <= cvals[-1]
                if lo is not None:
                    mask &= (cvals >= lo) if ascending else (cvals <= lo)
                if hi is not None:
                    mask &= (cvals <= hi) if ascending else (cvals >= hi)
                idx = np.nonzero(mask)[0]
                out[d] = slice(idx[0], idx[-1] + 1) if len(idx) else slice(0, 0)
            else:
                if method == "nearest":
                    out[d] = int(np.argmin(np.abs(cvals - target)))
                else:
                    matches = np.nonzero(cvals == target)[0]
                    if len(matches) == 0:
                        raise KeyError(target)
                    out[d] = int(matches[0])
        return self.isel(out)

    # -- conversions / copies ---------------------------------------------
    def astype(self, dtype) -> "DataArray":
        return self._replace(self._data.astype(dtype))

    def copy(self, deep: bool = True) -> "DataArray":
        data = self._data
        if deep and isinstance(data, np.ndarray):
            data = data.copy()
        new = DataArray(data, dims=self._dims, name=self.name,
                        attrs=dict(self._attrs), fastpath=True)
        for k, v in self._coords.items():
            new._coords[k] = v if not deep else DataArray(
                v._data, dims=v.dims, name=k, attrs=dict(v.attrs), fastpath=True)
        return new

    def _replace(self, data, name=None) -> "DataArray":
        new = DataArray(data, dims=self._dims if data.ndim == self.ndim else None,
                        name=self.name if name is None else name,
                        attrs=dict(self._attrs), fastpath=True)
        if data.ndim == self.ndim and data.shape == self.shape:
            new._coords = self._coords.copy()
        return new

    def __array__(self, dtype=None, copy=None):
        arr = _to_numpy(self._data)
        return arr.astype(dtype) if dtype is not None else arr

    def item(self):
        return _to_numpy(self._data).item()

    def to_numpy(self) -> np.ndarray:
        return self.values

    # -- reductions --------------------------------------------------------
    def _reduce(self, fn, dim=None, axis=None, **kw):
        if kw:
            raise TypeError(
                f"unsupported reduction arguments {sorted(kw)}; this "
                "xarray-compat subset accepts dim=, axis=, skipna=")
        if dim is not None and axis is not None:
            raise ValueError("cannot supply both 'dim' and 'axis'")
        if dim is not None:
            dims = [dim] if isinstance(dim, str) else list(dim)
            for d in dims:
                if d not in self._dims:
                    raise ValueError(f"dimension {d!r} not in {self._dims}")
            axis = tuple(self._dims.index(d) for d in dims)
        out = fn(self._data) if axis is None else fn(self._data, axis=axis)
        if not _is_array(out):
            out = np.asarray(out)
        if axis is None:
            return DataArray(out, name=self.name, attrs=dict(self._attrs))
        axes = (axis,) if isinstance(axis, int) else tuple(axis)
        axes = tuple(a % len(self._dims) for a in axes)
        kept = [d for i, d in enumerate(self._dims) if i not in axes]
        res = DataArray(out, name=self.name, dims=tuple(kept),
                        attrs=dict(self._attrs))
        for d in kept:
            if d in self._coords:
                res._coords[d] = self._coords[d]
        return res

    def min(self, dim=None, axis=None, **kw):
        return self._reduce(np.nanmin if kw.pop("skipna", True) else np.min,
                            dim, axis, **kw)

    def max(self, dim=None, axis=None, **kw):
        return self._reduce(np.nanmax if kw.pop("skipna", True) else np.max,
                            dim, axis, **kw)

    def mean(self, dim=None, axis=None, **kw):
        return self._reduce(np.nanmean if kw.pop("skipna", True) else np.mean,
                            dim, axis, **kw)

    def sum(self, dim=None, axis=None, **kw):
        return self._reduce(np.nansum if kw.pop("skipna", True) else np.sum,
                            dim, axis, **kw)

    def std(self, dim=None, axis=None, **kw):
        return self._reduce(np.nanstd if kw.pop("skipna", True) else np.std,
                            dim, axis, **kw)

    def var(self, dim=None, axis=None, **kw):
        return self._reduce(np.nanvar if kw.pop("skipna", True) else np.var,
                            dim, axis, **kw)

    # -- arithmetic --------------------------------------------------------
    def _binop(self, other, op, reflexive=False):
        other_data = other._data if isinstance(other, DataArray) else other
        a, b = (other_data, self._data) if reflexive else (self._data, other_data)
        return self._replace_binop(op(a, b))

    def _replace_binop(self, data):
        new = DataArray(data, name=self.name, attrs={}, fastpath=True)
        if data.ndim == self.ndim and tuple(data.shape) == self.shape:
            new._dims = self._dims
            new._coords = self._coords.copy()
        return new

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._binop(o, lambda a, b: a + b, True)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._binop(o, lambda a, b: a - b, True)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: a * b, True)

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b)

    def __rtruediv__(self, o):
        return self._binop(o, lambda a, b: a / b, True)

    def __pow__(self, o):
        return self._binop(o, lambda a, b: a ** b)

    def __neg__(self):
        return self._replace_binop(-self._data)

    def __abs__(self):
        return self._replace_binop(abs(self._data))

    def __lt__(self, o):
        return self._binop(o, lambda a, b: a < b)

    def __le__(self, o):
        return self._binop(o, lambda a, b: a <= b)

    def __gt__(self, o):
        return self._binop(o, lambda a, b: a > b)

    def __ge__(self, o):
        return self._binop(o, lambda a, b: a >= b)

    def __eq__(self, o):  # elementwise, like xarray
        if isinstance(o, (DataArray, int, float, np.ndarray, np.generic)) or _is_array(o):
            return self._binop(o, lambda a, b: a == b)
        return NotImplemented

    def __ne__(self, o):
        if isinstance(o, (DataArray, int, float, np.ndarray, np.generic)) or _is_array(o):
            return self._binop(o, lambda a, b: a != b)
        return NotImplemented

    __hash__ = None  # mutable container semantics, like xarray

    # -- comparison / repr -------------------------------------------------
    def equals(self, other: "DataArray") -> bool:
        if not isinstance(other, DataArray):
            return False
        if self.dims != other.dims or self.shape != other.shape:
            return False
        a, b = self.values, other.values
        if a.dtype != b.dtype:
            return False
        if a.dtype.kind == "f":
            if not np.array_equal(a, b, equal_nan=True):
                return False
        elif not np.array_equal(a, b):
            return False
        return self._coords.equals(other._coords)

    def identical(self, other: "DataArray") -> bool:
        return (self.equals(other) and self.name == other.name
                and dict(self.attrs) == dict(other.attrs))

    def rename(self, name) -> "DataArray":
        new = self.copy(deep=False)
        new.name = name
        return new

    def assign_attrs(self, *args, **kwargs) -> "DataArray":
        new = self.copy(deep=False)
        for mapping in args:
            new._attrs.update(mapping)
        new._attrs.update(kwargs)
        return new

    def assign_coords(self, coords=None, **kwargs) -> "DataArray":
        new = self.copy(deep=False)
        for k, v in dict(coords or {}, **kwargs).items():
            new._coords[k] = v
        return new

    def where(self, cond, other=jnp.nan if jnp is not None else float("nan")):
        cond_data = cond._data if isinstance(cond, DataArray) else cond
        other_data = other._data if isinstance(other, DataArray) else other
        xp = jnp if (jnp is not None
                     and not isinstance(self._data, np.ndarray)) else np
        return self._replace(xp.where(cond_data, self._data, other_data))

    def fillna(self, value) -> "DataArray":
        xp = jnp if (jnp is not None
                     and not isinstance(self._data, np.ndarray)) else np
        return self._replace(xp.where(xp.isnan(self._data), value,
                                      self._data))

    def expand_dims(self, dim, axis=0) -> "DataArray":
        if isinstance(self._data, np.ndarray):
            data = np.expand_dims(self._data, axis)
        else:
            data = jnp.expand_dims(self._data, axis)
        dims = list(self._dims)
        dims.insert(axis, dim)
        new = DataArray(data, dims=dims, name=self.name, attrs=dict(self._attrs))
        for k, v in self._coords.items():
            new._coords[k] = v
        return new

    def to_dataset(self, name=None) -> "Dataset":
        vname = name if name is not None else self.name
        if vname is None:
            raise ValueError("unable to convert unnamed DataArray to Dataset")
        ds = Dataset()
        ds[vname] = self
        return ds

    def drop_vars(self, names) -> "DataArray":
        if isinstance(names, str):
            names = [names]
        new = self.copy(deep=False)
        for n in names:
            if n in new._coords:
                del new._coords[n]
        return new

    def __repr__(self) -> str:
        header = f"<tpu.DataArray {self.name!r} ({', '.join(f'{d}: {s}' for d, s in zip(self._dims, self.shape))})>"
        body = np.array2string(self.values, precision=6, threshold=40)
        coords_repr = repr(self._coords) if len(self._coords) else "Dimensions without coordinates: " + ", ".join(map(str, self._dims))
        attrs_repr = f"Attributes: {dict(self._attrs)}" if self._attrs else ""
        return "\n".join(x for x in (header, body, coords_repr, attrs_repr) if x)


class Dataset:
    """Mapping of variable name -> DataArray with shared attrs."""

    def __init__(self, data_vars: Optional[Mapping] = None, coords=None,
                 attrs: Optional[Mapping] = None):
        self._variables: dict = {}
        self._attrs = _AttrsDict(attrs or {})
        self._coords = Coordinates()
        if coords is not None:
            for k, v in (coords.items() if isinstance(coords, Mapping) else coords):
                self._coords[k] = v
        if data_vars:
            for k, v in data_vars.items():
                self[k] = v

    @property
    def data_vars(self) -> dict:
        return self._variables

    @property
    def attrs(self) -> dict:
        return self._attrs

    @attrs.setter
    def attrs(self, value):
        self._attrs = _AttrsDict(value or {})

    @property
    def coords(self) -> Coordinates:
        return self._coords

    @property
    def dims(self) -> dict:
        out: dict = {}
        for v in self._variables.values():
            for d, s in zip(v.dims, v.shape):
                out[d] = s
        return out

    def __getitem__(self, key) -> DataArray:
        if key in self._variables:
            return self._variables[key]
        if key in self._coords:
            return self._coords[key]
        raise KeyError(key)

    def __setitem__(self, key, value) -> None:
        if isinstance(value, tuple) and not isinstance(value[0], (np.ndarray,)):
            # (dims, data) tuple form
            dims = (value[0],) if isinstance(value[0], str) else tuple(value[0])
            value = DataArray(_asarray(value[1]), dims=dims, name=key)
        if not isinstance(value, DataArray):
            value = DataArray(_asarray(value), name=key)
        arr = DataArray(value._data, dims=value.dims, name=key,
                        attrs=dict(value.attrs), fastpath=True)
        for k, v in value.coords.items():
            arr._coords[k] = v
            if k not in self._coords:
                self._coords[k] = v
        self._variables[key] = arr

    def __delitem__(self, key) -> None:
        del self._variables[key]

    def __contains__(self, key) -> bool:
        return key in self._variables

    def __iter__(self):
        return iter(self._variables)

    def __len__(self):
        return len(self._variables)

    def keys(self):
        return self._variables.keys()

    def values(self):
        return self._variables.values()

    def items(self):
        return self._variables.items()

    def copy(self, deep: bool = True) -> "Dataset":
        new = Dataset(attrs=dict(self._attrs))
        for k, v in self._variables.items():
            new._variables[k] = v.copy(deep=deep)
        new._coords = self._coords.copy()
        return new

    def rename(self, mapping: Mapping) -> "Dataset":
        new = Dataset(attrs=dict(self._attrs))
        for k, v in self._variables.items():
            nk = mapping.get(k, k)
            new._variables[nk] = v.rename(nk)
        new._coords = self._coords.copy()
        return new

    def merge(self, other: "Dataset") -> "Dataset":
        new = self.copy(deep=False)
        for k, v in other.items():
            new[k] = v
        return new

    def equals(self, other: "Dataset") -> bool:
        if set(self.keys()) != set(other.keys()):
            return False
        return all(self[k].equals(other[k]) for k in self.keys())

    def __repr__(self) -> str:
        lines = ["<tpu.Dataset>"]
        lines.append(f"Dimensions: {self.dims}")
        for k, v in self._variables.items():
            lines.append(f"  {k:<12} ({', '.join(map(str, v.dims))}) {v.dtype}")
        if self._attrs:
            lines.append(f"Attributes: {dict(self._attrs)}")
        return "\n".join(lines)


def concat(arrays: Sequence[DataArray], dim: Union[str, Any]) -> DataArray:
    """Concatenate DataArrays along a (possibly new) dimension.

    Supports the reference's use ``xr.concat(stats_aggs, dim='stats')``
    (``focal.py:778,796``) where each input is 2D and the result gains a new
    leading dim.
    """
    if not arrays:
        raise ValueError("need at least one array")
    first = arrays[0]
    dim_name = dim if isinstance(dim, str) else dim.name
    is_jax = any(not isinstance(a._data, np.ndarray) for a in arrays)
    xp = jnp if (is_jax and jnp is not None) else np

    if dim_name in first.dims:
        axis = first.dims.index(dim_name)
        data = xp.concatenate([a._data for a in arrays], axis=axis)
        out = DataArray(data, dims=first.dims, name=first.name,
                        attrs=dict(first.attrs))
        for k, v in first.coords.items():
            if dim_name not in v.dims:
                out._coords[k] = v
        # the concat-dim coordinate concatenates too (xarray semantics);
        # dropping it broke get_dataarray_resolution on concatenated
        # rasters
        if all(dim_name in a.coords for a in arrays):
            cvals = np.concatenate(
                [_to_numpy(a.coords[dim_name]._data) for a in arrays])
            out._coords[dim_name] = DataArray(
                cvals, dims=(dim_name,), name=dim_name,
                attrs=dict(first.coords[dim_name].attrs))
        return out

    data = xp.stack([a._data for a in arrays], axis=0)
    out = DataArray(data, dims=(dim_name,) + first.dims, name=first.name,
                    attrs=dict(first.attrs))
    for k, v in first.coords.items():
        out._coords[k] = v
    names = [a.name for a in arrays]
    if all(n is not None for n in names):
        out._coords[dim_name] = DataArray(np.asarray(names), dims=(dim_name,),
                                          name=dim_name)
    if not isinstance(dim, str) and isinstance(dim, DataArray):
        out._coords[dim_name] = dim
    return out
