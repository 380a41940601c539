"""xrspatial_tpu — TPU-native raster analytics (rebuild of xarray-spatial).

All compute lowers to JAX/XLA/Pallas programs on a single backend; pod-scale
rasters shard over a 2D device mesh with ICI halo exchange
(``xrspatial_tpu.parallel``).  The public API mirrors the reference's export
list (``/root/reference/xrspatial/__init__.py:1-40``).
"""

# NOTE: float64 is enabled per-op via `jax.enable_x64` scopes (utils.x64),
# NOT globally — global x64 breaks Pallas/Mosaic TPU kernel compilation
# (i64 indices fail to legalize).  f64 ops: geodesic ECEF math, focal mean,
# viewshed (reference geodesic.py:14, viewshed.py:1549-1561).

from .xrlib import DataArray, Dataset, concat  # noqa: E402,F401

from .aspect import aspect  # noqa: E402,F401
from .curvature import curvature  # noqa: E402,F401
from .diagnostics import diagnose  # noqa: E402,F401
from .hillshade import hillshade  # noqa: E402,F401
from .slope import slope  # noqa: E402,F401

__version__ = "0.1.0"


def test():
    """Run the xrspatial_tpu test suite."""
    import os

    import pytest

    pytest.main([os.path.join(os.path.dirname(os.path.dirname(__file__)),
                              "tests")])
