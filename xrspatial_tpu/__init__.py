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

# public API mirrors the reference export list (xrspatial/__init__.py:1-40)
from .aspect import aspect  # noqa: E402,F401
from .bump import bump  # noqa: E402,F401
from .classify import binary  # noqa: E402,F401
from .classify import box_plot  # noqa: E402,F401
from .classify import equal_interval  # noqa: E402,F401
from .classify import head_tail_breaks  # noqa: E402,F401
from .classify import maximum_breaks  # noqa: E402,F401
from .classify import natural_breaks  # noqa: E402,F401
from .classify import percentiles  # noqa: E402,F401
from .classify import quantile  # noqa: E402,F401
from .classify import reclassify  # noqa: E402,F401
from .classify import std_mean  # noqa: E402,F401
from .curvature import curvature  # noqa: E402,F401
from .diagnostics import diagnose  # noqa: E402,F401
from .focal import mean  # noqa: E402,F401
from .hillshade import hillshade  # noqa: E402,F401
from .multispectral import arvi  # noqa: E402,F401
from .multispectral import evi  # noqa: E402,F401
from .multispectral import nbr  # noqa: E402,F401
from .multispectral import ndvi  # noqa: E402,F401
from .multispectral import savi  # noqa: E402,F401
from .multispectral import sipi  # noqa: E402,F401
from .pathfinding import a_star_search  # noqa: E402,F401
from .perlin import perlin  # noqa: E402,F401
from .proximity import allocation  # noqa: E402,F401
from .proximity import direction  # noqa: E402,F401
from .proximity import euclidean_distance  # noqa: E402,F401
from .proximity import great_circle_distance  # noqa: E402,F401
from .proximity import manhattan_distance  # noqa: E402,F401
from .proximity import proximity  # noqa: E402,F401
from .slope import slope  # noqa: E402,F401
from .terrain import generate_terrain  # noqa: E402,F401
from .viewshed import viewshed  # noqa: E402,F401
from .zonal import apply as zonal_apply  # noqa: E402,F401
from .zonal import crop  # noqa: E402,F401
from .zonal import crosstab as zonal_crosstab  # noqa: E402,F401
from .zonal import regions as regions  # noqa: E402,F401
from .zonal import stats as zonal_stats  # noqa: E402,F401
from .zonal import suggest_zonal_canvas as suggest_zonal_canvas  # noqa: E402,F401
from .zonal import trim  # noqa: E402,F401

__version__ = "0.1.0"


def test():
    """Run the xrspatial_tpu test suite."""
    import os

    import pytest

    pytest.main([os.path.join(os.path.dirname(os.path.dirname(__file__)),
                              "tests")])
