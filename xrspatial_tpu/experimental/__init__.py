"""Experimental ops (mirrors reference xrspatial/experimental)."""

from .polygonize import polygonize  # noqa: F401
