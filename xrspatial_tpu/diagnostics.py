"""Pre-flight pitfall diagnostics for input rasters.

Host-side port of reference ``xrspatial/diagnostics.py`` (:21-166): cheap
heuristic checks (no device compute) that catch the classic
"degrees horizontal + meters vertical" mistake before running surface ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from .utils import (_infer_coord_unit_type, _infer_vertical_unit_type,
                    get_dataarray_resolution)
from .xrlib import DataArray

__all__ = ["DiagnosticIssue", "DiagnosticReport", "diagnose"]


@dataclass
class DiagnosticIssue:
    """A single issue found during analysis."""
    code: str
    severity: str  # 'warning' or 'error'
    message: str
    suggestion: str


@dataclass
class DiagnosticReport:
    """Results from diagnosing a DataArray."""
    issues: List[DiagnosticIssue] = field(default_factory=list)
    horizontal_unit_type: Optional[str] = None
    vertical_unit_type: Optional[str] = None
    resolution: Optional[tuple] = None

    @property
    def has_issues(self) -> bool:
        return len(self.issues) > 0

    @property
    def has_warnings(self) -> bool:
        return any(i.severity == 'warning' for i in self.issues)

    @property
    def has_errors(self) -> bool:
        return any(i.severity == 'error' for i in self.issues)

    def __str__(self) -> str:
        if not self.issues:
            return "No issues detected."
        lines = []
        for issue in self.issues:
            lines.append(f"[{issue.severity.upper()}] {issue.code}: {issue.message}")
            lines.append(f"  Suggestion: {issue.suggestion}")
        return "\n".join(lines)


def _get_coord(agg, dim):
    try:
        return agg.coords[dim] if dim in agg.coords else None
    except Exception:
        return None


def _check_unit_mismatch(agg: DataArray, report: DiagnosticReport) -> None:
    try:
        cellsize_x, cellsize_y = get_dataarray_resolution(agg)
        report.resolution = (cellsize_x, cellsize_y)
    except Exception:
        return
    if len(agg.dims) < 2:
        return
    dim_y, dim_x = agg.dims[-2], agg.dims[-1]
    coord_x = _get_coord(agg, dim_x)
    coord_y = _get_coord(agg, dim_y)
    if coord_x is None or coord_y is None:
        return

    horiz_types = {_infer_coord_unit_type(coord_x, cellsize_x),
                   _infer_coord_unit_type(coord_y, cellsize_y)} - {"unknown"}
    vert = _infer_vertical_unit_type(agg)
    report.vertical_unit_type = vert
    if horiz_types:
        report.horizontal_unit_type = next(iter(horiz_types))
    if not horiz_types or vert == "unknown":
        return

    if "degrees" in horiz_types and vert == "elevation":
        report.issues.append(DiagnosticIssue(
            code="UNIT_MISMATCH",
            severity="warning",
            message=(
                "Input DataArray appears to have coordinates in degrees "
                "but elevation values in a linear unit (e.g. meters/feet)."
            ),
            suggestion=(
                "Slope/aspect/curvature operations expect horizontal "
                "distances in the same units as vertical. Consider "
                "reprojecting to a projected CRS with meter-based "
                "coordinates."
            ),
        ))


def diagnose(agg: DataArray, tool: Optional[str] = None) -> DiagnosticReport:
    """Diagnose a DataArray for common pitfalls before running ops.

    Parameters
    ----------
    agg : DataArray
    tool : str, optional
        When given, only diagnostics relevant to that tool are run.
    """
    report = DiagnosticReport()
    unit_mismatch_tools = {'slope', 'aspect', 'curvature', 'hillshade'}
    if tool is None or tool.lower() in unit_mismatch_tools:
        _check_unit_mismatch(agg, report)
    return report
