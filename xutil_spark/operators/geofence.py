"""Geofence assignment: point → fence id as a pure JVM expression.

The fence set is a handful of literal rectangles (the classic
"metro-area geofence" shape) — assignment compiles to one codegen'd
CASE chain, no join, no Python.  For polygon fences swap this for the
broadcast filter-refine PiP join (operators.spatial_join); the
downstream transition operator (streaming.stateful.streaming_geofence)
only sees the integer fence column and doesn't care which produced it.

Semantics: the containing rectangle with the SMALLEST fid wins
(half-open bounds: w ≤ lon < e, s ≤ lat < n); -1 = outside every
fence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (fid, west, south, east, north) — disjoint rectangles inside the
# China-bbox synthetic point cloud (FIXTURES.md), each covering a few
# percent of it so enter/exit transitions are dense
FENCES = [
    (0, 80.0, 25.0, 95.0, 35.0),
    (1, 100.0, 22.0, 115.0, 32.0),
    (2, 115.0, 35.0, 130.0, 45.0),
    (3, 95.0, 40.0, 100.0, 48.0),
]


def fence_assign(lon, lat, fences=None) -> Column:
    """Smallest-fid containing rectangle, -1 outside.  Fences are
    sorted by fid before the CASE chain is built, so a custom unsorted
    list with overlapping rectangles still matches the oracle's
    MIN(fid) semantics (reversed iteration makes the lowest fid the
    outermost WHEN)."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    expr = F.lit(-1).cast("long")
    for fid, w, s, e, n in reversed(sorted(fences or FENCES)):
        cond = (lon >= F.lit(w)) & (lon < F.lit(e)) & \
               (lat >= F.lit(s)) & (lat < F.lit(n))
        expr = F.when(cond, F.lit(fid).cast("long")).otherwise(expr)
    return expr


def fences_sql(fences=None) -> str:
    """The same fence set as a SQL VALUES fragment (oracle side)."""
    rows = ",".join(
        f"({fid},{w!r},{s!r},{e!r},{n!r})"
        for fid, w, s, e, n in (fences or FENCES)
    )
    return f"(VALUES {rows}) AS fences(fid, w, s, e, n)"
