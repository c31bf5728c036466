"""Rhumb-line (loxodrome) navigation as pure JVM column expressions.

The constant-bearing complement to the great-circle kernels
(kernels/distance.py transcribes gis.go:167-249's azimuth / haversine /
midpoint / destination): a rhumb line crosses every meridian at the
same angle — the track a vessel steering a fixed compass course
follows, and the straight line on a Mercator chart (the same projection
the engine's tile grid lives on, so a rhumb segment is a straight
segment in tile space).  Standard spherical formulas (Bowditch; see
also the public movable-type compendium), R = 6,371,000 m to match
``native.haversine_m``.

All three operations are fixed float64 expression trees — zero Python
workers — and each conditional (meridian-convergence limit Δψ→0, the
±180° anti-meridian wrap) is an explicit CASE so the DuckDB oracle can
transcribe the identical tree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xutil_spark.functions.native import PI, R_EARTH, _c

# below this |Δψ| the course is treated as due east/west and the
# stretch factor q degenerates to cos φ1 (the Δφ/Δψ limit)
DPSI_EPS = 1e-12


def _dpsi(rlat1: Column, rlat2: Column) -> Column:
    """Δψ = ln(tan(π/4 + φ2/2) / tan(π/4 + φ1/2)) — the Mercator
    ordinate difference."""
    quarter = F.lit(PI / 4.0)
    return F.log(
        F.tan(quarter + rlat2 / F.lit(2.0))
        / F.tan(quarter + rlat1 / F.lit(2.0))
    )


def _dlon_wrapped(lon1, lon2) -> Column:
    """Δλ in radians, wrapped to (−π, π] — a rhumb track takes the
    short way around the anti-meridian."""
    d = (_c(lon2) - _c(lon1)) * F.lit(PI / 180.0)
    two_pi = F.lit(2.0 * PI)
    return F.when(d > F.lit(PI), d - two_pi).when(
        d < F.lit(-PI), d + two_pi
    ).otherwise(d)


def rhumb_bearing_deg(lon1, lat1, lon2, lat2) -> Column:
    """Constant compass course from point 1 to point 2, degrees
    clockwise from north in [0, 360)."""
    rad = F.lit(PI / 180.0)
    dpsi = _dpsi(_c(lat1) * rad, _c(lat2) * rad)
    theta = F.degrees(F.atan2(_dlon_wrapped(lon1, lon2), dpsi))
    return F.when(theta < 0.0, theta + F.lit(360.0)).otherwise(theta)


def rhumb_distance_m(lon1, lat1, lon2, lat2) -> Column:
    """Rhumb distance in meters: √(Δφ² + q²·Δλ²)·R with the Mercator
    stretch q = Δφ/Δψ (→ cos φ1 on constant-latitude tracks)."""
    rad = F.lit(PI / 180.0)
    rlat1, rlat2 = _c(lat1) * rad, _c(lat2) * rad
    dphi = rlat2 - rlat1
    dpsi = _dpsi(rlat1, rlat2)
    # try_divide: ANSI mode errors on /0 even for doubles, and codegen
    # subexpression hoisting can evaluate a branch the when() excludes
    q = F.when(
        F.abs(dpsi) > F.lit(DPSI_EPS), F.try_divide(dphi, dpsi)
    ).otherwise(F.cos(rlat1))
    dlon = _dlon_wrapped(lon1, lon2)
    return F.sqrt(dphi * dphi + q * q * dlon * dlon) * F.lit(R_EARTH)


def rhumb_destination(lon1, lat1, bearing_deg, dist_m) -> tuple[Column, Column]:
    """Destination after sailing ``dist_m`` meters on the constant
    course ``bearing_deg`` — (lon, lat) columns, lon wrapped to
    [−180, 180).  The inverse of bearing+distance: round-trip exact up
    to float math (pytest pins the closure)."""
    rad = F.lit(PI / 180.0)
    rlat1 = _c(lat1) * rad
    theta = _c(bearing_deg) * rad
    delta = _c(dist_m) / F.lit(R_EARTH)
    rlat2 = rlat1 + delta * F.cos(theta)
    dpsi = _dpsi(rlat1, rlat2)
    dphi = rlat2 - rlat1
    q = F.when(
        F.abs(dpsi) > F.lit(DPSI_EPS), F.try_divide(dphi, dpsi)
    ).otherwise(F.cos(rlat1))
    dlon = delta * F.try_divide(F.sin(theta), q)
    lon2 = _c(lon1) + F.degrees(dlon)
    lon2 = F.pmod(lon2 + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)
    return lon2, F.degrees(rlat2)
