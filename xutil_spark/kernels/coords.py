"""WGS-84 / GCJ-02 / BD-09 coordinate transforms, vectorized in numpy.

Numpy transcription of the reference's scalar Go kernels (gis.go:45-144):
same constants, same polynomial + trig series, same 8-decimal
half-away-from-zero rounding of every output (gis.go:99-144 all call
``PointRound8``).  Reference quirks preserved:

* ``gcj2wgs`` is the single-step approximate inverse (subtracts the
  *forward* offset computed at the GCJ point, not iterative) — gis.go:107-112.
* the offset origin is (105°E, 35°N) — gis.go:87-88.

All functions take/return ``np.ndarray`` (or scalars, broadcast by numpy)
of lon/lat in degrees and are branch-free → directly usable inside
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

from xutil_spark.kernels.rounding import point_round8

# Constants from gis.go:45-50.  The _pi literal parses to the same float64
# as math.pi; kept verbatim for fidelity.
PI = 3.14159265358979324
A = 6378245.0  # projection factor (semi-major axis of the GCJ ellipsoid)
EE = 0.00669342162296594323  # eccentricity squared
XPI = PI * 3000.0 / 180.0


def _transform_lon(lon, lat):
    """gis.go:70-76 — GCJ longitude obfuscation series."""
    d = (
        300.0 + lon + 2.0 * lat + 0.1 * lon * lon + 0.1 * lon * lat
        + 0.1 * np.sqrt(np.abs(lon))
        + (20.0 * np.sin(6.0 * lon * PI) + 20.0 * np.sin(2.0 * lon * PI)) * 2.0 / 3.0
        + (20.0 * np.sin(lon * PI) + 40.0 * np.sin(lon / 3.0 * PI)) * 2.0 / 3.0
        + (150.0 * np.sin(lon / 12.0 * PI) + 300.0 * np.sin(lon / 30.0 * PI)) * 2.0 / 3.0
    )
    return d


def _transform_lat(lon, lat):
    """gis.go:78-84 — GCJ latitude obfuscation series."""
    d = (
        -100.0 + 2.0 * lon + 3.0 * lat + 0.2 * lat * lat + 0.1 * lon * lat
        + 0.2 * np.sqrt(np.abs(lon))
        + (20.0 * np.sin(6.0 * lon * PI) + 20.0 * np.sin(2.0 * lon * PI)) * 2.0 / 3.0
        + (20.0 * np.sin(lat * PI) + 40.0 * np.sin(lat / 3.0 * PI)) * 2.0 / 3.0
        + (160.0 * np.sin(lat / 12.0 * PI) + 320.0 * np.sin(lat * PI / 30.0)) * 2.0 / 3.0
    )
    return d


def _offset(lon, lat):
    """gis.go:86-96 — WGS→GCJ delta (dlon, dlat) at (lon, lat)."""
    dlat = _transform_lat(lon - 105.0, lat - 35.0)
    dlon = _transform_lon(lon - 105.0, lat - 35.0)
    rad_lat = lat / 180.0 * PI
    magic = np.sin(rad_lat)
    magic = 1.0 - EE * magic * magic
    sqrt_magic = np.sqrt(magic)
    dlat = (dlat * 180.0) / ((A * (1.0 - EE)) / (magic * sqrt_magic) * PI)
    dlon = (dlon * 180.0) / (A / sqrt_magic * np.cos(rad_lat) * PI)
    return dlon, dlat


def wgs2gcj(lon, lat):
    """WGS-84 → GCJ-02 (gis.go:98-104), rounded to 8 dp."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlon, dlat = _offset(lon, lat)
    return point_round8(lon + dlon, lat + dlat)


def gcj2wgs(lon, lat):
    """GCJ-02 → WGS-84, single-step approximate inverse (gis.go:106-112)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlon, dlat = _offset(lon, lat)
    return point_round8(lon - dlon, lat - dlat)


def gcj2bd(lon, lat):
    """GCJ-02 → BD-09 polar distortion (gis.go:114-122)."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    z = np.sqrt(x * x + y * y) + 0.00002 * np.sin(y * XPI)
    theta = np.arctan2(y, x) + 0.000003 * np.cos(x * XPI)
    bd_lon = z * np.cos(theta) + 0.0065
    bd_lat = z * np.sin(theta) + 0.006
    return point_round8(bd_lon, bd_lat)


def bd2gcj(lon, lat):
    """BD-09 → GCJ-02 inverse (gis.go:124-132)."""
    x = np.asarray(lon, dtype=np.float64) - 0.0065
    y = np.asarray(lat, dtype=np.float64) - 0.006
    z = np.sqrt(x * x + y * y) - 0.00002 * np.sin(y * XPI)
    theta = np.arctan2(y, x) - 0.000003 * np.cos(x * XPI)
    return point_round8(z * np.cos(theta), z * np.sin(theta))


def wgs2bd(lon, lat):
    """WGS-84 → BD-09 composition (gis.go:134-138)."""
    x, y = wgs2gcj(lon, lat)
    return gcj2bd(x, y)


def bd2wgs(lon, lat):
    """BD-09 → WGS-84 composition (gis.go:140-144)."""
    x, y = bd2gcj(lon, lat)
    return gcj2wgs(x, y)
