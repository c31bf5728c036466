"""Great-circle distance / bearing / midpoint / destination kernels.

Numpy transcription of gis.go:156-249 with quirks preserved:

* ``azimuth`` adds 2π only when dLon < 0 (gis.go:177-179) — NOT the
  standard ``(θ+360) % 360`` normalization.
* ``point_at`` normalizes the angular distance by the GCJ projection
  factor ``A = 6378245`` (gis.go:238), not the 6371000 m radius the
  distance kernels use, and wraps λ2 into [0, 2π) (gis.go:243-245).
* distance kernels use R = 6,371,000 m (gis.go:185, gis.go:197).
"""

from __future__ import annotations

import numpy as np

R_EARTH = 6371000.0  # gis.go:185
A = 6378245.0  # gis.go:47 — used (only) by point_at, gis.go:238
RAD = np.pi / 180.0


def azimuth(lon1, lat1, lon2, lat2):
    """Initial bearing P1→P2 in degrees (gis.go:166-181)."""
    lon1 = np.asarray(lon1, dtype=np.float64) * RAD
    lat1 = np.asarray(lat1, dtype=np.float64) * RAD
    lon2 = np.asarray(lon2, dtype=np.float64) * RAD
    lat2 = np.asarray(lat2, dtype=np.float64) * RAD
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    a = np.arctan2(y, x)
    a = np.where(dlon < 0, a + 2.0 * np.pi, a)  # reference quirk gis.go:177-179
    return a * 180.0 / np.pi


def point_distance(lon1, lat1, lon2, lat2):
    """Spherical law-of-cosines distance in meters (gis.go:183-193)."""
    lon1 = np.asarray(lon1, dtype=np.float64) * RAD
    lat1 = np.asarray(lat1, dtype=np.float64) * RAD
    lon2 = np.asarray(lon2, dtype=np.float64) * RAD
    lat2 = np.asarray(lat2, dtype=np.float64) * RAD
    theta = lon2 - lon1
    # clip guards acos from 1+ulp arguments on identical points; the
    # reference relies on Go math.Acos returning NaN there — we keep NaN
    # out of join keys by clipping, documented divergence for the exact
    # antipodal/identical corner only.
    c = np.sin(lat1) * np.sin(lat2) + np.cos(lat1) * np.cos(lat2) * np.cos(theta)
    return R_EARTH * np.arccos(np.clip(c, -1.0, 1.0))


def point_dist_haversine(lon1, lat1, lon2, lat2):
    """Haversine distance in meters (gis.go:195-206) — primary kNN kernel."""
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    dlat = (lat2 - lat1) * RAD
    dlon = (lon2 - lon1) * RAD
    rlat1 = lat1 * RAD
    rlat2 = lat2 * RAD
    a = (
        np.sin(dlat / 2.0) * np.sin(dlat / 2.0)
        + np.sin(dlon / 2.0) * np.sin(dlon / 2.0) * np.cos(rlat1) * np.cos(rlat2)
    )
    c = 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
    return R_EARTH * c


def point_mid(lon1, lat1, lon2, lat2):
    """Great-circle midpoint (gis.go:208-220), degrees out."""
    l1 = np.asarray(lon1, dtype=np.float64) * RAD
    l2 = np.asarray(lon2, dtype=np.float64) * RAD
    p1 = np.asarray(lat1, dtype=np.float64) * RAD
    p2 = np.asarray(lat2, dtype=np.float64) * RAD
    bx = np.cos(p2) * np.cos(l2 - l1)
    by = np.cos(p2) * np.sin(l2 - l1)
    p3 = np.arctan2(
        np.sin(p1) + np.sin(p2),
        np.sqrt((np.cos(p1) + bx) * (np.cos(p1) + bx) + by * by),
    )
    l3 = l1 + np.arctan2(by, np.cos(p1) + bx)
    return l3 / RAD, p3 / RAD


def point_at(lon, lat, dist, az):
    """Destination point from (origin, distance m, bearing°) — gis.go:222-249.

    Preserves the reference's use of A=6378245 as the normalizing radius
    (gis.go:238) and the [0, 2π) longitude wrap (gis.go:243-245).
    """
    p1 = np.asarray(lat, dtype=np.float64) * RAD
    l1 = np.asarray(lon, dtype=np.float64) * RAD
    theta = np.asarray(az, dtype=np.float64) * RAD
    delta = np.asarray(dist, dtype=np.float64) / A
    p2 = np.arcsin(
        np.sin(p1) * np.cos(delta) + np.cos(p1) * np.sin(delta) * np.cos(theta)
    )
    l2 = l1 + np.arctan2(
        np.sin(theta) * np.sin(delta) * np.cos(p1),
        np.cos(delta) - np.sin(p1) * np.sin(p2),
    )
    l2 = np.where(l2 < 0, l2 + 2.0 * np.pi, l2)
    return l2 / RAD, p2 / RAD
