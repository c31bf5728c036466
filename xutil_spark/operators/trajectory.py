"""Trajectory operators: Google encoded-polyline aggregation and
Douglas-Peucker simplification.

Engine additions beyond the reference (its GIS surface is point
kernels + tiles, gis.go; the nearest idiom is `Geo.Lines`,
geo.go:104-118): a large-scale movement/geo pipeline needs an ordered
per-track representation — polyline strings for compact interchange,
DP simplification to cut vertex counts before rendering / map-matching.

Shape: both are groupBy(traj_id).applyInPandas stages — one shuffle on
the trajectory key, then per-track vectorized numpy.  Tracks are the
natural unit of work (bounded: thousands of points, not billions), so
per-group Python is the honest plan; the per-point math inside each
group is numpy, never a Python-per-row loop.  At 10^12 points the
shuffle partitioning on traj_id is exactly the layout any downstream
per-track stage (map-match, speed profile) wants — the exchange is
reused, not repeated.

Polyline algorithm (public spec: Google Maps "Encoded Polyline
Algorithm Format"): round coordinates to 1e-5, delta-encode
consecutive points, zigzag-shift each delta, emit 5-bit little-endian
chunks +63 with a continuation bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _py_round_half_away(v: np.ndarray) -> np.ndarray:
    """round() half-away-from-zero on scaled coords (the polyline spec
    rounds, not truncates; numpy's banker rounding would drift)."""
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)


def _encode_track(lat: np.ndarray, lon: np.ndarray, precision: int) -> str:
    scale = 10.0 ** precision
    ilat = _py_round_half_away(lat * scale)
    ilon = _py_round_half_away(lon * scale)
    # delta-encode; first delta is the absolute value
    dlat = np.diff(ilat, prepend=0)
    dlon = np.diff(ilon, prepend=0)
    # interleave lat/lon deltas in point order
    deltas = np.empty(2 * len(ilat), dtype=np.int64)
    deltas[0::2] = dlat
    deltas[1::2] = dlon
    # zigzag: left-shift, invert when negative
    z = (deltas << 1) ^ (deltas >> 63)
    out = []
    for v in z.tolist():  # varint loop is per DELTA, chunks <= 7
        while v >= 0x20:
            out.append(chr((0x20 | (v & 0x1F)) + 63))
            v >>= 5
        out.append(chr(v + 63))
    return "".join(out)


def polyline_encode(
    df: DataFrame, traj_col: str = "traj_id", order_col: str = "seq",
    lat_col: str = "lat", lon_col: str = "lon", precision: int = 5,
) -> DataFrame:
    """One encoded-polyline string per trajectory, points taken in
    ``order_col`` order.  Output: (traj_id, n_points, polyline)."""
    schema = T.StructType([
        T.StructField("traj_id", T.LongType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("polyline", T.StringType(), False),
    ])

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        s = _encode_track(pdf[lat_col].to_numpy(np.float64),
                          pdf[lon_col].to_numpy(np.float64), precision)
        return pd.DataFrame({
            "traj_id": [int(key[0])], "n_points": [len(pdf)], "polyline": [s],
        })

    return df.groupBy(traj_col).applyInPandas(run, schema=schema)


def _dp_keep_mask(lat: np.ndarray, lon: np.ndarray, tol_deg: float) -> np.ndarray:
    """Douglas-Peucker keep-mask (iterative stack, planar degrees —
    adequate at track extent ≪ 1 rad; swap in a projected metric for
    polar work).  Per segment the perpendicular distances of ALL
    interior points are one vectorized expression; ties on the max
    pick the first index (np.argmax), matching the scalar oracle."""
    n = len(lat)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        x0, y0, x1, y1 = lon[i], lat[i], lon[j], lat[j]
        xs, ys = lon[i + 1:j], lat[i + 1:j]
        dx, dy = x1 - x0, y1 - y0
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (xs - x0) ** 2 + (ys - y0) ** 2
        else:
            cross = (xs - x0) * dy - (ys - y0) * dx
            d2 = cross * cross / seg2
        m = int(np.argmax(d2))
        if d2[m] > tol_deg * tol_deg:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def douglas_peucker(
    df: DataFrame, tol_deg: float, traj_col: str = "traj_id",
    order_col: str = "seq", lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """Per-trajectory Douglas-Peucker: keeps the endpoints and every
    vertex whose perpendicular deviation exceeds ``tol_deg``.  Output:
    the surviving (traj_id, seq, lon, lat) rows."""
    schema = T.StructType([
        T.StructField("traj_id", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
    ])

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        lat = pdf[lat_col].to_numpy(np.float64)
        lon = pdf[lon_col].to_numpy(np.float64)
        if len(pdf) <= 2:
            keep = np.ones(len(pdf), dtype=bool)
        else:
            keep = _dp_keep_mask(lat, lon, tol_deg)
        return pd.DataFrame({
            "traj_id": np.full(int(keep.sum()), int(key[0]), dtype=np.int64),
            "seq": pdf[order_col].to_numpy(np.int64)[keep],
            "lon": lon[keep],
            "lat": lat[keep],
        })

    return df.groupBy(traj_col).applyInPandas(run, schema=schema)
