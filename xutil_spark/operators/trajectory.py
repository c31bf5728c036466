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

import math

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


def resample_tracks(
    df: DataFrame,
    interval_s: int,
    traj_col: str = "traj_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Time-regular resampling: one interpolated position per track per
    ``interval_s`` seconds — the uniform-Δt track any speed-profile /
    stay-detection / tensorized-trajectory stage wants downstream.

    Sample times are t₀ + k·Δt anchored at each track's own first
    fix; the position at each sample time interpolates linearly
    between the bracketing fixes (piecewise-linear trajectory model).
    Each consecutive fix pair emits the samples in [tᵢ, tᵢ₊₁); the
    final fix emits its own sample iff it lands exactly on the grid —
    so samples never extrapolate beyond the observed track.

    ZERO Python: a lag/lead window on the track key, integer floor-div
    bracket arithmetic on epoch seconds, one ``sequence`` explode, and
    a single linear-interpolation float tree (mirrored verbatim in the
    SQL oracle; rounded to 6 dp).

    100-TB shape: ONE shuffle (the window partition on traj_id — the
    same layout every per-track stage reuses); the explode is output-
    proportional, everything codegen'd.  A hot track (bot with
    millions of fixes) concentrates one partition — pre-split by
    (traj, day) upstream if needed.

    Returns (traj_col, k, t_epoch, lon, lat).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    dt = int(interval_s)
    if dt <= 0:
        raise ValueError("interval_s must be positive")
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(traj_col).orderBy(*order)
    wall = Window.partitionBy(traj_col)
    e = F.unix_timestamp(F.col(ts))
    src = (
        df.withColumn("_e", e)
        .withColumn("_t0", F.min("_e").over(wall))
        .withColumn("_e2", F.lead("_e").over(w))
        .withColumn("_lon2", F.lead(lon).over(w))
        .withColumn("_lat2", F.lead(lat).over(w))
    )
    # samples in [tᵢ, tᵢ₊₁): k_lo = ⌈(tᵢ−t₀)/Δt⌉, k_hi = ⌈(tᵢ₊₁−t₀)/Δt⌉−1
    klo = F.expr(f"(_e - _t0 + {dt} - 1) div {dt}")
    khi_pair = F.expr(f"(_e2 - _t0 - 1) div {dt}")
    # the final fix samples itself iff exactly on the grid
    on_grid = (F.col("_e") - F.col("_t0")) % dt == 0
    # duplicate-timestamp pairs span the empty interval [t, t) and must
    # emit nothing — spelled out because `div` truncates toward zero, so
    # (e2-t0-1) div dt at e2 == t0 would otherwise be 0, not -1, and the
    # leading fix would double-emit k=0
    khi = F.when(
        F.col("_e2").isNotNull(),
        F.when(F.col("_e2") > F.col("_e"), khi_pair).otherwise(klo - 1),
    ).otherwise(F.when(on_grid, klo).otherwise(klo - 1))
    fanned = (
        src.withColumn("_klo", klo).withColumn("_khi", khi)
        .filter(F.col("_khi") >= F.col("_klo"))
        .withColumn("_k", F.explode(F.sequence(F.col("_klo"), F.col("_khi"))))
        .withColumn("_tk", F.col("_t0") + F.col("_k") * dt)
    )
    frac = F.when(
        F.col("_e2").isNotNull() & (F.col("_e2") > F.col("_e")),
        (F.col("_tk") - F.col("_e")).cast("double")
        / (F.col("_e2") - F.col("_e")).cast("double"),
    ).otherwise(F.lit(0.0))
    ilon = F.col(lon) + (F.coalesce(F.col("_lon2"), F.col(lon))
                         - F.col(lon)) * frac
    ilat = F.col(lat) + (F.coalesce(F.col("_lat2"), F.col(lat))
                         - F.col(lat)) * frac
    return fanned.select(
        F.col(traj_col),
        F.col("_k").alias("k"),
        F.col("_tk").alias("t_epoch"),
        (F.round(ilon, 6) + F.lit(0.0)).alias(lon),
        (F.round(ilat, 6) + F.lit(0.0)).alias(lat),
    )


def track_speed_stats(
    df: DataFrame,
    traj_col: str = "traj_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-track movement profile: total distance, max and mean speed
    over the consecutive-fix segments — the QA / feature stage between
    raw trails and any mobility model (implausible-speed filtering,
    activity features).

    Exactness design: each segment's haversine length rounds to integer
    MILLIMETERS and durations are integer seconds, so the per-track
    sums are exact integers under any aggregation order (a raw
    float-meter sum would hash-diverge across partitionings); max
    speed is order-independent by construction.  Segments with zero
    duration (duplicate timestamps) contribute distance but no speed.

    100-TB shape: one lag window shuffle on the track key (the layout
    every per-track stage shares), then ONE map-side-combined groupBy.
    All column arithmetic — no Python.

    Returns (traj_col, n_fixes, n_segs, dist_m, max_speed_mps,
    avg_speed_mps): distance 3 dp, speeds 6 dp; speed fields NULL for
    single-fix or zero-duration-only tracks.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from xutil_spark.functions import native

    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(traj_col).orderBy(*order)
    e = F.unix_timestamp(F.col(ts))
    src = (
        df.withColumn("_e", e)
        .withColumn("_plon", F.lag(lon).over(w))
        .withColumn("_plat", F.lag(lat).over(w))
        .withColumn("_pe", F.lag("_e").over(w))
    )
    d_mm = F.round(
        native.haversine_m(F.col("_plon"), F.col("_plat"),
                           F.col(lon), F.col(lat)) * 1000.0, 0
    ).cast("long")
    dt_s = F.col("_e") - F.col("_pe")
    seg_speed = F.when(
        F.col("_pe").isNotNull() & (dt_s > 0),
        (d_mm.cast("double") / 1000.0) / dt_s.cast("double"),
    )
    agg = (
        src.withColumn("_dmm", F.when(F.col("_pe").isNotNull(), d_mm))
        .withColumn("_dt", F.when(F.col("_pe").isNotNull(), dt_s))
        .withColumn("_sp", seg_speed)
        .groupBy(traj_col)
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.count("_dmm").alias("n_segs"),
            F.sum("_dmm").alias("_summ"),
            F.sum(F.when(F.col("_sp").isNotNull(), F.col("_dmm"))).alias("_mvmm"),
            F.sum(F.when(F.col("_sp").isNotNull(), F.col("_dt"))).alias("_mvs"),
            F.max("_sp").alias("_maxsp"),
        )
    )
    return agg.select(
        traj_col,
        "n_fixes",
        "n_segs",
        F.round(F.coalesce(F.col("_summ"), F.lit(0)).cast("double")
                / 1000.0, 3).alias("dist_m"),
        (F.round(F.col("_maxsp"), 6) + F.lit(0.0)).alias("max_speed_mps"),
        F.when(
            F.col("_mvs") > 0,
            F.round((F.col("_mvmm").cast("double") / 1000.0)
                    / F.col("_mvs").cast("double"), 6) + F.lit(0.0),
        ).alias("avg_speed_mps"),
    )


def _seg_groups(df, traj_col, ts, lon, lat, tiebreak, break_expr_fn):
    """Shared trail-splitting machinery: lag window on the track key,
    a caller-supplied break predicate over (prev, cur), then the
    running sum of break flags numbers the groups.  ROWS frame over a
    UNIQUE ordering (ts, tiebreak) — pass a tiebreak whenever
    timestamps can repeat, otherwise the running sum is frame-
    ambiguous on ties."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(traj_col).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    src = (
        df.withColumn("_e", F.unix_timestamp(F.col(ts)))
        .withColumn("_plon", F.lag(lon).over(w))
        .withColumn("_plat", F.lag(lat).over(w))
        .withColumn("_pe", F.lag(F.unix_timestamp(F.col(ts))).over(w))
    )
    brk = F.col("_pe").isNull() | break_expr_fn(src)
    return src.withColumn("_brk", brk.cast("int")).withColumn(
        "_grp", F.sum("_brk").over(wrun))


def segment_trips(
    df: DataFrame,
    traj_col: str = "traj_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    max_gap_s: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Split each entity's trail into trips at time gaps > ``max_gap_s``
    — the canonical trail → trip-table reduction every mobility
    pipeline starts with (gap splitting per Zheng, "Trajectory Data
    Mining", §3.1; the reference's surface is point kernels only,
    gis.go, so this is an engine addition).

    Exactness design: the trip id is a running SUM over an integer
    break flag on a UNIQUE (ts, tiebreak) ordering, and within-trip
    distance reuses the integer-millimeter segment sums of
    ``track_speed_stats`` — every output is either an exact integer or
    one fixed float expression over exact integers.  The boundary
    segment (the gap that STARTED a trip) belongs to no trip: its
    distance is not counted.

    100-TB shape: one lag-window shuffle on the track key (the shared
    per-track layout), then ONE map-side-combined groupBy at trip
    cardinality.  Zero Python.

    Returns (traj_col, trip_id, n_fixes, start_epoch, end_epoch,
    duration_s, dist_m).
    """
    from pyspark.sql import functions as F

    from xutil_spark.functions import native

    g = _seg_groups(df, traj_col, ts, lon, lat, tiebreak,
                    lambda s: (F.col("_e") - F.col("_pe")) > max_gap_s)
    d_mm = F.round(
        native.haversine_m(F.col("_plon"), F.col("_plat"),
                           F.col(lon), F.col(lat)) * 1000.0, 0
    ).cast("long")
    within = F.when(F.col("_brk") == 0, d_mm)
    agg = (
        g.withColumn("_dmm", within)
        .groupBy(traj_col, F.col("_grp").alias("trip_id"))
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.min("_e").alias("start_epoch"),
            F.max("_e").alias("end_epoch"),
            F.sum("_dmm").alias("_summ"),
        )
    )
    return agg.select(
        traj_col, "trip_id", "n_fixes", "start_epoch", "end_epoch",
        (F.col("end_epoch") - F.col("start_epoch")).alias("duration_s"),
        F.round(F.coalesce(F.col("_summ"), F.lit(0)).cast("double")
                / 1000.0, 3).alias("dist_m"),
    )


def detect_stays(
    df: DataFrame,
    traj_col: str = "traj_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    stay_jump_m: float = 200.0,
    min_stay_s: int = 900,
    tiebreak: str | None = None,
) -> DataFrame:
    """Stay-point extraction: maximal runs of consecutive fixes whose
    step distance stays ≤ ``stay_jump_m`` and whose dwell spans ≥
    ``min_stay_s`` become stays with an exact centroid.

    This is the step-distance reduction of the classic anchor-based
    stay-point scan (Li et al. 2008): a run breaks the moment one
    consecutive step exceeds the jump radius.  Unlike the anchor scan
    it is a pure window + running-sum plan (no sequential per-track
    Python), at the cost of splitting slow drifts whose TOTAL
    displacement exceeds the radius but whose steps don't — the usual
    trade at fleet scale, and deterministic either way.

    Exactness design: the break compares integer millimeters to an
    integer threshold; centroids divide integer micro-degree sums by
    the integer fix count with half-away-from-zero INTEGER rounding
    ((2·|s| + n) div 2n) — a float ROUND here would sit exactly on
    …5×10⁻⁶ ties (the jitter grid is micro-degree) and split between
    engines; the integer quotient cannot.

    Same shape as ``segment_trips``: one window shuffle, one groupBy.
    Returns (traj_col, stay_id, n_fixes, start_epoch, end_epoch,
    dwell_s, ctr_lon, ctr_lat) with centroids rounded to 6 dp.
    """
    from pyspark.sql import functions as F

    from xutil_spark.functions import native

    jump_mm = int(round(stay_jump_m * 1000.0))

    def _brk(s):
        d_mm = F.round(
            native.haversine_m(F.col("_plon"), F.col("_plat"),
                               F.col(lon), F.col(lat)) * 1000.0, 0
        ).cast("long")
        return d_mm > F.lit(jump_mm)

    g = _seg_groups(df, traj_col, ts, lon, lat, tiebreak, _brk)
    ulon = F.round(F.col(lon) * 1e6, 0).cast("long")
    ulat = F.round(F.col(lat) * 1e6, 0).cast("long")
    agg = (
        g.withColumn("_ulon", ulon).withColumn("_ulat", ulat)
        .groupBy(traj_col, F.col("_grp").alias("stay_id"))
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.min("_e").alias("start_epoch"),
            F.max("_e").alias("end_epoch"),
            F.sum("_ulon").alias("_slon"),
            F.sum("_ulat").alias("_slat"),
        )
        .withColumn("dwell_s", F.col("end_epoch") - F.col("start_epoch"))
        .filter(F.col("dwell_s") >= min_stay_s)
    )

    def ctr(s: str):
        q = F.expr(f"(2 * abs({s}) + n_fixes) div (2 * n_fixes)")
        u = F.when(F.col(s) < 0, -q).otherwise(q)
        return u.cast("double") / F.lit(1000000.0)

    return agg.select(
        traj_col, "stay_id", "n_fixes", "start_epoch", "end_epoch",
        "dwell_s", ctr("_slon").alias("ctr_lon"), ctr("_slat").alias("ctr_lat"),
    )


def track_bearing_stats(
    df: DataFrame,
    traj_col: str = "traj_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-track directional profile: circular-mean heading, resultant
    length, total turning, and path straightness — the movement-
    behavior feature block (migration vs foraging vs commuting) every
    trajectory-mining pipeline computes after :func:`track_speed_stats`
    (Batschelet, "Circular Statistics in Biology", ch. 1-2).

    Per moving segment (consecutive fixes at distinct coordinates) the
    initial great-circle bearing θ comes from the standard
    atan2(sin Δλ·cos φ₂, cos φ₁ sin φ₂ − sin φ₁ cos φ₂ cos Δλ) tree
    (engine addition — the reference's Azimuth quirk, gis.go:177-179,
    is preserved separately in kernels/distance.py).

    Exactness design (the integer-sum rule): per-segment sin θ / cos θ
    round to 1e-8 integers and bearings to integer MICRO-DEGREES, so
    every per-track sum is exact under any aggregation order, and turn
    angles are pure integer arithmetic over the rounded bearings —
    ((Δbu + 540e6) mod 360e6) − 180e6.  The only floats are fixed
    trees over those integers:

        mean_heading_deg = degrees(atan2(S, C)) wrapped to [0, 360)
        resultant_r      = √(S² + C²) / (10⁸ · n_segs)   (0 ≤ r ≤ 1)
        straightness     = net_mm / path_mm              (first→last
                           haversine over the summed segment mm)

    Previous bearing uses last(ignorenulls) over rows-to-−1 so zero-
    length segments (undefined bearing) don't break turn chains.

    100-TB shape: ONE lag-window shuffle on the track key (the shared
    per-track layout), then ONE map-side-combined groupBy.  Zero
    Python.  Returns (traj_col, n_fixes, n_segs, mean_heading_deg,
    resultant_r, n_turns, sum_abs_turn_deg, straightness); circular
    fields NULL when no moving segment exists, straightness NULL when
    the path length is zero.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from xutil_spark.functions import native

    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(traj_col).orderBy(*order)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    rad = math.pi / 180.0
    src = (
        df.withColumn("_pl", F.lag(lon).over(w))
        .withColumn("_pf", F.lag(lat).over(w))
        .withColumn("_rn", F.row_number().over(w))
    )
    moving = F.col("_pl").isNotNull() & (
        (F.col("_pl") != F.col(lon)) | (F.col("_pf") != F.col(lat)))
    dlon = (F.col(lon) - F.col("_pl")) * rad
    la1 = F.col("_pf") * rad
    la2 = F.col(lat) * rad
    y = F.sin(dlon) * F.cos(la2)
    x = (F.cos(la1) * F.sin(la2) - F.sin(la1) * F.cos(la2) * F.cos(dlon))
    b = F.degrees(F.atan2(y, x))
    b = F.when(b < 0.0, b + 360.0).otherwise(b)
    bu = F.round(b * 1e6, 0).cast("long") % F.lit(360000000).cast("long")
    hyp = F.sqrt(x * x + y * y)
    s_i = F.round(y / hyp * 1e8, 0).cast("long")
    c_i = F.round(x / hyp * 1e8, 0).cast("long")
    d_mm = F.round(
        native.haversine_m(F.col("_pl"), F.col("_pf"),
                           F.col(lon), F.col(lat)) * 1000.0, 0
    ).cast("long")
    src = (
        src.withColumn("_bu", F.when(moving, bu))
        .withColumn("_si", F.when(moving, s_i))
        .withColumn("_ci", F.when(moving, c_i))
        .withColumn("_dmm", F.when(F.col("_pl").isNotNull(), d_mm))
    )
    pbu = F.last("_bu", ignorenulls=True).over(wprev)
    turn = F.when(
        F.col("_bu").isNotNull() & pbu.isNotNull(),
        (F.col("_bu") - pbu + F.lit(540000000).cast("long"))
        % F.lit(360000000).cast("long") - F.lit(180000000).cast("long"),
    )
    agg = (
        src.withColumn("_turn", turn)
        .groupBy(traj_col)
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.count("_bu").alias("n_segs"),
            F.sum("_si").alias("_s"),
            F.sum("_ci").alias("_c"),
            F.count("_turn").alias("n_turns"),
            F.sum(F.abs(F.col("_turn"))).alias("_tsum"),
            F.sum("_dmm").alias("_pathmm"),
            F.max(F.when(F.col("_rn") == 1, F.col(lon))).alias("_flon"),
            F.max(F.when(F.col("_rn") == 1, F.col(lat))).alias("_flat"),
            F.max_by(F.col(lon), F.col("_rn")).alias("_llon"),
            F.max_by(F.col(lat), F.col("_rn")).alias("_llat"),
        )
    )
    mh = F.degrees(F.atan2(F.col("_s").cast("double"),
                           F.col("_c").cast("double")))
    mh = F.when(mh < 0.0, mh + 360.0).otherwise(mh)
    net_mm = F.round(
        native.haversine_m(F.col("_flon"), F.col("_flat"),
                           F.col("_llon"), F.col("_llat")) * 1000.0, 0
    ).cast("long")
    has = (F.col("n_segs") > 0) & ((F.col("_s") != 0) | (F.col("_c") != 0))
    return agg.select(
        traj_col, "n_fixes", "n_segs",
        F.when(has, F.round(mh, 6) + F.lit(0.0)).alias("mean_heading_deg"),
        F.when(
            F.col("n_segs") > 0,
            F.round(
                F.sqrt(F.col("_s").cast("double") * F.col("_s").cast("double")
                       + F.col("_c").cast("double")
                       * F.col("_c").cast("double"))
                / (1e8 * F.col("n_segs").cast("double")), 6) + F.lit(0.0),
        ).alias("resultant_r"),
        "n_turns",
        F.round(F.coalesce(F.col("_tsum"), F.lit(0)).cast("double")
                / 1e6, 6).alias("sum_abs_turn_deg"),
        F.when(
            F.coalesce(F.col("_pathmm"), F.lit(0)) > 0,
            F.round(net_mm.cast("double")
                    / F.col("_pathmm").cast("double"), 6) + F.lit(0.0),
        ).alias("straightness"),
    )


def resample_by_distance(
    df: DataFrame,
    step_m: float,
    traj_col: str = "traj_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
    geodesic: bool = False,
) -> DataFrame:
    """Linear referencing: one interpolated position per track every
    ``step_m`` meters ALONG the route — the distance-domain twin of
    ``resample_tracks`` (uniform-Δs instead of uniform-Δt), the
    classic ST_LineInterpolatePoint sweep for corridor profiling and
    route tiling.

    Exactness design (the track_speed_stats idea): every segment's
    haversine length rounds to integer MILLIMETERS first, so the
    running along-track chainage is exact integer arithmetic and the
    sample bracketing reuses ``resample_tracks``'s integer floor-div
    scheme verbatim — each consecutive fix pair emits the samples in
    [cᵢ, cᵢ₊₁) of cumulative chainage, the final fix emits its own
    sample iff the total lands exactly on the grid.  Fractions along a
    segment are one integer-ratio double; positions interpolate
    linearly in lon/lat (the engine-wide plate-carrée segment model).

    ZERO Python: lead window + integer running sum + ``sequence``
    explode + one interpolation float tree (mirrored verbatim in SQL).
    100-TB shape: ONE shuffle (the per-track window layout); the
    explode is output-proportional.  Zero-length segments (duplicate
    fixes) emit nothing; their chainage is carried by the next segment.

    Returns (traj_col, k, s_mm, lon, lat) with s_mm = k·step·1000.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from xutil_spark.functions import native

    step_mm = int(round(step_m * 1000.0))
    if step_mm <= 0:
        raise ValueError("step_m must be positive")
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(traj_col).orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    src = (
        df.withColumn("_lon2", F.lead(lon).over(w))
        .withColumn("_lat2", F.lead(lat).over(w))
    )
    d_mm = F.round(
        native.haversine_m(F.col(lon), F.col(lat),
                           F.col("_lon2"), F.col("_lat2")) * 1000.0, 0
    ).cast("long")
    src = (
        src.withColumn("_dmm", F.coalesce(d_mm, F.lit(0).cast("long")))
        .withColumn("_cend", F.sum("_dmm").over(wsum))
        .withColumn("_c0", F.col("_cend") - F.col("_dmm"))
    )
    klo = F.expr(f"(_c0 + {step_mm} - 1) div {step_mm}")
    khi_pair = F.expr(f"(_cend - 1) div {step_mm}")
    on_grid = F.col("_c0") % step_mm == 0
    # zero-length segments span the empty chainage range [c, c) and must
    # emit nothing — spelled out because `div` truncates toward zero, so
    # (cend-1) div step at cend == 0 would otherwise be 0, not -1
    khi = F.when(
        F.col("_lon2").isNotNull(),
        F.when(F.col("_cend") > F.col("_c0"), khi_pair).otherwise(klo - 1),
    ).otherwise(F.when(on_grid, klo).otherwise(klo - 1))
    fanned = (
        src.withColumn("_klo", klo).withColumn("_khi", khi)
        .filter(F.col("_khi") >= F.col("_klo"))
        .withColumn("_k", F.explode(F.sequence(F.col("_klo"), F.col("_khi"))))
        .withColumn("_smm", F.col("_k") * step_mm)
    )
    live = F.col("_lon2").isNotNull() & (F.col("_cend") > F.col("_c0"))
    frac = F.when(
        live,
        (F.col("_smm") - F.col("_c0")).cast("double")
        / (F.col("_cend") - F.col("_c0")).cast("double"),
    ).otherwise(F.lit(0.0))
    if geodesic:
        # great-circle slerp between the fixes (the geodesic twin of
        # the plate-carrée default — flight/shipping routes): unit
        # vectors weighted sin((1-f)d)/sin d and sin(f d)/sin d, d the
        # central angle.  Live rows have dmm ≥ 1 ⇒ d > 0 ⇒ sin d > 0;
        # non-live rows keep the fix itself (mirrored in the oracle).
        p1, l1 = F.radians(F.col(lat)), F.radians(F.col(lon))
        p2 = F.radians(F.coalesce(F.col("_lat2"), F.col(lat)))
        l2 = F.radians(F.coalesce(F.col("_lon2"), F.col(lon)))
        from xutil_spark.functions import native

        d = native.haversine_m(F.col(lon), F.col(lat),
                               F.coalesce(F.col("_lon2"), F.col(lon)),
                               F.coalesce(F.col("_lat2"), F.col(lat))
                               ) / F.lit(6371000.0)
        a = F.sin((F.lit(1.0) - frac) * d) / F.sin(d)
        bb = F.sin(frac * d) / F.sin(d)
        xx = a * F.cos(p1) * F.cos(l1) + bb * F.cos(p2) * F.cos(l2)
        yy = a * F.cos(p1) * F.sin(l1) + bb * F.cos(p2) * F.sin(l2)
        zz = a * F.sin(p1) + bb * F.sin(p2)
        ilon = F.when(live, F.degrees(F.atan2(yy, xx))).otherwise(
            F.col(lon))
        ilat = F.when(live, F.degrees(
            F.atan2(zz, F.sqrt(xx * xx + yy * yy)))).otherwise(F.col(lat))
        return fanned.select(
            F.col(traj_col),
            F.col("_k").alias("k"),
            F.col("_smm").alias("s_mm"),
            (F.round(ilon, 6) + F.lit(0.0)).alias(lon),
            (F.round(ilat, 6) + F.lit(0.0)).alias(lat),
        )
    ilon = F.col(lon) + (F.coalesce(F.col("_lon2"), F.col(lon))
                         - F.col(lon)) * frac
    ilat = F.col(lat) + (F.coalesce(F.col("_lat2"), F.col(lat))
                         - F.col(lat)) * frac
    return fanned.select(
        F.col(traj_col),
        F.col("_k").alias("k"),
        F.col("_smm").alias("s_mm"),
        (F.round(ilon, 6) + F.lit(0.0)).alias(lon),
        (F.round(ilat, 6) + F.lit(0.0)).alias(lat),
    )
