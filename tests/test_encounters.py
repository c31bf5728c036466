"""encounter_join (spatiotemporal co-location) vs brute force.

The bucketed (cell, time-bucket) candidate generation must be EXACT:
every event pair within (radius, window) surfaces exactly once, none
beyond survive, and the per-pair aggregates match a dense numpy
reference.
"""

import numpy as np
import pandas as pd
import pytest

from xutil_spark.kernels.distance import point_dist_haversine


def _brute(pdf, radius_m, window_s):
    """Dense all-pairs reference: dict (ua, ub) -> [count, min_dist]."""
    out = {}
    n = len(pdf)
    lon = pdf["lon"].to_numpy(float)
    lat = pdf["lat"].to_numpy(float)
    ep = pdf["ep"].to_numpy(np.int64)
    ent = pdf["user_id"].to_numpy(np.int64)
    for i in range(n):
        d = point_dist_haversine(lon[i], lat[i], lon, lat)
        ok = (
            (np.abs(ep - ep[i]) <= window_s)
            & (d <= radius_m)
            & (ent != ent[i])
        )
        ok[: i + 1] = False  # each unordered event pair once
        for j in np.nonzero(ok)[0]:
            key = (min(ent[i], ent[j]), max(ent[i], ent[j]))
            cur = out.setdefault(key, [0, np.inf])
            cur[0] += 1
            cur[1] = min(cur[1], float(d[j]))
    return out


@pytest.mark.parametrize("radius,window", [(100_000.0, 86_400),
                                           (40_000.0, 3_600)])
def test_encounter_join_matches_brute(spark, radius, window):
    from xutil_spark.operators.encounters import encounter_join

    rng = np.random.default_rng(int(radius) % 9973)
    n = 900
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 40, n),
        # clustered so pairs actually happen: 6 hotspots + noise
        "lon": np.concatenate([
            rng.normal(rng.uniform(75, 130), 0.6, n // 2),
            rng.uniform(73, 134, n - n // 2)]),
        "lat": np.concatenate([
            rng.normal(rng.uniform(20, 50), 0.5, n // 2),
            rng.uniform(18, 53, n - n // 2)]),
        "ep": rng.integers(1_700_000_000, 1_700_000_000 + 14 * 86_400, n),
    })
    from pyspark.sql import functions as F
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.timestamp_seconds(F.col("ep")))

    got = {(r["entity_a"], r["entity_b"]): (r["n_encounters"], r["min_dist_m"])
           for r in encounter_join(
               sdf, radius_m=radius, window_s=window).collect()}
    want = _brute(pdf, radius, window)
    assert set(got) == set(want)
    assert len(want) >= 5  # the shape actually exercises matches
    for key, (cnt, dmin) in want.items():
        g = got[key]
        assert g[0] == cnt, (key, g, cnt)
        assert g[1] == pytest.approx(round(dmin, 3), abs=1e-6), key


def test_pick_encounter_zoom_monotone():
    from xutil_spark.operators.encounters import pick_encounter_zoom
    from xutil_spark.operators.spatial_join import _ring_guarantee_m

    for r in (500.0, 5_000.0, 100_000.0, 800_000.0):
        z = pick_encounter_zoom(r)
        assert _ring_guarantee_m(z, 1) >= r
        if z < 30:
            assert _ring_guarantee_m(z + 1, 1) < r


def test_encounter_negative_epoch_floor_bucket(spark):
    """Pre-1970 timestamps: floor (not truncate-toward-zero) bucketing
    keeps the |Δt| ≤ W ⇒ bucket-diff ≤ 1 coverage argument true."""
    from pyspark.sql import functions as F

    from xutil_spark.operators.encounters import encounter_join

    pdf = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [1, 2],
        "lon": [100.0, 100.001],
        "lat": [30.0, 30.0],
        # straddle a bucket boundary just below zero: -1 and +1 seconds
        "ep": [-1, 1],
    })
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.timestamp_seconds(F.col("ep")))
    out = encounter_join(sdf, radius_m=1_000.0, window_s=10).collect()
    assert len(out) == 1 and out[0]["n_encounters"] == 1
