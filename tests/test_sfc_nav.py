"""Quadkey / Hilbert-curve addressing and rhumb-line navigation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from xutil_spark.kernels import hilbert as KH

R = 6371000.0


# ---------------------------------------------------------------- hilbert


def test_hilbert_z1_base_order():
    x = np.array([0, 0, 1, 1])
    y = np.array([0, 1, 1, 0])
    assert KH.xy2d(x, y, 1).tolist() == [0, 1, 2, 3]


def test_hilbert_z2_canonical_walk():
    # the classic 4×4 curve: U-shapes with rotated first/last quadrants
    walk = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3), (1, 2),
            (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1), (2, 0), (3, 0)]
    xs = np.array([p[0] for p in walk])
    ys = np.array([p[1] for p in walk])
    assert KH.xy2d(xs, ys, 2).tolist() == list(range(16))


@pytest.mark.parametrize("z", [1, 2, 3, 5, 8])
def test_hilbert_bijection_and_locality(z):
    n = 1 << z
    d = np.arange(n * n, dtype=np.int64)
    x, y = KH.d2xy(d, z)
    # bijection: every cell hit exactly once, xy2d inverts d2xy
    assert len(set(zip(x.tolist(), y.tolist()))) == n * n
    assert KH.xy2d(x, y, z).tolist() == d.tolist()
    # THE Hilbert property: consecutive d are 4-neighbors (no seam
    # jumps — the locality Morton/geohash lack)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert step.max() == 1


def test_hilbert_sql_matches_kernel(spark):
    import duckdb

    z = 6
    rng = np.random.default_rng(42)
    x = rng.integers(0, 1 << z, 200)
    y = rng.integers(0, 1 << z, 200)
    want = KH.xy2d(x, y, z)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES %s) AS v(i, x, y)"
                % ",".join(f"({i},{a},{b})"
                           for i, (a, b) in enumerate(zip(x, y))))
    ctes, last = KH.xy2d_sql("x", "y", z, "t")
    got = con.execute(
        f"WITH {ctes} SELECT hd FROM {last} ORDER BY i"
    ).df()["hd"].to_numpy()
    assert got.tolist() == want.tolist()


# ---------------------------------------------------------------- quadkey


def test_quadkey_known_vector(spark):
    # Bing tile-system doc example: tile (3, 5) at level 3 → "213"
    from pyspark.sql import functions as F

    from xutil_spark.functions.quadkey import quadkey_from_xy, quadkey_to_xy

    df = spark.createDataFrame([(3, 5)], "x long, y long")
    out = df.select(quadkey_from_xy("x", "y", 3).alias("qk")).collect()
    assert out[0].qk == "213"
    xs, ys = quadkey_to_xy(F.lit("213"), 3)
    r = df.select(xs.alias("x2"), ys.alias("y2")).collect()[0]
    assert (r.x2, r.y2) == (3, 5)


def test_quadkey_roundtrip_and_prefix(spark):
    from pyspark.sql import functions as F

    from xutil_spark.functions.quadkey import quadkey_from_xy, quadkey_to_xy

    rng = np.random.default_rng(7)
    z = 12
    rows = [(int(a), int(b)) for a, b in
            zip(rng.integers(0, 1 << z, 50), rng.integers(0, 1 << z, 50))]
    df = spark.createDataFrame(rows, "x long, y long")
    qk = df.select("x", "y", quadkey_from_xy("x", "y", z).alias("qk"))
    x2, y2 = quadkey_to_xy(F.col("qk"), z)
    chk = qk.select(
        (F.length("qk") == z).alias("len_ok"),
        (x2 == F.col("x")).alias("x_ok"), (y2 == F.col("y")).alias("y_ok"),
        # qk[:z-1] is the parent tile's quadkey — the ancestor-chain
        # property that makes prefix scans hierarchical
        (F.substring("qk", 1, z - 1)
         == quadkey_from_xy(F.floor(F.col("x") / 2).cast("long"),
                            F.floor(F.col("y") / 2).cast("long"), z - 1)
         ).alias("parent_ok"),
    ).collect()
    assert all(r.len_ok and r.x_ok and r.y_ok and r.parent_ok for r in chk)


def test_quadkey_sql_matches_spark(spark):
    import duckdb

    from xutil_spark.functions.quadkey import quadkey_from_xy, quadkey_sql

    rng = np.random.default_rng(3)
    z = 9
    rows = [(int(a), int(b)) for a, b in
            zip(rng.integers(0, 1 << z, 64), rng.integers(0, 1 << z, 64))]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [r.qk for r in
           df.select(quadkey_from_xy("x", "y", z).alias("qk")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES %s) AS v(i, x, y)"
                % ",".join(f"({i},{a},{b})" for i, (a, b) in enumerate(rows)))
    want = con.execute(
        f"SELECT {quadkey_sql('x', 'y', z)} FROM t ORDER BY i"
    ).df().iloc[:, 0].tolist()
    assert got == want


# ------------------------------------------------------------------ rhumb


def _one(spark, expr_cols, row=(0,)):
    df = spark.createDataFrame([row], "i long")
    return df.select(*expr_cols).collect()[0]


def test_rhumb_due_east_on_equator(spark):
    from pyspark.sql import functions as F

    from xutil_spark.functions.rhumb import rhumb_bearing_deg, rhumb_distance_m

    r = _one(spark, [
        rhumb_bearing_deg(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0))
        .alias("b"),
        rhumb_distance_m(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0))
        .alias("d"),
    ])
    assert r.b == pytest.approx(90.0, abs=1e-9)
    assert r.d == pytest.approx(R * math.pi / 180.0, rel=1e-12)


def test_rhumb_due_north(spark):
    from pyspark.sql import functions as F

    from xutil_spark.functions.rhumb import rhumb_bearing_deg, rhumb_distance_m

    r = _one(spark, [
        rhumb_bearing_deg(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(21.0))
        .alias("b"),
        rhumb_distance_m(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(21.0))
        .alias("d"),
    ])
    assert r.b == pytest.approx(0.0, abs=1e-9)
    # along a meridian rhumb = great circle
    assert r.d == pytest.approx(R * math.pi / 180.0, rel=1e-12)


def test_rhumb_constant_latitude_uses_cos(spark):
    from pyspark.sql import functions as F

    from xutil_spark.functions.rhumb import rhumb_distance_m

    r = _one(spark, [
        rhumb_distance_m(F.lit(100.0), F.lit(60.0), F.lit(101.0), F.lit(60.0))
        .alias("d"),
    ])
    assert r.d == pytest.approx(R * math.pi / 180.0 * math.cos(math.radians(60.0)),
                                rel=1e-9)


def test_rhumb_antimeridian_wrap(spark):
    from pyspark.sql import functions as F

    from xutil_spark.functions.rhumb import rhumb_bearing_deg, rhumb_distance_m

    r = _one(spark, [
        rhumb_bearing_deg(F.lit(179.5), F.lit(10.0), F.lit(-179.5), F.lit(10.0))
        .alias("b"),
        rhumb_distance_m(F.lit(179.5), F.lit(10.0), F.lit(-179.5), F.lit(10.0))
        .alias("d"),
    ])
    assert r.b == pytest.approx(90.0, abs=1e-9)  # short way east, not 359° west
    assert r.d == pytest.approx(R * math.pi / 180.0 * math.cos(math.radians(10.0)),
                                rel=1e-9)


def test_rhumb_destination_roundtrip(spark):
    from pyspark.sql import functions as F

    from xutil_spark.functions.rhumb import (
        rhumb_bearing_deg,
        rhumb_destination,
        rhumb_distance_m,
    )

    lon1, lat1, brg, dist = 121.47, 31.23, 73.5, 500_000.0
    dlon, dlat = rhumb_destination(F.lit(lon1), F.lit(lat1), F.lit(brg),
                                   F.lit(dist))
    r = _one(spark, [dlon.alias("lon2"), dlat.alias("lat2")])
    back = _one(spark, [
        rhumb_bearing_deg(F.lit(lon1), F.lit(lat1), F.lit(r.lon2),
                          F.lit(r.lat2)).alias("b"),
        rhumb_distance_m(F.lit(lon1), F.lit(lat1), F.lit(r.lon2),
                         F.lit(r.lat2)).alias("d"),
    ])
    assert back.b == pytest.approx(brg, abs=1e-6)
    assert back.d == pytest.approx(dist, rel=1e-9)
