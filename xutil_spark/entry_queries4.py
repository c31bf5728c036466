"""Driver-contract queries, batch 4: the INVERSE coordinate transforms
(gis.go:106-144, 269-275, 294-306), each oracle-paired — closing the
§2.4 conversion-matrix oracle gap.  The forward directions
(wgs2gcj/wgs2bd/baidu_mercator) are covered in batches 1/3; these are
the other half of the matrix: GCJ→WGS, BD→GCJ, BD→WGS, Mercator→BD09,
tile→WGS.

Oracle-parity rules as everywhere: identical column aliases, ROUND'd
float outputs, integer-deterministic derived inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xutil_spark.entry_queries import _PTS_SQL, _points, _utc

# ------------------------------------------------------------ shared SQL

# WGS↔GCJ offset pipeline (gis.go:70-96) as reusable CTE text: computes
# dlon/dlat at (lon, lat).  `sign` = +1 forward (wgs2gcj), -1 inverse
# (gcj2wgs — the reference's single-step approximate inverse,
# gis.go:106-112: subtract the FORWARD offset evaluated at the GCJ point).


def _offset_sql(src_cte: str, sign: str, out_lon: str, out_lat: str) -> str:
    tlon = (
        "300.0 + x + 2.0*y + 0.1*x*x + 0.1*x*y + 0.1*sqrt(abs(x))"
        " + (20.0*sin(6.0*x*pi()) + 20.0*sin(2.0*x*pi())) * 2.0/3.0"
        " + (20.0*sin(x*pi()) + 40.0*sin(x/3.0*pi())) * 2.0/3.0"
        " + (150.0*sin(x/12.0*pi()) + 300.0*sin(x/30.0*pi())) * 2.0/3.0"
    )
    tlat = (
        "-100.0 + 2.0*x + 3.0*y + 0.2*y*y + 0.1*x*y + 0.2*sqrt(abs(x))"
        " + (20.0*sin(6.0*x*pi()) + 20.0*sin(2.0*x*pi())) * 2.0/3.0"
        " + (20.0*sin(y*pi()) + 40.0*sin(y/3.0*pi())) * 2.0/3.0"
        " + (160.0*sin(y/12.0*pi()) + 320.0*sin(y*pi()/30.0)) * 2.0/3.0"
    )
    return f"""
xy AS (SELECT pid, lon, lat, lon - 105.0 AS x, lat - 35.0 AS y FROM {src_cte}),
t AS (SELECT pid, lon, lat, ({tlon}) AS dlon0, ({tlat}) AS dlat0,
             lat / 180.0 * pi() AS radlat FROM xy),
m AS (SELECT pid, lon, lat, dlon0, dlat0, radlat,
             1.0 - 0.00669342162296594323 * sin(radlat) * sin(radlat) AS magic
      FROM t),
res AS (SELECT pid,
  ROUND(lon {sign} (dlon0 * 180.0) / (6378245.0 / sqrt(magic) * cos(radlat) * pi()), 8) AS {out_lon},
  ROUND(lat {sign} (dlat0 * 180.0) / ((6378245.0 * (1.0 - 0.00669342162296594323))
        / (magic * sqrt(magic)) * pi()), 8) AS {out_lat}
  FROM m)"""


# BD09→GCJ02 (gis.go:124-132): x=lon-0.0065, y=lat-0.006,
# z=√(x²+y²) − 2e-5·sin(y·xπ), θ=atan2(y,x) − 3e-6·cos(x·xπ).
_BD2GCJ_SQL = """
d AS (SELECT pid, lon - 0.0065 AS bx, lat - 0.006 AS by FROM {src}),
zt AS (SELECT pid, bx, by,
       sqrt(bx*bx + by*by) - 0.00002 * sin(by * (pi() * 3000.0 / 180.0)) AS z,
       atan2(by, bx) - 0.000003 * cos(bx * (pi() * 3000.0 / 180.0)) AS theta
       FROM d),
gcj AS (SELECT pid, ROUND(z * cos(theta), 8) AS {glon},
                    ROUND(z * sin(theta), 8) AS {glat} FROM zt)"""


# ------------------------------------------------------------- gcj2wgs


def q_gcj2wgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GCJ-02 → WGS-84 single-step approximate inverse (gis.go:106-112):
    subtracts the forward offset evaluated AT the GCJ point (not
    iterative) — reference quirk preserved; 8-dp half-away outputs."""
    _utc(spark)
    from xutil_spark.functions import geo_udfs

    pts = _points(spark, sf_dir)
    g = geo_udfs.gcj2wgs(F.col("lon"), F.col("lat"))
    return pts.select(
        "pid",
        g.getField("lon").alias("wlon"),
        g.getField("lat").alias("wlat"),
    )


def o_gcj2wgs() -> str:
    return f"""
WITH pts AS ({_PTS_SQL}),
{_offset_sql("pts", "-", "wlon", "wlat")}
SELECT pid, {"wlon"}, {"wlat"} FROM res
"""


# ------------------------------------------------------------- bd2gcj


def q_bd2gcj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BD-09 → GCJ-02 polar-distortion inverse (gis.go:124-132)."""
    _utc(spark)
    from xutil_spark.functions import geo_udfs

    pts = _points(spark, sf_dir)
    g = geo_udfs.bd2gcj(F.col("lon"), F.col("lat"))
    return pts.select(
        "pid",
        g.getField("lon").alias("glon"),
        g.getField("lat").alias("glat"),
    )


def o_bd2gcj() -> str:
    body = _BD2GCJ_SQL.format(src="pts", glon="glon", glat="glat")
    return f"""
WITH pts AS ({_PTS_SQL}),
{body}
SELECT pid, glon, glat FROM gcj
"""


# ------------------------------------------------------------- bd2wgs


def q_bd2wgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BD-09 → WGS-84 composition (gis.go:140-144): bd2gcj (8-dp
    rounded) then gcj2wgs of the ROUNDED intermediate — stage-wise
    rounding exactly as the reference composes PointRound8 calls."""
    _utc(spark)
    from xutil_spark.functions import geo_udfs

    pts = _points(spark, sf_dir)
    g = geo_udfs.bd2wgs(F.col("lon"), F.col("lat"))
    return pts.select(
        "pid",
        g.getField("lon").alias("wlon"),
        g.getField("lat").alias("wlat"),
    )


def o_bd2wgs() -> str:
    stage1 = _BD2GCJ_SQL.format(src="pts", glon="lon", glat="lat")
    return f"""
WITH pts AS ({_PTS_SQL}),
{stage1},
gcjpts AS (SELECT pid, lon, lat FROM gcj),
{_offset_sql("gcjpts", "-", "wlon", "wlat")}
SELECT pid, wlon, wlat FROM res
"""


# -------------------------------------------------------- mercator_to_bd09


def q_mercator_to_bd09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baidu Mercator meters → BD-09 (gis.go:294-306): 6-band MC2LL
    polynomial, x abs()'d before the band evaluator (reference quirk —
    output longitude never negative).  Inputs derived from pid so both
    engines compute from identical integers; |my| spans all six MCBAND
    rows including the polar band ≥ 12.89e6."""
    _utc(spark)
    from xutil_spark.functions import geo_udfs

    pts = _points(spark, sf_dir).select("pid").dropDuplicates(["pid"])
    mx = (F.col("pid") % 2001 - 1000).cast("double") * 21000.0
    my = (F.col("pid") % 1301 - 650).cast("double") * 19900.0
    src = pts.select("pid", mx.alias("mx"), my.alias("my"))
    b = geo_udfs.mercator_to_bd09(F.col("mx"), F.col("my"))
    return src.select(
        "pid",
        F.round(b.getField("lon"), 6).alias("blon"),
        F.round(b.getField("lat"), 6).alias("blat"),
    )


def o_mercator_to_bd09() -> str:
    from xutil_spark.kernels.baidu import _MC2LL, _MCBAND

    band = (
        f"CASE WHEN ay >= {_MCBAND[0]!r} THEN 0 WHEN ay >= {_MCBAND[1]!r} THEN 1"
        f" WHEN ay >= {_MCBAND[2]!r} THEN 2 WHEN ay >= {_MCBAND[3]!r} THEN 3"
        f" WHEN ay >= {_MCBAND[4]!r} THEN 4 ELSE 5 END"
    )
    cf_cases = ", ".join(
        f"(CASE band {' '.join(f'WHEN {i} THEN {float(_MC2LL[i][j])!r}' for i in range(6))} END) AS cf{j}"
        for j in range(10)
    )
    # same association as kernels.baidu._yr (square-chained powers);
    # x is abs()'d BEFORE the evaluator so xt never sign-flips
    return f"""
WITH pts AS (SELECT DISTINCT pid FROM ({_PTS_SQL})),
mc AS (SELECT pid, CAST(pid % 2001 - 1000 AS DOUBLE) * 21000.0 AS mx,
               CAST(pid % 1301 - 650 AS DOUBLE) * 19900.0 AS my FROM pts),
sel AS (SELECT pid, abs(mx) AS axm, my, abs(my) AS ay FROM mc),
bd AS (SELECT pid, axm, my, {band} AS band FROM sel),
co AS (SELECT pid, axm, my, {cf_cases} FROM bd),
e1 AS (SELECT *, cf0 + cf1 * abs(axm) AS xt, abs(my) / cf9 AS cc FROM co),
e2 AS (SELECT *, cc * cc AS cc2 FROM e1),
e3 AS (SELECT *, cc2 * cc AS cc3, cc2 * cc2 AS cc4 FROM e2),
e4 AS (SELECT *, cc4 * cc AS cc5, cc4 * cc2 AS cc6 FROM e3),
e5 AS (SELECT pid, my, xt,
              cf2 + cf3 * cc + cf4 * cc2 + cf5 * cc3 + cf6 * cc4
                  + cf7 * cc5 + cf8 * cc6 AS yt
       FROM e4)
SELECT pid, ROUND(xt, 6) + 0.0 AS blon,
       ROUND(CASE WHEN my < 0 THEN -yt ELSE yt END, 6) + 0.0 AS blat
FROM e5
"""


# ------------------------------------------------------------- tile2wgs


def q_tile2wgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile (x, y, z=12) → NW-corner WGS (gis.go:269-275) — returns
    (lat, lng) in the reference's quirky order.  Tile coords derived
    from pid integers."""
    _utc(spark)
    from xutil_spark.functions import geo_udfs

    pts = _points(spark, sf_dir).select("pid").dropDuplicates(["pid"])
    src = pts.select(
        "pid",
        (F.col("pid") % 4096).alias("tx"),
        ((F.col("pid") * 7919) % 4096).alias("ty"),
    )
    t = geo_udfs.tile2wgs(F.col("tx"), F.col("ty"), F.lit(12))
    return src.select(
        "pid", "tx", "ty",
        F.round(t.getField("lat"), 8).alias("lat"),
        F.round(t.getField("lng"), 8).alias("lng"),
    )


def o_tile2wgs() -> str:
    # n = π − 2π·y/2^z ; lat = 180/π·atan(sinh(n)) ; lng = x/2^z·360 − 180
    return f"""
WITH pts AS (SELECT DISTINCT pid FROM ({_PTS_SQL})),
tc AS (SELECT pid, pid % 4096 AS tx, (pid * 7919) % 4096 AS ty FROM pts),
n AS (SELECT pid, tx, ty,
             pi() - 2.0 * pi() * CAST(ty AS DOUBLE) / 4096.0 AS nv FROM tc)
SELECT pid, tx, ty,
       ROUND(180.0 / pi() * atan(0.5 * (exp(nv) - exp(-nv))), 8) AS lat,
       ROUND(CAST(tx AS DOUBLE) / 4096.0 * 360.0 - 180.0, 8) AS lng
FROM n
"""


QUERIES4 = {
    "gcj2wgs": q_gcj2wgs,
    "bd2gcj": q_bd2gcj,
    "bd2wgs": q_bd2wgs,
    "mercator_to_bd09": q_mercator_to_bd09,
    "tile2wgs": q_tile2wgs,
}

ORACLES4 = {
    "gcj2wgs": o_gcj2wgs(),
    "bd2gcj": o_bd2gcj(),
    "bd2wgs": o_bd2wgs(),
    "mercator_to_bd09": o_mercator_to_bd09(),
    "tile2wgs": o_tile2wgs(),
}
