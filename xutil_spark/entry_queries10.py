"""Contract queries, round-4 third batch: the map-matching snap join
(operators/spatial_join.py ``snap_to_segments``) — point → nearest road
segment, the engine's trajectory/road primitive.

Same conventions as entry_queries*.py: q_* takes (spark, sf_dir) and
returns a DataFrame; o_* returns ANSI SQL DuckDB runs on the same
inputs.  Registered BEHIND the 50-row driver window (r04's slots are
taken by the staleness ledger); tests/test_registry.py's
registration-round ledger forces it into the round-5 window.

The synthetic "road network": supplier refs chained into polylines of 8
vertices (consecutive s_suppkey within the same (ref_id-1) div 8
group), one segment per consecutive pair — both sides derive it from
the same supplier-hash coordinates, so the geometry is identical by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xutil_spark.entry_queries import _PTS_SQL, _REFS_SQL, _points, _refs, _utc

_SNAP_RADIUS_M = 50000.0
_SNAP_ZOOM = 8
# π/180 × 6371000 — MUST equal spatial_join._M_PER_DEG (pinned in tests)
_K = "111194.92664455873"

_SEGS_SQL = f"""
SELECT a.ref_id AS seg_id, a.lon AS ax, a.lat AS ay, b.lon AS bx, b.lat AS by2
FROM ({_REFS_SQL}) a JOIN ({_REFS_SQL}) b
  ON b.ref_id = a.ref_id + 1 AND (a.ref_id - 1) // 8 = (b.ref_id - 1) // 8
"""


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    refs = _refs(spark, sf_dir)
    a = refs.select(F.col("ref_id").alias("aid"),
                    F.col("lon").alias("ax"), F.col("lat").alias("ay"))
    b = refs.select(F.col("ref_id").alias("bid"),
                    F.col("lon").alias("bx"), F.col("lat").alias("by2"))
    return (
        a.join(b, (F.col("bid") == F.col("aid") + 1)
               & (F.expr("(aid - 1) div 8") == F.expr("(bid - 1) div 8")))
        .select(F.col("aid").alias("seg_id"), "ax", "ay", "bx", "by2")
    )


def q_snap_nearest_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map matching: every derived point snapped to its nearest chained
    supplier segment within 50 km (inner — unmatched points drop).
    Engine: exact segment supercover × neighbor-ring cell equi-join +
    closed-form clamped projection (all JVM columns); oracle: the same
    projection over the exhaustive point × segment cross join."""
    _utc(spark)
    from xutil_spark.operators.spatial_join import snap_to_segments

    # lineitem carries exact duplicate rows → per DISTINCT point
    pts = _points(spark, sf_dir).select("pid", "lon", "lat").dropDuplicates(["pid"])
    segs = _segments(spark, sf_dir)
    out = snap_to_segments(
        pts, segs, radius_m=_SNAP_RADIUS_M, zoom=_SNAP_ZOOM,
        point_id="pid", seg_id="seg_id", by="by2",
    )
    return out.select("pid", "seg_id", "dist_m", "t", "snap_lon", "snap_lat")


def o_snap_nearest_segment() -> str:
    return f"""
WITH pts AS (SELECT DISTINCT pid, lon, lat FROM ({_PTS_SQL})),
segs AS ({_SEGS_SQL}),
m AS (
  SELECT p.pid, s.seg_id, p.lon, p.lat,
         {_K} * cos(radians(p.lat)) AS kx,
         (s.ax - p.lon) * ({_K} * cos(radians(p.lat))) AS axm,
         (s.ay - p.lat) * {_K} AS aym,
         (s.bx - p.lon) * ({_K} * cos(radians(p.lat))) AS bxm,
         (s.by2 - p.lat) * {_K} AS bym
  FROM pts p CROSS JOIN segs s
),
u AS (
  SELECT *, bxm - axm AS ux, bym - aym AS uy,
         (bxm - axm) * (bxm - axm) + (bym - aym) * (bym - aym) AS len2
  FROM m
),
tv AS (
  SELECT *, CASE WHEN len2 = 0 THEN 0.0 ELSE
         LEAST(1.0, GREATEST(0.0, -(axm * ux + aym * uy) / len2)) END AS t
  FROM u
),
q AS (SELECT *, axm + t * ux AS qx, aym + t * uy AS qy FROM tv),
d AS (
  SELECT pid, seg_id, lon, lat, t,
         sqrt(qx * qx + qy * qy) AS dist,
         lon + qx / kx AS slon, lat + qy / {_K} AS slat
  FROM q
)
SELECT pid, seg_id, ROUND(dist, 3) AS dist_m, ROUND(t, 6) AS t,
       ROUND(slon, 6) AS snap_lon, ROUND(slat, 6) AS snap_lat
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY pid ORDER BY ROUND(dist, 3), seg_id) AS rn
  FROM d WHERE dist <= {_SNAP_RADIUS_M}
)
WHERE rn = 1
"""


QUERIES10 = {
    "snap_nearest_segment": q_snap_nearest_segment,
}

ORACLES10 = {
    "snap_nearest_segment": o_snap_nearest_segment(),
}
