"""Contract queries, round-4 tenth batch: the spatiotemporal encounter
join (operators/encounters.py) — entity pairs co-located within
``radius_m`` meters and ``window_s`` seconds, the proximity/contact
primitive over event trails.

Same conventions as every entry_queries*.py: q_* takes (spark, sf_dir)
and returns a DataFrame; o_* returns ANSI SQL DuckDB runs on the same
parquet inputs.  Registered BEHIND the frozen 50-row r04 driver window;
the registration-round ledger (tests/test_registry.py) forces it into
the round-5 window.

Oracle parity notes: the oracle joins on the SAME floor-epoch time
buckets (an equi-join DuckDB can hash — the naive cross join is 10⁸
pairs at sf0.01) expanded over the {−1,0,+1} offsets, then applies the
identical exact filters: integer |Δepoch| ≤ W and the transcribed
haversine ≤ R.  Counts are exact integers; MIN(dist) is selection (no
accumulation), rounded to mm on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from xutil_spark.entry_queries import _HAV_SQL, _utc
from xutil_spark.entry_queries3 import _EV_LAT, _EV_LON
from xutil_spark.entry_queries12 import _located_events

_ENC_RADIUS_M = 100_000.0
_ENC_WINDOW_S = 21_600


def q_encounters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who met whom: user pairs with ≥1 event pair within 100 km and
    6 h, with encounter counts and the closest approach.  Engine:
    bucketed (cell, time-bucket) self equi-join, ring-1 cover at the
    auto-picked zoom (z6 for 100 km under the 60° envelope), exact
    JVM-native haversine refine — zero Python, no cross join."""
    _utc(spark)
    from xutil_spark.operators.encounters import encounter_join

    ev = _located_events(spark, sf_dir)
    return encounter_join(
        ev, radius_m=_ENC_RADIUS_M, window_s=_ENC_WINDOW_S,
        entity="user_id", event_id="event_id", ts="ts",
    )


def o_encounters() -> str:
    hav = _HAV_SQL.format(lon1="l.lon", lat1="l.lat",
                          lon2="r.lon", lat2="r.lat")
    w = _ENC_WINDOW_S
    return f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         {_EV_LON} AS lon, {_EV_LAT} AS lat
  FROM events
),
e AS (
  SELECT *, CAST(floor(ep / {w}.0) AS BIGINT) AS bkt FROM ev
),
cand AS (
  SELECT l.user_id AS ua, r.user_id AS ub, {hav} AS d
  FROM e l
  CROSS JOIN (VALUES (-1), (0), (1)) s(o)
  JOIN e r ON r.bkt = l.bkt + s.o
          AND l.user_id < r.user_id
          AND abs(l.ep - r.ep) <= {w}
  WHERE {hav} <= {_ENC_RADIUS_M}
)
SELECT ua AS entity_a, ub AS entity_b,
       COUNT(*) AS n_encounters, ROUND(MIN(d), 3) AS min_dist_m
FROM cand
GROUP BY 1, 2
"""


QUERIES17 = {
    "encounters_z6": q_encounters,
}
ORACLES17 = {
    "encounters_z6": o_encounters(),
}
