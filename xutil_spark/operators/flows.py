"""Origin-destination flow matrix over tile cells — mobility analytics.

The standard OD aggregation over any entity trail (user sessions, GPS
tracks, image capture sequences): order each entity's events in time,
take every consecutive pair of cell assignments as one (from_cell →
to_cell) movement, and count movements per directed cell pair.  The
reference has no trajectory layer at all — this extends its tile
toolkit (gis.go:263-267 ``Wgs2Tile``) the way its users chain it in
pipelines (cell encode → group → count), so the cell encode is the
same packed ``native.cell_from_lonlat`` used by every other tile op.

Scale shape (10^12 events): one shuffle to order within entities (the
window partitions by entity — entity cardinality is the parallelism,
no global sort), then one map-side-combined count shuffle at flow-pair
cardinality (≤ occupied-cells², in practice ≪ fact size).  Skew: a hot
entity (bot with millions of events) concentrates one window
partition — pre-split such entities by day via ``order_within`` being
(day, ts) if needed; hot flow PAIRS are map-side combined away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xutil_spark.operators.spatial_join import with_cell


def od_flows(
    events: DataFrame,
    zoom: int,
    entity: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
    self_loops: bool = False,
    min_count: int = 1,
) -> DataFrame:
    """(entity, ts, lon, lat) → (from_cell, to_cell, n_moves,
    n_entities) for every consecutive-in-time pair of events of the
    same entity.

    ``tiebreak`` orders equal timestamps deterministically (pass the
    event id); ``self_loops=False`` drops stationary pairs (both
    events in the same cell); ``min_count`` prunes rare flows after
    the count (the usual privacy / noise floor).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(entity).orderBy(*order)
    cells = with_cell(events, zoom, lon, lat, out="_tocell")
    moved = (
        cells.withColumn("_fromcell", F.lag("_tocell").over(w))
        .filter(F.col("_fromcell").isNotNull())
    )
    if not self_loops:
        moved = moved.filter(F.col("_fromcell") != F.col("_tocell"))
    return (
        moved.groupBy(
            F.col("_fromcell").alias("from_cell"),
            F.col("_tocell").alias("to_cell"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.countDistinct(entity).alias("n_entities"),
        )
        .filter(F.col("n_moves") >= F.lit(int(min_count)))
    )
