"""Grid-density spatial clustering (cell-grid DBSCAN flavor).

Scale shape: clustering 10^12 raw points directly is hopeless, but the
classic grid reduction isn't — cell-encode every point (pure JVM bit
arithmetic), aggregate to per-cell counts (one map-side-combined
shuffle), and from there the problem is over CELLS, a table many
orders of magnitude smaller than the input.  Dense cells (count ≥
min_count) adjacency-join over the 8-neighborhood (bit-arithmetic
neighbor ids — no geometry), and connected components over that tiny
edge set label the clusters.  The expensive stages touch points once;
everything after runs at cell cardinality.

This is the standard grid/cell variant of density clustering (the
DBSCAN reduction used by every large-scale heatmap/hotspot pipeline),
not ε-exact DBSCAN: density is per cell, adjacency is king-move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native
from xutil_spark.operators.dedup import connected_components

_ZBASE = 288230376151711744  # 2^58, cell id = z·2^58 + x·2^29 + y
_XBASE = 536870912           # 2^29
_XSHIFT = 29
_BKT_BITS = 20               # voxel id time field: floor(epoch/W) < 2^20


def grid_density_clusters(
    pts: DataFrame, zoom: int = 10, min_count: int = 8,
    lon_col: str = "lon", lat_col: str = "lat",
) -> DataFrame:
    """(cell, cluster_id, n_points) for every dense cell; cluster_id is
    the smallest cell id of its 8-connected dense component (isolated
    dense cells label themselves)."""
    n = 1 << zoom
    cells = (
        pts.withColumn("cell", native.cell(lon_col, lat_col, zoom))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    dense = cells.filter(F.col("n_points") >= min_count).localCheckpoint()

    # integer bit arithmetic, not double division: x*2^29+y exceeds the
    # 53-bit double mantissa for zoom > 24, which would silently corrupt
    # neighbor ids / bounds checks at deep zooms
    x = F.shiftright((F.col("cell") % _ZBASE).cast("long"), _XSHIFT)
    y = F.col("cell") % _XBASE
    nbrs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nb = F.col("cell") + F.lit(dx * _XBASE).cast("long") + F.lit(dy)
            ok = (
                (x + dx >= 0) & (x + dx < n) & (y + dy >= 0) & (y + dy < n)
            )
            nbrs.append(F.when(ok, nb))
    cand = dense.select(
        F.col("cell").alias("a"),
        F.explode(F.array(*nbrs)).alias("b"),
    ).filter(F.col("b").isNotNull() & (F.col("a") < F.col("b")))
    pairs = cand.join(
        dense.select(F.col("cell").alias("b")), on="b", how="inner"
    ).select("a", "b")
    comp = connected_components(pairs)
    return (
        dense.join(comp, dense["cell"] == comp["id"], "left")
        .select(
            "cell",
            F.coalesce(F.col("cluster_id"), F.col("cell")).alias("cluster_id"),
            "n_points",
        )
    )


def st_grid_clusters(
    events: DataFrame, zoom: int, window_s: int, min_count: int = 3,
    lon_col: str = "lon", lat_col: str = "lat", ts_col: str = "ts",
) -> DataFrame:
    """Spatiotemporal grid clustering (the ST-DBSCAN grid reduction):
    events voxelize to (cell, time bucket), dense voxels (count ≥
    ``min_count``) connect over the 26-neighborhood (king-move in
    space × ±1 bucket in time), connected components label the
    space-time clusters — emerging events, bursts, moving hotspots.

    Output: (cell, bkt, cluster_id, n_points) per dense voxel, where
    cluster_id is the smallest voxel id of the component (voxel id =
    ``(x·2^zoom + y)·2^20 + bkt`` — exact int64 for zoom ≤ 21 and
    0 ≤ bkt < 2^20, i.e. epochs within ~718 years of 1970 at 6-hour
    buckets; same no-antimeridian-wrap bounds semantics as
    ``grid_density_clusters``).

    Scale shape: identical to the spatial variant — points touched
    once (cell encode + one count shuffle), everything after at dense-
    voxel cardinality; the 26-way adjacency is bit arithmetic on the
    voxel id, never geometry."""
    n = 1 << zoom
    vox = (
        events.withColumn("cell", native.cell(lon_col, lat_col, zoom))
        .withColumn(
            "bkt",
            F.floor(F.col(ts_col).cast("long") / F.lit(float(window_s)))
            .cast("long"))
        .groupBy("cell", "bkt")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    x = F.shiftright((F.col("cell") % _ZBASE).cast("long"), _XSHIFT)
    y = F.col("cell") % _XBASE
    vid = ((x * n + y) * F.lit(1 << _BKT_BITS).cast("long")
           + F.col("bkt")).alias("vid")
    dense = (
        vox.filter(F.col("n_points") >= min_count)
        .select("cell", "bkt", "n_points", vid, x.alias("_x"), y.alias("_y"))
        .localCheckpoint()
    )
    nbrs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for db in (-1, 0, 1):
                if (dx, dy, db) == (0, 0, 0):
                    continue
                nb = (F.col("vid")
                      + F.lit(dx * n * (1 << _BKT_BITS)).cast("long")
                      + F.lit(dy * (1 << _BKT_BITS)).cast("long")
                      + F.lit(db).cast("long"))
                ok = (
                    (F.col("_x") + dx >= 0) & (F.col("_x") + dx < n)
                    & (F.col("_y") + dy >= 0) & (F.col("_y") + dy < n)
                    & (F.col("bkt") + db >= 0)
                )
                nbrs.append(F.when(ok, nb))
    cand = dense.select(
        F.col("vid").alias("a"),
        F.explode(F.array(*nbrs)).alias("b"),
    ).filter(F.col("b").isNotNull() & (F.col("a") < F.col("b")))
    pairs = cand.join(
        dense.select(F.col("vid").alias("b")), on="b", how="inner"
    ).select("a", "b")
    comp = connected_components(pairs)
    return (
        dense.join(comp, dense["vid"] == comp["id"], "left")
        .select(
            "cell", "bkt",
            F.coalesce(F.col("cluster_id"), F.col("vid")).alias("cluster_id"),
            "n_points",
        )
    )
