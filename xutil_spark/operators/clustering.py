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
