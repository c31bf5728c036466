"""Spatial join strategies — the engine's heart (SURVEY §2.3, §4.2).

All joins reduce to **cell-id equi-joins** that Catalyst/AQE can plan
(broadcast / shuffled-hash / sort-merge + AQE skew splitting), with
numpy-vectorized refinement UDFs where exact geometry is needed:

* ``point_in_tile_join``   — pure equi-join on the packed cell id.
* ``point_in_polygon_join``— filter-refine: polygon → covering cells
  (bbox from geo.go:298-321 semantics) → equi-join → exact ray-cast.
* ``knn_join``             — grid join on neighbor rings with *provable*
  completeness: rings escalate until the k-th distance is below the
  guaranteed-covered radius.
* ``distance_join``        — range variant (dist ≤ r) of the grid join.
* ``salt_hot_cells``       — explicit skew handling: histogram the cell
  key, salt the heavy hitters, explode the dim side (north rule).

Scale notes (100 TB / 10^12 rows): the fact side is only ever touched by
narrow column expressions (cell encode is JVM-native, no Python) plus
ONE shuffle per join on the cell key; dim sides (tiles/polygons/refs)
broadcast when small.  Skew is handled by AQE plus explicit salting for
pathological urban cells.  No driver-side collect of fact data — only
cell histograms (bounded by distinct-cell count) and dim tables.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xutil_spark.functions import native

# ---------------------------------------------------------------------------


def with_cell(points: DataFrame, zoom: int, lon: str = "lon", lat: str = "lat",
              out: str = "cell") -> DataFrame:
    """Attach the packed cell id (JVM-native expression, codegen'd)."""
    return points.withColumn(out, native.cell(lon, lat, zoom))


def point_in_tile_join(
    points: DataFrame,
    tiles: DataFrame,
    zoom: int,
    how: str = "inner",
    broadcast_tiles: bool = True,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Assign each point its containing tile: equi-join on cell id.

    The tile dim carries ``cell``; points get cells via the native
    expression.  Tile containment IS cell equality (both sides use the
    same floor semantics, gis.go:262-267), so no refinement is needed —
    output rows match the reference's ``Wgs2Tile`` assignments exactly.
    """
    pts = with_cell(points, zoom, lon, lat)
    dim = F.broadcast(tiles) if broadcast_tiles else tiles
    return pts.join(dim, on="cell", how=how)


# ---------------------------------------------------------------------------


def _pip_refine_udf():
    """Vectorized PiP predicate: groups each Arrow batch by wkt so every
    distinct polygon is parsed once and ray-cast over all its candidate
    points in a single numpy call (zero per-row Python)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from xutil_spark.kernels import geometry as K_geom

    def refine(lon, lat, wkt):
        out = np.zeros(len(lon), dtype=bool)
        lonv = lon.to_numpy(np.float64)
        latv = lat.to_numpy(np.float64)
        codes, uniq = pd.factorize(wkt)
        for u_idx, w in enumerate(uniq):
            m = codes == u_idx
            g = K_geom.from_wkt(w)
            out[m] = K_geom.point_in_geo(lonv[m], latv[m], g)
        return pd.Series(out)

    # real class annotations: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf rejects
    refine.__annotations__ = {"lon": pd.Series, "lat": pd.Series,
                              "wkt": pd.Series, "return": pd.Series}
    return pandas_udf(refine, "boolean")


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    zoom: int = 12,
    poly_id: str = "poly_id",
    wkt: str = "wkt",
    broadcast_polys: bool = True,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Filter-refine point-in-polygon join.

    Phase 1 (filter): polygons explode to their bbox covering cells at
    ``zoom`` (coarse quadtree cover); points take the cell at the same
    zoom; equi-join on cell — broadcastable, prunable, AQE-skew-safe.
    Phase 2 (refine): exact even-odd ray-cast (numpy, batch-grouped by
    polygon) removes bbox false positives.

    Zoom picks the filter selectivity: higher zoom → more dim rows,
    fewer refine candidates.  For 100 TB the dim explosion is bounded by
    (polygon bbox area / tile area) × n_polygons.
    """
    from xutil_spark.functions import geo_udfs

    cover = polygons.withColumn(
        "cell",
        F.explode(geo_udfs.wkt_covering_cells(F.col(wkt), F.lit(zoom))),
    )
    pts = with_cell(points, zoom, lon, lat)
    dim = F.broadcast(cover) if broadcast_polys else cover
    cand = pts.join(dim, on="cell", how="inner")
    refine = _pip_refine_udf()
    return cand.filter(refine(F.col(lon), F.col(lat), F.col(wkt))).drop("cell")


# ---------------------------------------------------------------------------

_M_PER_DEG_LAT = 110574.0  # conservative meters per degree of latitude


def _neighbor_block(cell_col: Column, zoom: int, ring: int) -> Column:
    """Array of the (2r+1)² distinct neighbor cells of a cell — built as
    static integer expressions (JVM codegen, ZERO extra shuffle).  x
    wraps mod 2^z (antimeridian), y clamps (poles); ``array_distinct``
    removes clamp-duplicates so window top-k never double-counts."""
    px = native.cell_x(cell_col)
    py = native.cell_y(cell_col)
    n_axis = 2 ** zoom
    exprs = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            nx = F.pmod(px + F.lit(dx), F.lit(n_axis).cast("long"))
            ny = F.greatest(
                F.lit(0).cast("long"),
                F.least(F.lit(n_axis - 1).cast("long"), py + F.lit(dy)),
            )
            exprs.append(native.cell_from_xy(nx, ny, zoom))
    return F.array_distinct(F.array(*exprs))


def _ring_guarantee_m(zoom: int, ring: int, max_abs_lat: float = 60.0) -> float:
    """Lower bound on the distance from any point in the center cell to
    the nearest *unsearched* cell beyond ``ring``, in meters.

    The searched block covers all cells within ``ring`` tiles; the
    closest unsearched geometry is at least ``ring`` full tile-spans
    away in latitude (longitude spans shrink with cos(lat) but the
    latitude bound alone is valid: any unsearched cell differs by more
    than ``ring`` tiles in x OR y; in the x case its great-circle
    distance is ≥ ring·span_lon·cos(lat)·111320; we take the min).
    """
    span_deg = 360.0 / (2 ** zoom)  # tile span (lon; lat span is ≤ this below 60°)
    # Web-Mercator lat span at |lat|≤60° is within [0.5, 1]× lon span;
    # use the conservative half-span for the latitude direction.
    lat_m = ring * (span_deg * 0.5) * _M_PER_DEG_LAT
    lon_m = ring * span_deg * math.cos(math.radians(max_abs_lat)) * 111320.0
    return min(lat_m, lon_m)


def knn_join(
    points: DataFrame,
    refs: DataFrame,
    k: int,
    zoom: int = 12,
    min_zoom: int = 0,
    point_id: str = "image_id",
    ref_id: str = "ref_id",
    broadcast_refs: bool = True,
    lon: str = "lon",
    lat: str = "lat",
    ref_lon: str = "lon",
    ref_lat: str = "lat",
) -> DataFrame:
    """Exact k-nearest-neighbor grid join with quadtree zoom escalation.

    Round r searches the 3×3 neighbor block at zoom ``zoom - r`` — the
    hierarchical cell id makes coarsening pure bit arithmetic, so each
    round quadruples the search radius with a constant-size (9-cell)
    block instead of an exploding (2r+1)² ring.  Distances use native
    haversine (gis.go:195-206); per-point top-k via window with
    (mm-rounded dist, ref_id) deterministic ordering.

    A point RESOLVES when it has ≥ k candidates AND its k-th distance is
    ≤ the round's guaranteed-covered radius — provably equal to brute
    force.  At zoom 0 the block covers the whole world → termination and
    exactness are unconditional (≤ zoom+1 rounds).  ``remaining`` is
    localCheckpoint'ed per round to keep the plan lineage flat.

    Output: point columns + (ref_id, dist_m, rank 1..k).
    """
    refs_c = with_cell(
        refs.select(
            F.col(ref_id),
            F.col(ref_lon).alias("_rlon"),
            F.col(ref_lat).alias("_rlat"),
        ),
        zoom, "_rlon", "_rlat", out="_rcell",
    )
    refs_dim = F.broadcast(refs_c) if broadcast_refs else refs_c

    pts = with_cell(points, zoom, lon, lat, out="_pcell")

    remaining = pts
    resolved_parts: list[DataFrame] = []
    point_cols = [c for c in points.columns]
    out_cols = point_cols + [ref_id, "dist_m", "rank"]
    for zoom_r in range(zoom, min_zoom - 1, -1):
        last_round = zoom_r == min_zoom
        cand = (
            remaining
            .withColumn(
                "_ncell",
                F.explode(
                    _neighbor_block(
                        native.cell_parent(F.col("_pcell"), zoom, zoom_r), zoom_r, 1
                    )
                ),
            )
            .join(
                refs_dim,
                F.col("_ncell") == native.cell_parent(F.col("_rcell"), zoom, zoom_r),
                "inner",
            )
            .withColumn(
                "dist_m",
                native.haversine_m(F.col(lon), F.col(lat), F.col("_rlon"), F.col("_rlat")),
            )
        )
        w = Window.partitionBy(point_id).orderBy(
            F.round(F.col("dist_m"), 3).asc(), F.col(ref_id).asc()
        )
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .withColumn("_n_cand", F.count(F.lit(1)).over(Window.partitionBy(point_id)))
            .filter(F.col("rank") <= k)
        )
        if last_round:
            resolved_parts.append(topk.select(*out_cols))
            break
        guarantee = _ring_guarantee_m(zoom_r, 1)
        kth = F.max(F.when(F.col("rank") == k, F.col("dist_m"))).over(
            Window.partitionBy(point_id)
        )
        topk = topk.withColumn("_kth", kth)
        done = topk.filter(
            (F.col("_n_cand") >= k) & (F.col("_kth") <= F.lit(guarantee))
        )
        resolved_parts.append(done.select(*out_cols))
        done_ids = done.select(point_id).distinct()
        # localCheckpoint truncates lineage so the escalation loop's plan
        # stays flat; `remaining` shrinks every round
        remaining = remaining.join(done_ids, on=point_id, how="left_anti").localCheckpoint()
        if remaining.isEmpty():
            break

    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out


def distance_join(
    points: DataFrame,
    refs: DataFrame,
    radius_m: float,
    zoom: int = 12,
    point_id: str = "image_id",
    ref_id: str = "ref_id",
    broadcast_refs: bool = True,
    lon: str = "lon",
    lat: str = "lat",
    ref_lon: str = "lon",
    ref_lat: str = "lat",
) -> DataFrame:
    """All (point, ref) pairs with haversine ≤ radius_m.

    Ring radius derives from the radius: cells within
    ``ceil(radius / ring_guarantee(1))`` rings are provably sufficient.
    """
    ring = 1
    while _ring_guarantee_m(zoom, ring) < radius_m:
        ring += 1
        if ring > 64:
            raise ValueError("radius too large for this zoom; lower the zoom")
    refs_c = with_cell(
        refs.select(
            F.col(ref_id), F.col(ref_lon).alias("_rlon"), F.col(ref_lat).alias("_rlat")
        ),
        zoom, "_rlon", "_rlat", out="_rcell",
    )
    refs_dim = F.broadcast(refs_c) if broadcast_refs else refs_c
    pts = with_cell(points, zoom, lon, lat, out="_pcell")
    return (
        pts.withColumn(
            "_ncell", F.explode(_neighbor_block(F.col("_pcell"), zoom, ring))
        )
        .join(refs_dim, F.col("_ncell") == F.col("_rcell"), "inner")
        .withColumn(
            "dist_m",
            native.haversine_m(F.col(lon), F.col(lat), F.col("_rlon"), F.col("_rlat")),
        )
        .filter(F.col("dist_m") <= radius_m)
        .drop("_ncell", "_rcell", "_rlon", "_rlat", "_pcell")
    )


# ---------------------------------------------------------------------------


def salt_hot_cells(
    points: DataFrame,
    dim: DataFrame,
    salt: int = 8,
    hot_threshold: int | None = None,
    cell_col: str = "cell",
    id_col: str = "image_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Explicit skew handling for cell equi-joins (north rule).

    1. Histogram the fact side's cell key (map-side combined count).
    2. Cells above ``hot_threshold`` (default: 20× the mean) are HOT.
    3. Fact rows in hot cells get ``_salt = pmod(hash(id), salt)``;
       others get 0.
    4. Dim rows for hot cells are exploded ×salt; others keep salt 0.

    Returns (salted_points, salted_dim, hot_cells_df) — join the first
    two on the COMPOSITE key ``[cell, _salt]`` (packing cell and salt
    into one int64 would overflow: zoom bits occupy 58-62).  AQE's
    skew-join handles moderate skew on its own; this targets the
    pathological urban-cell head where one key exceeds a task.
    """
    hist = points.groupBy(cell_col).count()
    if hot_threshold is None:
        stats = hist.agg(F.avg("count").alias("avg")).collect()[0]
        hot_threshold = max(int((stats["avg"] or 0) * 20), 1000)
    hot = hist.filter(F.col("count") >= hot_threshold).select(
        cell_col, F.lit(True).alias("_hot")
    )
    pts = (
        points.join(F.broadcast(hot), on=cell_col, how="left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(),
                   F.pmod(F.hash(F.col(id_col)), F.lit(salt)).cast("long"))
            .otherwise(F.lit(0).cast("long")),
        )
        .drop("_hot")
    )
    dim_salted = (
        dim.join(F.broadcast(hot), on=cell_col, how="left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot").isNotNull(),
                    F.array(*[F.lit(s).cast("long") for s in range(salt)]),
                ).otherwise(F.array(F.lit(0).cast("long")))
            ),
        )
        .drop("_hot")
    )
    return pts, dim_salted, hot
