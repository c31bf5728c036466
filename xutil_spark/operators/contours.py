"""Marching-squares contour extraction over a tile-cell value surface.

The raster→vector isoline stage (what a weather/density map runs on a
gridded surface): treat each cell's integer value (a count from
``heatmap.cell_counts`` or a KDE density from ``kde_smooth``) as a
sample at the cell's lattice node, slide a 2×2 window over the sparse
lattice, and emit the level-set line segments where the surface
crosses a threshold.  Extends the reference's tile toolkit
(gis.go:263-283 ``Wgs2Tile``/``Tile2Wgs``) with the classic marching
squares of Lorensen & Cline's family — the 2-D analogue of marching
cubes — under a fixed saddle convention.

Exactness design: corner values are exact integers, the case index is
integer bit math, and each endpoint is ONE linear-interpolation float
expression t = (T − v₁)/(v₂ − v₁) over those integers — no
accumulation, so the SQL oracle mirrors it verbatim.

Scale shape: runs entirely at OCCUPIED-CELL cardinality.  Each cell
row explodes to its ≤4 participating 2×2 blocks (pure JVM bit
arithmetic; x wraps at the antimeridian, y clamps at the poles), ONE
groupBy(block) pivots the four corners, the 16-case segment table is a
when-chain (codegen'd — no join), and blocks fully below/above the
threshold vanish at the aggregation.  At 10^12 points / z12 this is
≤ 2^24 blocks × 4 — dim-scale regardless of fact size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native

# case index bit order: TL=8, TR=4, BR=2, BL=1 (set bit ⇔ corner ≥ T).
# Edges: 0=top (TL→TR), 1=right (TR→BR), 2=bottom (BL→BR), 3=left
# (TL→BL).  Saddles (5, 10) use the fixed "connect the highs"
# convention — each segment hugs one low corner, so the two high
# corners stay joined (no center-average disambiguation): deterministic
# and mirrored by the oracle's segment table.
_CASE_SEGMENTS: dict[int, list[tuple[int, int]]] = {
    1: [(3, 2)],
    2: [(2, 1)],
    3: [(3, 1)],
    4: [(0, 1)],
    5: [(0, 3), (2, 1)],
    6: [(0, 2)],
    7: [(3, 0)],
    8: [(0, 3)],
    9: [(0, 2)],
    10: [(0, 1), (2, 3)],
    11: [(0, 1)],
    12: [(3, 1)],
    13: [(2, 1)],
    14: [(3, 2)],
}


def contour_segments(
    counts: DataFrame,
    zoom: int,
    threshold: float,
    value: str = "cnt",
    as_lonlat: bool = True,
) -> DataFrame:
    """(cell, value) → one row per contour line segment.

    Returns (bx, by, case_id, seg, x1, y1, x2, y2[, lon1, lat1, lon2,
    lat2]): the 2×2 block's top-left lattice node, the marching-squares
    case, the segment ordinal within the block (saddles emit 2), and
    the endpoints in lattice units (node (x, y) = cell (x, y); the
    fractional part is the crossing position along the block edge).
    With ``as_lonlat``, endpoints are also projected through the
    inverse slippy-tile transform at the CELL-CENTER convention
    (node (x, y) ⇒ lon/lat of cell center (x+0.5, y+0.5)), rounded to
    8 dp like ``Tile2Wgs`` (gis.go:270-275).

    x wraps at the antimeridian (a block's right column may be cell 0);
    the top lattice row y=0 has no block above it, and the bottom row
    pairs with nothing below — out-of-range blocks drop.
    """
    n_axis = 2 ** zoom
    t_lit = F.lit(float(threshold))

    # each cell is corner TL of block (x,y), TR of (x−1,y),
    # BL of (x,y−1), BR of (x−1,y−1)
    corners = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(tag).alias("tag"))
        for tag, (dx, dy) in enumerate([(0, 0), (-1, 0), (0, -1), (-1, -1)])
    ])  # tag: 0=TL 1=TR 2=BL 3=BR
    blocks = (
        counts.withColumn("_k", F.explode(corners))
        .withColumn("_by", native.cell_y(F.col("cell")) + F.col("_k.dy"))
        .filter((F.col("_by") >= 0) & (F.col("_by") < n_axis - 1))
        .withColumn("_bx", F.pmod(native.cell_x(F.col("cell"))
                                  + F.col("_k.dx"), F.lit(n_axis)))
        .groupBy("_bx", "_by")
        .agg(*[
            F.coalesce(
                F.max(F.when(F.col("_k.tag") == tag, F.col(value))),
                F.lit(0),
            ).cast("long").alias(name)
            for tag, name in enumerate(["_tl", "_tr", "_bl", "_br"])
        ])
    )
    case = (
        (F.col("_tl") >= t_lit).cast("int") * 8
        + (F.col("_tr") >= t_lit).cast("int") * 4
        + (F.col("_br") >= t_lit).cast("int") * 2
        + (F.col("_bl") >= t_lit).cast("int") * 1
    )
    seg_chain = F.array().cast("array<struct<seg:int,ea:int,eb:int>>")
    expr = None
    for c, segs in _CASE_SEGMENTS.items():
        arr = F.array(*[
            F.struct(F.lit(i + 1).alias("seg"), F.lit(ea).alias("ea"),
                     F.lit(eb).alias("eb"))
            for i, (ea, eb) in enumerate(segs)
        ])
        expr = (F.when(F.col("case_id") == c, arr) if expr is None
                else expr.when(F.col("case_id") == c, arr))
    seg_chain = expr.otherwise(
        F.array().cast("array<struct<seg:int,ea:int,eb:int>>"))

    withsegs = (
        blocks.withColumn("case_id", case)
        .filter((F.col("case_id") > 0) & (F.col("case_id") < 15))
        .withColumn("_s", F.explode(seg_chain))
    )

    def endpoint(e):
        """(fx, fy) local offsets in [0,1]² for edge column ``e``."""
        tl, tr, bl, br = (F.col(c).cast("double")
                          for c in ("_tl", "_tr", "_bl", "_br"))
        top_t = (t_lit - tl) / (tr - tl)
        right_t = (t_lit - tr) / (br - tr)
        bottom_t = (t_lit - bl) / (br - bl)
        left_t = (t_lit - tl) / (bl - tl)
        fx = (F.when(e == 0, top_t).when(e == 1, F.lit(1.0))
              .when(e == 2, bottom_t).otherwise(F.lit(0.0)))
        fy = (F.when(e == 0, F.lit(0.0)).when(e == 1, right_t)
              .when(e == 2, F.lit(1.0)).otherwise(left_t))
        return fx, fy

    fx1, fy1 = endpoint(F.col("_s.ea"))
    fx2, fy2 = endpoint(F.col("_s.eb"))
    base = [
        F.col("_bx").alias("bx"), F.col("_by").alias("by"),
        F.col("case_id"), F.col("_s.seg").alias("seg"),
        F.round(F.col("_bx") + fx1, 6).alias("x1"),
        F.round(F.col("_by") + fy1, 6).alias("y1"),
        F.round(F.col("_bx") + fx2, 6).alias("x2"),
        F.round(F.col("_by") + fy2, 6).alias("y2"),
    ]
    if not as_lonlat:
        return withsegs.select(*base)

    def lonlat(xc, yc):
        # node (x, y) = center of cell (x, y): (x+0.5, y+0.5) tile units
        lon = (xc + 0.5) / n_axis * 360.0 - 180.0
        nv = F.lit(math.pi) - F.lit(2.0 * math.pi) * (yc + 0.5) / n_axis
        lat = F.lit(180.0 / math.pi) * F.atan(
            0.5 * (F.exp(nv) - F.exp(-nv)))
        return F.round(lon, 8), F.round(lat, 8)

    # recompute from the UNROUNDED lattice coords (mirrors the oracle)
    lon1, lat1 = lonlat(F.col("_bx") + fx1, F.col("_by") + fy1)
    lon2, lat2 = lonlat(F.col("_bx") + fx2, F.col("_by") + fy2)
    return withsegs.select(
        *base,
        lon1.alias("lon1"), lat1.alias("lat1"),
        lon2.alias("lon2"), lat2.alias("lat2"),
    )
