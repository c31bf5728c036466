"""Segment×segment intersection join: which segments of set A properly
CROSS which segments of set B — the line×line spatial-join primitive
(trajectory × road-network crossing counts, boundary-crossing
detection, route × geofence-edge analysis).

The reference has no multi-geometry predicate; this extends its
geometry toolkit (geo.go segment accessors, gis.go:263-267 tiling)
into a fact×dim join the same way the PiP and snap joins do
(SURVEY §2.3 engine additions).

Predicate: the classic straddle test on planar orientation signs —
``ccw(p, q, r) = (qx−px)(ry−py) − (qy−py)(rx−px)`` and segments (a1,
a2) × (b1, b2) PROPERLY cross iff ``ccw(a1,a2,b1)·ccw(a1,a2,b2) < 0``
AND ``ccw(b1,b2,a1)·ccw(b1,b2,a2) < 0``.  Strictly proper: endpoint
touches, collinear overlaps and zero-length segments are excluded —
that keeps the predicate a pure SIGN test on IEEE-exact products of
differences, so the Spark column evaluation, a DuckDB transcription
and any scalar replay agree bit-for-bit with no rounding contract at
all.  Coordinates are treated as planar lon/lat (consistent with the
engine's tile grid); great-circle vs planar crossing can differ for
segments spanning many degrees — callers with such data should
densify first.

Engine shape — supercover-blocked, never a cross join:

1. both segment sets explode to their EXACT supercover cells at
   ``zoom`` (kernels.tiles.segment_cells — every tile the segment
   touches); a crossing point lies ON both segments, so its cell is
   in both supercovers: the equi-join on cell is COMPLETE for proper
   crossings;
2. ONE equi-join on cell, the straddle predicate as codegen'd column
   arithmetic (filter BEFORE the pair dedup — cheap signs first);
3. distinct at crossing-pair cardinality, then the per-B aggregate.

100-TB story: each side is touched once by the supercover explode
(rows ≈ Σ length/cell-size) and one shuffle on cell; AQE skew-split
handles hot cells, ``zoom`` trades explode volume against per-cell
pair density exactly like the snap join's coarse pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.operators.spatial_join import _segments_with_cells


def _ccw(px, py, qx, qy, rx, ry):
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def crossing_pairs(
    segs_a: DataFrame,
    segs_b: DataFrame,
    zoom: int = 6,
    a_id: str = "aid",
    b_id: str = "bid",
    a_cols: tuple = ("ax", "ay", "bx", "by"),
    b_cols: tuple = ("ax", "ay", "bx", "by"),
    emit_point: bool = False,
    a_extra: tuple = (),
) -> DataFrame:
    """Distinct ``(a_id, b_id)`` pairs of properly crossing segments.

    ``a_cols``/``b_cols`` name each table's (x1, y1, x2, y2) endpoint
    columns.  Ids must be unique per segment within their table.

    ``a_extra`` names A-side columns to carry through onto the output
    (e.g. the track/user that owns each A segment).  They must be
    FUNCTIONALLY DETERMINED by ``a_id`` (one value per segment id), so
    including them in the pair ``distinct`` cannot change its
    cardinality — this is how callers get owner columns without a
    second fact-scale join back (which would recompute the A lineage).

    ``emit_point=True`` adds the crossing location: ``t_a`` (A's
    parametric position, 6 dp) and ``(px, py)`` (6 dp) from the
    one-division closed form ``t_a = d3 / (d3 − d4)`` — well-defined
    exactly because proper crossings have d3, d4 of opposite sign; the
    expression transcribes verbatim to SQL/scalar replays."""
    A = (
        _segments_with_cells(segs_a, zoom, a_id, *a_cols, extra=a_extra)
        .select(F.col("_sid").alias("_aid"),
                F.col("_sax").alias("_a1x"), F.col("_say").alias("_a1y"),
                F.col("_sbx").alias("_a2x"), F.col("_sby").alias("_a2y"),
                "_scell", *a_extra)
    )
    B = (
        _segments_with_cells(segs_b, zoom, b_id, *b_cols)
        .select(F.col("_sid").alias("_bid"),
                F.col("_sax").alias("_b1x"), F.col("_say").alias("_b1y"),
                F.col("_sbx").alias("_b2x"), F.col("_sby").alias("_b2y"),
                "_scell")
    )
    d1 = _ccw(F.col("_a1x"), F.col("_a1y"), F.col("_a2x"), F.col("_a2y"),
              F.col("_b1x"), F.col("_b1y"))
    d2 = _ccw(F.col("_a1x"), F.col("_a1y"), F.col("_a2x"), F.col("_a2y"),
              F.col("_b2x"), F.col("_b2y"))
    d3 = _ccw(F.col("_b1x"), F.col("_b1y"), F.col("_b2x"), F.col("_b2y"),
              F.col("_a1x"), F.col("_a1y"))
    d4 = _ccw(F.col("_b1x"), F.col("_b1y"), F.col("_b2x"), F.col("_b2y"),
              F.col("_a2x"), F.col("_a2y"))
    joined = (
        A.join(B, on="_scell", how="inner")
        .filter((d1 * d2 < 0) & (d3 * d4 < 0))
    )
    if not emit_point:
        return (
            joined
            .select(F.col("_aid").alias(a_id), F.col("_bid").alias(b_id),
                    *a_extra)
            .distinct()
        )
    ta = d3 / (d3 - d4)
    return (
        joined
        .select(
            F.col("_aid").alias(a_id), F.col("_bid").alias(b_id),
            F.round(ta, 6).alias("t_a"),
            F.round(F.col("_a1x") + ta * (F.col("_a2x") - F.col("_a1x")), 6)
            .alias("px"),
            F.round(F.col("_a1y") + ta * (F.col("_a2y") - F.col("_a1y")), 6)
            .alias("py"),
            *a_extra,
        )
        .distinct()
    )


def crossing_counts(
    pairs: DataFrame,
    b_id: str = "bid",
    group_a: str | None = None,
) -> DataFrame:
    """Per-B-segment crossing totals from a ``crossing_pairs`` result:
    ``(b_id, n_crossings[, n_groups])``.  ``group_a`` optionally names
    a grouping column carried on the pairs (e.g. the track/user that
    owns each A segment) for a distinct-group count."""
    aggs = [F.count(F.lit(1)).alias("n_crossings")]
    if group_a is not None:
        aggs.append(F.countDistinct(group_a).alias("n_groups"))
    return pairs.groupBy(b_id).agg(*aggs)
