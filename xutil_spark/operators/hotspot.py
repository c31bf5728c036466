"""Hotspot detection: Getis-Ord Gi* z-scores over tile-cell counts.

The statistical twin of the KDE surface (operators/heatmap.py): instead
of an unnormalized density, each cell gets the Gi* standard score — how
far its neighborhood sum deviates from the global mean under binary
ring weights — so "hot" is a significance statement (z ≳ 2), not a raw
count.  Classic Getis & Ord (1992/1995) with w_ij = 1 for cells within
Chebyshev radius r (self included: the *-variant).

Study-frame convention: the statistic is computed over the OCCUPIED
cells only (n, mean, std, and neighbor counts all range over cells with
at least one point).  A dense-grid frame would need 4^zoom rows at any
scale; the sparse frame keeps every stage at occupied-cell cardinality
and is the standard choice for point data on a global grid.

Exactness design: every aggregate feeding the score (neighbor sum,
neighbor count, n, Σx, Σx²) is an exact INTEGER; the float work is one
fixed expression tree over those integers, evaluated identically by
Spark and the SQL oracle — no accumulation-order hazard.

Scale shape: identical to the KDE — one fact-side count shuffle, then a
(2r+1)² explode + groupBy at CELL cardinality, one inner join back to
the occupied set, and a single-row global-stats broadcast.  At 10^12
points / z10 this is ≤ 2^20 cell rows × 9 — dim-scale regardless of
fact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native


def gi_star(counts: DataFrame, zoom: int, radius: int = 1) -> DataFrame:
    """(cell, cnt) → (cell, cnt, gsum, wn, z).

    gsum = Σ cnt over occupied ring cells (self included), wn = how
    many occupied cells the ring holds, z = Gi* score:

        z = (gsum − x̄·wn) / (s·sqrt((n·wn − wn²)/(n−1)))

    with x̄, s (population std) over all n occupied cells.  x wraps at
    the antimeridian, y clamps at the poles (out-of-range rows drop).
    z is NULL when the denominator vanishes (s = 0 or wn = n); the
    result is rounded to 6 dp (+0.0 normalizes any −0.0).
    """
    n_axis = F.lit(2 ** zoom).cast("long")
    ring = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ])
    contrib = (
        counts.withColumn("_k", F.explode(ring))
        .withColumn("_ny", native.cell_y(F.col("cell")) + F.col("_k.dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") < n_axis))
        .withColumn(
            "_tcell",
            native.cell_from_xy(
                F.pmod(native.cell_x(F.col("cell")) + F.col("_k.dx"), n_axis),
                F.col("_ny"), zoom,
            ),
        )
        .groupBy(F.col("_tcell").alias("cell"))
        .agg(F.sum("cnt").alias("gsum"), F.count(F.lit(1)).alias("wn"))
    )
    ring_stats = counts.join(contrib, "cell")  # occupied targets only
    glob = counts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sxx"),
    )
    j = ring_stats.join(F.broadcast(glob))
    # fixed expression tree over exact integers — mirrored verbatim in
    # the SQL oracle so both sides do the identical float64 ops
    xbar = F.col("sx").cast("double") / F.col("n")
    svar = (F.col("sxx").cast("double") / F.col("n")) - (xbar * xbar)
    u = (F.col("n") * F.col("wn") - F.col("wn") * F.col("wn")).cast(
        "double") / (F.col("n") - F.lit(1))
    denom = F.sqrt(svar) * F.sqrt(u)
    num = F.col("gsum").cast("double") - (xbar * F.col("wn").cast("double"))
    z = F.when(denom > 0.0, F.round(num / denom, 6) + F.lit(0.0))
    return j.select("cell", "cnt", "gsum", "wn", z.alias("z"))
