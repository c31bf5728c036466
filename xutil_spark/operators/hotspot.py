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
    # try_divide: a surface with exactly one occupied cell (n = 1)
    # must yield NULL z, not an ANSI DIVIDE_BY_ZERO abort — the
    # when(denom > 0) guard below does not stop the division itself
    # from being evaluated
    u = F.try_divide(
        (F.col("n") * F.col("wn") - F.col("wn") * F.col("wn")).cast("double"),
        (F.col("n") - F.lit(1)).cast("double"),
    )
    denom = F.sqrt(svar) * F.sqrt(u)
    num = F.col("gsum").cast("double") - (xbar * F.col("wn").cast("double"))
    z = F.when(denom > 0.0, F.round(num / denom, 6) + F.lit(0.0))
    return j.select("cell", "cnt", "gsum", "wn", z.alias("z"))


def mann_kendall_cells(
    points: DataFrame,
    zoom: int,
    n_bins: int = 10,
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Emerging-hotspot trend: the Mann-Kendall monotonic-trend test on
    each occupied cell's time-binned counts — the temporal companion of
    :func:`gi_star` (ESRI's "emerging hot spot analysis" runs exactly
    this statistic over a space-time cube).

    Per cell, over ``n_bins`` equal-width bins spanning the GLOBAL
    [min ts, max ts] (bins with no points count 0 — absence is signal):

        S    = Σ_{i<j} sign(c_j − c_i)
        VarS = (n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)) / 18
        z    = (S−1)/√VarS  if S>0,  (S+1)/√VarS  if S<0,  0 if S=0

    with the standard tie correction over groups of equal counts
    (Kendall 1975); z is NULL when VarS = 0 (all bins tied).  z ≳ 1.96:
    intensifying cell; z ≲ −1.96: cooling.

    Exactness: bin index, every count, S, and 18·VarS are exact
    integers (the float work is one fixed √/division tree, mirrored
    verbatim in the SQL oracle).  Binning uses integer epoch-seconds
    arithmetic: bin = (e − tmin)·n_bins div (tmax − tmin + 1).

    Scale shape (10^12 points): ONE fact-side shuffle (the (cell, bin)
    count); everything after runs at occupied-cell cardinality — the
    dense fill is cells × n_bins rows, the pair join n_bins²/2 per
    cell, ties n_bins per cell — with the global time frame a 1-row
    broadcast.  Returns (cell, cnt, s, var18, z): total count, MK S,
    18·VarS (exact integer), trend z-score.
    """
    n = int(n_bins)
    if n < 2:
        raise ValueError("n_bins must be ≥ 2")
    epoch = F.unix_timestamp(F.col(ts))
    frame = points.agg(
        F.min(epoch).alias("_tmin"),
        (F.max(epoch) - F.min(epoch) + F.lit(1)).alias("_width"),
    )
    binned = (
        points.join(F.broadcast(frame))
        .withColumn("_num", ((epoch - F.col("_tmin")) * F.lit(n)).cast("long"))
        # integer floor-div (all operands ≥ 0) — exact on both engines
        .withColumn("_bin", F.expr("_num div _width").cast("int"))
    )
    cell = native.cell(lon, lat, zoom)
    bincnt = (
        binned.select(cell.alias("cell"), "_bin")
        .groupBy("cell", "_bin")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    dense = (
        bincnt.select("cell").distinct()
        .withColumn("_bin", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        .join(bincnt, ["cell", "_bin"], "left")
        .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
    )
    a = dense.select("cell", F.col("_bin").alias("_i"), F.col("_c").alias("_ci"))
    b = dense.select("cell", F.col("_bin").alias("_j"), F.col("_c").alias("_cj"))
    sgn = (
        F.when(F.col("_cj") > F.col("_ci"), F.lit(1))
        .when(F.col("_cj") < F.col("_ci"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    s_df = (
        a.join(b, "cell").filter(F.col("_j") > F.col("_i"))
        .groupBy("cell")
        .agg(F.sum(sgn).alias("s"))
    )
    ties = (
        dense.groupBy("cell", "_c").agg(F.count(F.lit(1)).alias("_t"))
        .groupBy("cell")
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tsum"),
            F.sum(F.col("_c") * F.col("_t")).alias("cnt"),
        )
    )
    var18 = (F.lit(n * (n - 1) * (2 * n + 5)) - F.col("_tsum")).alias("var18")
    j = s_df.join(ties, "cell").select("cell", "cnt", "s", var18)
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("var18") <= 0, F.lit(None).cast("double"))
        .when(F.col("s") > 0, F.round((F.col("s") - 1) / sd, 6) + F.lit(0.0))
        .when(F.col("s") < 0, F.round((F.col("s") + 1) / sd, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
    )
    return j.select("cell", "cnt", "s", "var18", z.alias("z"))
