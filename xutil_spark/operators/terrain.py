"""Terrain analytics over cell-value surfaces: Horn gradients
(slope / aspect / hillshade) and global spatial autocorrelation
(Moran's I, Geary's C).

The raster-analysis stage downstream of any gridded surface this
engine produces (cell counts, KDE densities, IDW estimates): Horn's
method (Horn 1981, the GDAL/ESRI standard) turns a value surface into
per-cell gradient products; Moran's I / Geary's C (Moran 1950, Geary
1954) reduce the whole surface to "is this clustered or random?"
significance statistics.  The reference's surface is point kernels
only (gis.go) — both are engine additions on the shared packed-cell
grid (kernels/tiles.py).

Exactness design (the house rule for every surface statistic): all
aggregates feeding the float math are exact INTEGERS — Horn's weighted
gradient sums, the autocorrelation's Σwᵢⱼxᵢxⱼ / Σwᵢ / Σx² terms — and
the float work is ONE fixed expression tree over those integers,
mirrored verbatim in the SQL oracle.  No accumulation-order hazard,
no centering-before-summing drift.

Scale shape (10^12 points): both operators run entirely at OCCUPIED-
CELL cardinality after the one fact-side count shuffle — an 8-way
explode + groupBy for the neighbor gather (the gi_star/kde shape), one
inner join back to the occupied set, then either a per-cell projection
(Horn) or a single-row reduce (autocorrelation).  At z10 that is
≤ 2^20 rows × 8 regardless of fact size; the final Moran reduce is a
map-side-combined global agg — bytes to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native

# compass sun vector for hillshade at azimuth 315°, altitude 45° in
# (east, south, up) tile coordinates — a fixed double the oracle
# inlines verbatim (repr) so both engines use the identical constant
_SUN_UP_8 = 8.0 * math.sin(math.radians(45.0))  # 8·sin(alt)


def _neighbor_fan(counts: DataFrame, zoom: int, value: str,
                  include_self: bool = False):
    """Explode each occupied cell's value onto its ring-1 neighbors
    (x wraps at the antimeridian, y clamps at the poles) and return
    the fanned frame keyed by target cell.  The (_dx, _dy) label is the
    SOURCE's position relative to the TARGET (= −explode offset) — the
    orientation directional kernels like Horn's weights need."""
    n_axis = F.lit(2 ** zoom).cast("long")
    ring = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        if include_self or (dx, dy) != (0, 0)
    ])
    return (
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
        .select(F.col("_tcell").alias("cell"),
                (-F.col("_k.dx")).alias("_dx"), (-F.col("_k.dy")).alias("_dy"),
                F.col(value).alias("_nv"))
    )


def horn_surface(counts: DataFrame, zoom: int,
                 value: str = "cnt") -> DataFrame:
    """(cell, value) → (cell, value, gx, gy, slope_deg, aspect_deg,
    hillshade): Horn gradients over the 3×3 window in TILE units
    (x east, y south, spacing 1; values in value units per cell).

        gx = (z₃+2z₆+z₉) − (z₁+2z₄+z₇)      edge weight 2, corner 1
        gy = (z₇+2z₈+z₉) − (z₁+2z₂+z₃)      (y grows southward)

    Missing neighbors take the CENTER value (edge replication) via the
    identity Σw = 0 per axis: gx = Σ_present wₓ·z − (Σ_present wₓ)·z₅,
    so gx/gy are exact integers computed from present neighbors only.

        slope_deg  = degrees(atan(√(gx²+gy²) / 8))
        aspect_deg = compass azimuth of steepest DESCENT, clockwise
                     from north: degrees(atan2(−gx, gy)) wrapped to
                     [0, 360); NULL on flats (gx = gy = 0)
        hillshade  = round(255·max(0, (gx/2 + gy/2 + 8·sin45°)
                                       / √(gx²+gy²+64)))
                     — Lambertian shade, sun at compass 315°/45°

    Scale: the gi_star neighbor shape — 8-way explode + groupBy at
    occupied-cell cardinality, one inner join back; zero Python.
    """
    fan = _neighbor_fan(counts, zoom, value)
    wx = F.col("_dx") * (F.lit(2) - F.abs(F.col("_dy")))
    wy = F.col("_dy") * (F.lit(2) - F.abs(F.col("_dx")))
    gather = fan.groupBy("cell").agg(
        F.sum(wx * F.col("_nv")).alias("_sxz"),
        F.sum(wy * F.col("_nv")).alias("_syz"),
        F.sum(wx).alias("_swx"),
        F.sum(wy).alias("_swy"),
    )
    j = counts.join(gather, "cell")
    gx = (F.col("_sxz") - F.col("_swx") * F.col(value)).cast("long")
    gy = (F.col("_syz") - F.col("_swy") * F.col(value)).cast("long")
    j = j.withColumn("gx", gx).withColumn("gy", gy)
    g2 = (F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy")).cast("double")
    slope = F.round(F.degrees(F.atan(F.sqrt(g2) / F.lit(8.0))), 6) + F.lit(0.0)
    asp_raw = F.degrees(F.atan2(-F.col("gx").cast("double"),
                                F.col("gy").cast("double")))
    asp = F.when(
        (F.col("gx") == 0) & (F.col("gy") == 0), F.lit(None).cast("double")
    ).otherwise(
        F.round(F.when(asp_raw < 0, asp_raw + 360.0).otherwise(asp_raw), 6)
        + F.lit(0.0)
    )
    shade_raw = (
        (F.col("gx").cast("double") / 2.0 + F.col("gy").cast("double") / 2.0
         + F.lit(_SUN_UP_8))
        / F.sqrt(g2 + F.lit(64.0))
    )
    shade = F.round(F.greatest(F.lit(0.0), F.lit(255.0) * shade_raw), 0
                    ).cast("long")
    return j.select(
        "cell", F.col(value).alias("v"), "gx", "gy",
        slope.alias("slope_deg"), asp.alias("aspect_deg"),
        shade.alias("hillshade"),
    )


def spatial_autocorr(counts: DataFrame, zoom: int,
                     value: str = "cnt") -> DataFrame:
    """Global Moran's I + Geary's C over the occupied-cell surface with
    binary queen (8-neighbor) weights, self excluded — one row out:
    (n_cells, w_pairs, morans_i, z_i, gearys_c).

    Integer aggregates (exact under any order):
        per cell   wn = #occupied neighbors, nsum = Σxⱼ, nsq = Σxⱼ²
        global     n, Sx = Σx, Sxx = Σx², W = Σwn, T = Σx·wn,
                   cross = Σx·nsum  (= Σᵢⱼ wᵢⱼxᵢxⱼ),
                   D = Σ(wn·x² − 2x·nsum + nsq)  (= Σᵢⱼ wᵢⱼ(xᵢ−xⱼ)²),
                   U = Σwn²

    then one fixed float tree (x̄ = Sx/n, den = Sxx − Sx²/n):
        I  = (n/W)·(cross − 2x̄T + x̄²W)/den
        E  = −1/(n−1);  z under normality with S₁ = 2W, S₂ = 4U:
        Var = (n²S₁ − nS₂ + 3W²)/(W²(n²−1)) − E²,  z = (I−E)/√Var
        C  = (n−1)·D / (2·W·den)

    I > E: clustered; C < 1 agrees.  NULL statistics when the surface
    is constant (den = 0) or no cell has an occupied neighbor (W = 0).

    Scale: neighbor gather at cell cardinality, then a single
    map-side-combined global agg — the driver sees one row.
    """
    fan = _neighbor_fan(counts, zoom, value)
    per_cell = fan.groupBy("cell").agg(
        F.count(F.lit(1)).alias("_wn"),
        F.sum("_nv").alias("_nsum"),
        F.sum(F.col("_nv") * F.col("_nv")).alias("_nsq"),
    )
    # left join: isolated occupied cells (no occupied neighbor) carry
    # wn = 0 and still count toward n / Sx / Sxx
    j = counts.join(per_cell, "cell", "left").select(
        F.col(value).alias("_x"),
        F.coalesce(F.col("_wn"), F.lit(0)).alias("_wn"),
        F.coalesce(F.col("_nsum"), F.lit(0)).alias("_nsum"),
        F.coalesce(F.col("_nsq"), F.lit(0)).alias("_nsq"),
    )
    g = j.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum("_wn").alias("w_pairs"),
        F.sum(F.col("_x") * F.col("_wn")).alias("_t"),
        F.sum(F.col("_x") * F.col("_nsum")).alias("_cross"),
        F.sum(F.col("_wn") * F.col("_x") * F.col("_x")
              - F.lit(2) * F.col("_x") * F.col("_nsum")
              + F.col("_nsq")).alias("_d"),
        F.sum(F.col("_wn") * F.col("_wn")).alias("_u"),
    )
    n = F.col("n_cells").cast("double")
    w = F.col("w_pairs").cast("double")
    xbar = F.col("_sx").cast("double") / n
    den = F.col("_sxx").cast("double") - (F.col("_sx").cast("double")
                                          * F.col("_sx").cast("double")) / n
    num = (F.col("_cross").cast("double") - 2.0 * xbar * F.col("_t").cast("double")
           + xbar * xbar * w)
    ok = (F.col("w_pairs") > 0) & (den > 0.0)
    i_stat = F.when(ok, F.round((n / w) * num / den, 6) + F.lit(0.0))
    e_i = F.lit(-1.0) / (n - 1.0)
    s1 = 2.0 * w
    s2 = 4.0 * F.col("_u").cast("double")
    var_i = ((n * n * s1 - n * s2 + 3.0 * w * w)
             / (w * w * (n * n - 1.0))) - e_i * e_i
    z_i = F.when(
        ok & (var_i > 0.0),
        F.round(((n / w) * num / den - e_i) / F.sqrt(var_i), 6) + F.lit(0.0),
    )
    c_stat = F.when(
        ok,
        F.round((n - 1.0) * F.col("_d").cast("double") / (2.0 * w * den), 6)
        + F.lit(0.0),
    )
    return g.select(
        "n_cells", "w_pairs", i_stat.alias("morans_i"), z_i.alias("z_i"),
        c_stat.alias("gearys_c"),
    )


def local_moran(counts: DataFrame, zoom: int,
                value: str = "cnt") -> DataFrame:
    """Anselin's local Moran (LISA, Anselin 1995) per occupied cell
    with binary queen weights: where :func:`spatial_autocorr` answers
    "is the surface clustered?", this labels WHICH cells are the
    clusters and outliers.

        Iᵢ = (xᵢ − x̄)/m₂ · Σⱼ wᵢⱼ(xⱼ − x̄),   m₂ = Σₖ(xₖ − x̄)²/n

    via the integer decomposition Σⱼwᵢⱼ(xⱼ−x̄) = nsumᵢ − wnᵢ·x̄, so the
    only floats are the fixed (x̄, m₂) tree from the 1-row global
    broadcast.  Quadrant labels compare the value and the mean spatial
    lag against x̄: HH (hot cluster), LL (cold cluster), HL (high
    outlier), LH (low outlier); NULL when the cell sits exactly on x̄,
    has no occupied neighbor, or the surface is constant.

    Scale: the same occupied-cell fan + one broadcast join as
    :func:`gi_star`.  Returns (cell, v, wn, nsum, local_i, quadrant).
    """
    fan = _neighbor_fan(counts, zoom, value)
    per_cell = fan.groupBy("cell").agg(
        F.count(F.lit(1)).alias("wn"),
        F.sum("_nv").alias("nsum"),
    )
    j = counts.join(per_cell, "cell", "left").select(
        "cell", F.col(value).alias("v"),
        F.coalesce(F.col("wn"), F.lit(0)).alias("wn"),
        F.coalesce(F.col("nsum"), F.lit(0)).alias("nsum"),
    )
    glob = counts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(value).alias("_sx"),
        F.sum(F.col(value) * F.col(value)).alias("_sxx"),
    )
    j = j.join(F.broadcast(glob))
    n = F.col("_n").cast("double")
    xbar = F.col("_sx").cast("double") / n
    m2 = (F.col("_sxx").cast("double") - (F.col("_sx").cast("double")
                                          * F.col("_sx").cast("double")) / n) / n
    dev = F.col("v").cast("double") - xbar
    lagdev = F.col("nsum").cast("double") - F.col("wn").cast("double") * xbar
    ok = (F.col("wn") > 0) & (m2 > 0.0)
    li = F.when(ok, F.round(dev / m2 * lagdev, 6) + F.lit(0.0))
    lagmean = F.col("nsum").cast("double") / F.col("wn").cast("double")
    quad = F.when(
        ok & (dev != 0.0) & (lagmean != xbar),
        F.concat(
            F.when(dev > 0.0, F.lit("H")).otherwise(F.lit("L")),
            F.when(lagmean > xbar, F.lit("H")).otherwise(F.lit("L")),
        ),
    )
    return j.select("cell", "v", "wn", "nsum", li.alias("local_i"),
                    quad.alias("quadrant"))


def focal_stats(counts: DataFrame, zoom: int, radius: int = 1,
                value: str = "cnt", include_self: bool = True) -> DataFrame:
    """Generic focal (neighborhood) statistics — the map-algebra
    building block (ESRI "Focal Statistics"): per occupied cell, the
    sum / count / min / max / range / mean of ``value`` over the
    occupied cells within Chebyshev ``radius`` (x wraps, y clamps).

    Everything except the mean is an exact integer; the mean is ONE
    division over two integers rounded to 6 dp.  Missing (unoccupied)
    neighbors are simply absent from the statistics — the surface is
    sparse by design; use the ``fsum``/``fcnt`` pair downstream if a
    dense-frame semantic (zeros) is needed: the dense mean is
    fsum / (2r+1)².

    Scale: one (2r+1)²-way explode + groupBy at occupied-cell
    cardinality, one join back — the kde_smooth shape generalized.
    Returns (cell, v, fcnt, fsum, fmin, fmax, frange, fmean).
    """
    n_axis = F.lit(2 ** zoom).cast("long")
    ring = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if include_self or (dx, dy) != (0, 0)
    ])
    fan = (
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
        .agg(
            F.count(F.lit(1)).alias("fcnt"),
            F.sum(value).alias("fsum"),
            F.min(value).alias("fmin"),
            F.max(value).alias("fmax"),
        )
    )
    j = counts.join(fan, "cell")
    return j.select(
        "cell", F.col(value).alias("v"), "fcnt", "fsum", "fmin", "fmax",
        (F.col("fmax") - F.col("fmin")).alias("frange"),
        (F.round(F.col("fsum").cast("double") / F.col("fcnt").cast("double"),
                 6) + F.lit(0.0)).alias("fmean"),
    )
