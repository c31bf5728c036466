"""Inverse-distance-weighted (IDW) spatial interpolation over tile
cells — the classic Shepard (1968) gridding of scattered observations
(sensor readings, measured values at capture locations) onto a raster
surface.

Fixed-point exactness design (the ``kde_smooth`` integer-kernel idea
applied to IDW): the weight of an observation at distance d is the
INTEGER ``floor(scale / (1 + d^p))`` and values are quantized to
integers (``round(v·10^vdec)``), so both aggregation sums are exact
integers under any order — the only floats are the per-row haversine
(the same expression tree as every distance op, mirrored in SQL) and
ONE final division.  A float-weighted IDW would hash-diverge across
partitionings; the quantization error is bounded by 1/scale per unit
weight and 10^-vdec per value — negligible against measurement noise,
and bit-reproducible.

Scale shape (10^12 observations): the fact side gets one cell encode +
(2r+1)² ring explode (pure JVM bit arithmetic, x wraps / y clamps like
kde_smooth) and ONE map-side-combined groupBy at target-cell
cardinality.  No dim, no join, no Python stage.  Targets are the
ring-dilation of the occupied cells — the sparse surface, like the
KDE's.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native


def idw_surface(
    obs: DataFrame,
    zoom: int,
    radius: int = 1,
    power: int = 2,
    scale: int = 10 ** 12,
    vdec: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    value: str = "value",
) -> DataFrame:
    """(lon, lat, value) observations → (cell, n_obs, est): the IDW
    estimate at each cell center from the observations within the
    Chebyshev ``radius`` cell ring.

        est = Σ wᵢ·vᵢ / Σ wᵢ,   wᵢ = floor(scale / (1 + dᵢ^power)),
        dᵢ = haversine(obs, cell center) in meters

    ``power`` ∈ {1, 2} (Shepard's p); values quantized to ``vdec``
    decimals.  Sums run in decimal(38,0) so 10^12-observation cells
    cannot overflow.  ``est`` is rounded to 6 dp; cells where every
    weight floors to 0 (all obs ≥ ~scale^(1/p) meters away) return
    NULL est rather than dividing by zero.
    """
    if power not in (1, 2):
        raise ValueError("power must be 1 or 2")
    n = 2 ** zoom
    n_axis = F.lit(n).cast("long")
    ring = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ])
    v100 = F.round(F.col(value) * F.lit(float(10 ** vdec)), 0).cast("long")
    fanned = (
        obs.withColumn("_v", v100)
        .withColumn("_cell", native.cell(lon, lat, zoom))
        .withColumn("_k", F.explode(ring))
        .withColumn("_ny", native.cell_y(F.col("_cell")) + F.col("_k.dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") < n_axis))
        .withColumn("_tx", F.pmod(native.cell_x(F.col("_cell"))
                                  + F.col("_k.dx"), n_axis))
        .withColumn("_tcell", native.cell_from_xy(F.col("_tx"),
                                                  F.col("_ny"), zoom))
    )
    # cell-center inverse slippy projection (same trees as contours)
    clon = (F.col("_tx") + 0.5) / n * 360.0 - 180.0
    nv = F.lit(math.pi) - F.lit(2.0 * math.pi) * (F.col("_ny") + 0.5) / n
    clat = F.lit(180.0 / math.pi) * F.atan(0.5 * (F.exp(nv) - F.exp(-nv)))
    d = native.haversine_m(F.col(lon), F.col(lat), clon, clat)
    dp = d if power == 1 else d * d
    w = F.floor(F.lit(float(scale)) / (F.lit(1.0) + dp))
    weighted = fanned.withColumn("_w", w.cast("decimal(38,0)"))
    agg = (
        weighted.groupBy(F.col("_tcell").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("_w").alias("_sw"),
            F.sum(F.col("_w") * F.col("_v")).alias("_swv"),
        )
    )
    est = F.when(
        F.col("_sw") > 0,
        F.round(F.col("_swv").cast("double") / F.col("_sw").cast("double")
                / F.lit(float(10 ** vdec)), 6) + F.lit(0.0),
    )
    return agg.select("cell", "n_obs", est.alias("est"))


def bilinear_upsample(counts, zoom: int, value: str = "cnt"):
    """Upsample a cell-value surface one zoom level with separable
    bilinear weights — the inverse companion of the pyramid's box
    DOWNSAMPLE (raster/pyramid.py): each z+1 child estimates from the
    4 nearest z parents with (9,3,3,1)/16 weights (child centers sit
    at ±0.25 parent units, so the x/y half-weights are (3,1)/4).

    Sparse-normalized semantics: the estimate divides by the PRESENT
    weight mass — Σwᵢvᵢ / Σwᵢ over occupied parents only — and a child
    row is emitted only when its OWN parent is occupied (the horn/
    gi_star occupied-frame convention; a dense frame would need
    4^(z+1) rows).  Both sums are exact integers: a parent fans to the
    4×4 child block it influences with integer weight wx·wy,
    wx, wy ∈ (1,3,3,1), so the division is the only float — one fixed
    ROUND(…,6) tree.

    Scale: 16-way explode + groupBy at occupied-cell cardinality, one
    equi-join back to the parent frame (both sides cell-cardinality).
    Returns (cell, wsum, vwsum, est) at zoom+1.
    """
    from pyspark.sql import functions as F

    from xutil_spark.functions import native

    n_child = F.lit(2 ** (zoom + 1)).cast("long")
    fan16 = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"),
                 F.lit(wx * wy).cast("long").alias("w"))
        for j, wy in ((-1, 1), (0, 3), (1, 3), (2, 1))
        for i, wx in ((-1, 1), (0, 3), (1, 3), (2, 1))
    ])
    contrib = (
        counts.withColumn("_k", F.explode(fan16))
        .withColumn("_cy", F.shiftleft(native.cell_y(F.col("cell")), 1)
                    + F.col("_k.j"))
        .filter((F.col("_cy") >= 0) & (F.col("_cy") < n_child))
        .withColumn(
            "_ccell",
            native.cell_from_xy(
                F.pmod(F.shiftleft(native.cell_x(F.col("cell")), 1)
                       + F.col("_k.i"), n_child),
                F.col("_cy"), zoom + 1,
            ),
        )
        .groupBy(F.col("_ccell").alias("cell"))
        .agg(F.sum(F.col("_k.w") * F.col(value)).alias("vwsum"),
             F.sum("_k.w").alias("wsum"))
    )
    # keep only children whose own parent is occupied
    parents = counts.select(F.col("cell").alias("_pcell"))
    keyed = contrib.withColumn(
        "_pcell", native.cell_parent(F.col("cell"), zoom + 1, zoom))
    kept = keyed.join(parents, "_pcell")
    return kept.select(
        "cell", "wsum", "vwsum",
        (F.round(F.col("vwsum").cast("double")
                 / F.col("wsum").cast("double"), 6)
         + F.lit(0.0)).alias("est"),
    )
