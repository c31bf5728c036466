"""Grid heatmap: Gaussian KDE smoothing over tile-cell counts.

The density-surface stage of a tile server / spatial dashboard: count
points per cell, then convolve the counts with a (2r+1)² Gaussian
kernel so isolated hot cells bleed into their neighborhood.

Exactness design: kernel weights are INTEGER (round(scale·exp(−d²/2σ²))
computed once on the driver), so the smoothed density is an integer sum
— bit-reproducible under any aggregation order, platform-exact against
a SQL oracle, and immune to float reassociation across executors.

Scale shape: the convolution runs at CELL cardinality, not point
cardinality — after the one count shuffle, each cell row explodes to
(2r+1)² weighted contributions (pure JVM arithmetic: packed-cell bit
ops, wrap x mod 2^z, drop out-of-range y) and ONE groupBy(target)
reduces them.  At 10^12 points / z12 this is ≤ 2^24 cell rows × 25 — a
dim-scale stage regardless of fact size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native


def gaussian_kernel_int(radius: int = 2, sigma: float = 1.0,
                        scale: int = 1024) -> list[tuple[int, int, int]]:
    """(dx, dy, weight) triples; weight = round(scale·exp(−(dx²+dy²)/2σ²)),
    zero-weight corners dropped."""
    out = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            w = round(scale * math.exp(-(dx * dx + dy * dy)
                                       / (2.0 * sigma * sigma)))
            if w > 0:
                out.append((dx, dy, w))
    return out


def cell_counts(points: DataFrame, zoom: int, lon: str = "lon",
                lat: str = "lat") -> DataFrame:
    """Points → (cell, cnt) at ``zoom`` — the one fact-side shuffle."""
    return (
        points.withColumn("cell", native.cell(lon, lat, zoom))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("cnt"))
    )


def kde_smooth(counts: DataFrame, zoom: int, radius: int = 2,
               sigma: float = 1.0, scale: int = 1024) -> DataFrame:
    """Convolve (cell, cnt) with the integer Gaussian kernel.

    Returns (cell, density) where density = Σ cnt(neighbor)·w — the
    UNNORMALIZED integer surface (divide by Σw for a mean if needed;
    kept integer so the result is exactly comparable).  Cells receive
    mass only if some kernel-neighbor has points (zero cells are not
    materialized — the surface is sparse, like the input).
    """
    kern = gaussian_kernel_int(radius, sigma, scale)
    n = 2 ** zoom
    n_axis = F.lit(n).cast("long")
    karr = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(w).cast("long").alias("w"))
        for dx, dy, w in kern
    ])
    return (
        counts.withColumn("_k", F.explode(karr))
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
        .agg(F.sum(F.col("cnt") * F.col("_k.w")).alias("density"))
    )
