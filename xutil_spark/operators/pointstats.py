"""Point-pattern statistics over tile cells: per-cell nearest-neighbor
distances and the Clark–Evans aggregation index.

The "is this point set clustered, random, or dispersed?" screen
(Clark & Evans 1954; ESRI "Average Nearest Neighbor") — the point-level
complement of the cell-level Moran/Geary statistics in
operators/terrain.py.  The reference stops at point kernels (gis.go);
this is an engine addition over the same packed-cell grid.

Semantics are deliberately WITHIN-CELL (boundary-free): each z-cell is
its own study area — a point's nearest neighbor is the nearest OTHER
point in the same cell, and the expected-under-CSR density uses the
cell's own planar area.  That makes every cell independent (no
cross-cell edge correction debate) and the whole statistic
embarrassingly parallel.

Exactness: coordinates quantize to integer micro-degrees, pairwise
distances compare as exact integer d² (argmin is order-free), each
point's NN distance rounds to an integer micro-degree unit so the
per-cell mean is a ratio of exact integers; the CSR expectation and
z-score are one fixed float tree per cell over those integers and the
cell's Mercator bounds.

Scale shape (10^12 points): one shuffle on cell, then a per-cell
self-join — cost Σ n_c², bounded by choosing the zoom so cells hold
O(10²-10³) points (the same knob every grid join in this engine uses);
a hot cell is still one task of n_c² comparisons, so deepen the zoom
rather than salt (NN needs all within-cell pairs co-located).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native

# Clark & Evans (1954) standard-error constant √((4−π)/(4π)) — the
# textbook 0.26136 — kept at full double precision and mirrored
# verbatim (repr) in the oracle.  (An earlier revision divided this by
# 2, which doubled every z_ce score: SE of the mean NN distance under
# CSR is σ/√n = √((4−π)/(4πλ))/√n = 0.26136·√A/n, no extra factor.)
CE_SE_CONST = math.sqrt((4.0 - math.pi) / (4.0 * math.pi))


def nn_stats_cells(
    df: DataFrame,
    zoom: int,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "event_id",
) -> DataFrame:
    """(id, lon, lat) → per-cell (cell, n, mean_nn_u, r_expected_u,
    ce_index, z_ce): within-cell nearest-neighbor mean on the
    micro-degree plane vs the CSR expectation ½·√(A/n).

        ce_index < 1 ⇒ clustered, ≈ 1 ⇒ random, > 1 ⇒ dispersed
        z_ce = (r̄_obs − r̄_exp) / (0.26136·√A / n)

    Cells with a single point drop (no neighbor exists).  Exact
    duplicate coordinates yield NN distance 0 — counted, not deduped
    (coincident points ARE extreme clustering).
    """
    pts = df.select(
        F.col(id_col).alias("_id"),
        native.cell(F.col(lon), F.col(lat), zoom).alias("cell"),
        F.round(F.col(lon) * 1e6, 0).cast("long").alias("_ux"),
        F.round(F.col(lat) * 1e6, 0).cast("long").alias("_uy"),
    )
    a = pts.select("cell", F.col("_id").alias("_ia"),
                   F.col("_ux").alias("_xa"), F.col("_uy").alias("_ya"))
    b = pts.select("cell", F.col("_id").alias("_ib"),
                   F.col("_ux").alias("_xb"), F.col("_uy").alias("_yb"))
    pairs = a.join(b, "cell").filter(F.col("_ia") != F.col("_ib"))
    d2 = (
        (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb"))
        + (F.col("_ya") - F.col("_yb")) * (F.col("_ya") - F.col("_yb"))
    )
    per_point = (
        pairs.withColumn("_d2", d2)
        .groupBy("cell", "_ia")
        .agg(F.min("_d2").alias("_d2min"))
        .withColumn("_nn_u", F.round(F.sqrt(F.col("_d2min").cast("double")),
                                     0).cast("long"))
    )
    per_cell = per_point.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_nn_u").alias("_snn"),
    )
    # planar cell area in micro-degree²: Δlon exact from the zoom,
    # Δlat from the Mercator row bounds (tile2wgs tree, gis.go:269-275)
    n_axis = float(2 ** zoom)
    dlon_u = 1e6 * 360.0 / n_axis
    y0 = native.cell_y(F.col("cell")).cast("double")

    def _lat(yv):
        nn = F.lit(math.pi) - F.lit(2.0 * math.pi) * yv / F.lit(n_axis)
        return F.degrees(F.atan(F.lit(0.5) * (F.exp(nn) - F.exp(-nn))))

    area = F.lit(dlon_u) * ((_lat(y0) - _lat(y0 + F.lit(1.0))) * F.lit(1e6))
    nn = F.col("n").cast("double")
    mean_nn = F.col("_snn").cast("double") / nn
    r_exp = F.lit(0.5) * F.sqrt(area / nn)
    se = F.lit(CE_SE_CONST) * F.sqrt(area) / nn
    return per_cell.select(
        "cell", "n",
        (F.round(mean_nn, 6) + F.lit(0.0)).alias("mean_nn_u"),
        (F.round(r_exp, 6) + F.lit(0.0)).alias("r_expected_u"),
        (F.round(mean_nn / r_exp, 6) + F.lit(0.0)).alias("ce_index"),
        (F.round((mean_nn - r_exp) / se, 6) + F.lit(0.0)).alias("z_ce"),
    )
