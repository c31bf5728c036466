"""Origin-destination flow matrix over tile cells — mobility analytics.

The standard OD aggregation over any entity trail (user sessions, GPS
tracks, image capture sequences): order each entity's events in time,
take every consecutive pair of cell assignments as one (from_cell →
to_cell) movement, and count movements per directed cell pair.  The
reference has no trajectory layer at all — this extends its tile
toolkit (gis.go:263-267 ``Wgs2Tile``) the way its users chain it in
pipelines (cell encode → group → count), so the cell encode is the
same packed ``native.cell_from_lonlat`` used by every other tile op.

Scale shape (10^12 events): one shuffle to order within entities (the
window partitions by entity — entity cardinality is the parallelism,
no global sort), then one map-side-combined count shuffle at flow-pair
cardinality (≤ occupied-cells², in practice ≪ fact size).  Skew: a hot
entity (bot with millions of events) concentrates one window
partition — pre-split such entities by day via ``order_within`` being
(day, ts) if needed; hot flow PAIRS are map-side combined away.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xutil_spark.operators.spatial_join import with_cell


def od_flows(
    events: DataFrame,
    zoom: int,
    entity: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
    self_loops: bool = False,
    min_count: int = 1,
) -> DataFrame:
    """(entity, ts, lon, lat) → (from_cell, to_cell, n_moves,
    n_entities) for every consecutive-in-time pair of events of the
    same entity.

    ``tiebreak`` orders equal timestamps deterministically (pass the
    event id); ``self_loops=False`` drops stationary pairs (both
    events in the same cell); ``min_count`` prunes rare flows after
    the count (the usual privacy / noise floor).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(entity).orderBy(*order)
    cells = with_cell(events, zoom, lon, lat, out="_tocell")
    moved = (
        cells.withColumn("_fromcell", F.lag("_tocell").over(w))
        .filter(F.col("_fromcell").isNotNull())
    )
    if not self_loops:
        moved = moved.filter(F.col("_fromcell") != F.col("_tocell"))
    return (
        moved.groupBy(
            F.col("_fromcell").alias("from_cell"),
            F.col("_tocell").alias("to_cell"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.countDistinct(entity).alias("n_entities"),
        )
        .filter(F.col("n_moves") >= F.lit(int(min_count)))
    )


def cell_center(cell_col, zoom: int):
    """(lon, lat) of a packed cell's center — the inverse of the tile
    encode at (x+0.5, y+0.5), the Mercator inversion of gis.go:269-275
    written as exp/atan (no sinh builtin in the oracle dialect, so both
    engines share the identical (e^n − e^−n)/2 tree)."""
    from xutil_spark.functions import native

    n_axis = float(2 ** zoom)
    xc = native.cell_x(cell_col).cast("double") + F.lit(0.5)
    yc = native.cell_y(cell_col).cast("double") + F.lit(0.5)
    lon = xc / F.lit(n_axis) * F.lit(360.0) - F.lit(180.0)
    n = F.lit(math.pi) - F.lit(2.0 * math.pi) * yc / F.lit(n_axis)
    lat = F.degrees(F.atan(F.lit(0.5) * (F.exp(n) - F.exp(-n))))
    return lon, lat


def gravity_flows(
    flows: DataFrame,
    zoom: int,
    q_scale: float = 1e6,
) -> DataFrame:
    """Unconstrained gravity-model calibration over an OD flow matrix
    (:func:`od_flows` output): score every observed (from_cell,
    to_cell) pair's flow against the gravity expectation

        g_ij = O_i · D_j / d_ij²          (d in km, center-to-center)
        E_ij = T · g_ij / Σ g             (total-flow-constrained k)
        ratio_ij = n_moves / E_ij         (>1 ⇒ corridor over-performs)

    where O_i / D_j are the observed out/in marginals and T the total
    movement count.  The spatial-interaction screen over mobility data
    (Zipf 1946 "P₁P₂/D"): corridors with ratio ≫ 1 are structurally
    coupled beyond what size+distance predict.

    Exactness: marginals and T are exact integer sums; g quantizes to
    an int64 (round(g·q_scale)) BEFORE the global Σg so the only
    cross-row float reduction is over integers — order-free; E and
    ratio are then one fixed float tree per pair, mirrored in the
    oracle.  ``q_scale`` sets the quantization resolution: pick it so
    typical O·D/d²_km values land well above 1 (they contribute 0 and
    a degenerate all-zero Σ yields NULL expected/ratio) and the
    largest stays below 2^63/q_scale.

    Scale: two map-side-combined marginal aggs at cell cardinality
    (broadcast back), centers decoded arithmetically from the packed
    id (no geometry join), one single-row Σ broadcast — the fact-scale
    work stays at pair cardinality throughout.
    """
    f = flows.select("from_cell", "to_cell", "n_moves")
    out_m = f.groupBy("from_cell").agg(F.sum("n_moves").alias("out_o"))
    in_m = f.groupBy("to_cell").agg(F.sum("n_moves").alias("in_d"))
    j = (
        f.join(F.broadcast(out_m), "from_cell")
        .join(F.broadcast(in_m), "to_cell")
    )
    flon, flat = cell_center(F.col("from_cell"), zoom)
    tlon, tlat = cell_center(F.col("to_cell"), zoom)
    from xutil_spark.functions import native

    d_km = native.haversine_m(flon, flat, tlon, tlat) / F.lit(1000.0)
    # try_divide: a self-loop flow (from_cell == to_cell, d_km = 0)
    # must yield NULL gravity, not an ANSI DIVIDE_BY_ZERO abort
    g = F.try_divide(
        F.col("out_o").cast("double") * F.col("in_d").cast("double"),
        d_km * d_km,
    )
    j = j.withColumn("_gq", F.round(g * F.lit(float(q_scale)), 0).cast("long"))
    tot = j.agg(
        F.sum("n_moves").alias("_t"), F.sum("_gq").alias("_sg")
    )
    j = j.join(F.broadcast(tot))
    # try_divide: NULL (not an ANSI error) on the degenerate Σgq = 0 /
    # expected = 0 edges — subexpression elimination can hoist a
    # division out of a when() guard, so the null-safety lives in the
    # operator itself
    expected = F.try_divide(
        F.col("_t").cast("double") * F.col("_gq").cast("double"),
        F.col("_sg").cast("double"),
    )
    ratio = F.when(
        expected > 0.0,
        F.try_divide(F.col("n_moves").cast("double"), expected),
    )
    return j.select(
        "from_cell", "to_cell", "n_moves", "out_o", "in_d",
        (F.round(d_km, 3) + F.lit(0.0)).alias("dist_km"),
        (F.round(expected, 6) + F.lit(0.0)).alias("expected"),
        (F.round(ratio, 6) + F.lit(0.0)).alias("ratio"),
    )


def deviational_ellipse(
    df,
    group: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
):
    """Standard deviational ellipse (Yuill 1971; ESRI "Directional
    Distribution") per group: mean center, major-axis rotation and the
    two standard deviations — the one-row shape summary of a point
    cloud that answers "where is this entity and which way does it
    spread?".

    Exactness design: coordinates round to integer MICRO-DEGREES and
    the five sufficient statistics (Σx, Σy, Σx², Σy², Σxy) are exact
    integer sums, so the ellipse is identical under any aggregation
    order; the mean center divides with half-away INTEGER rounding
    (the stay-centroid trick — float ROUND ties on the micro-degree
    grid), and θ/σ are one fixed float tree over the integer moments:

        A = Sxx′ − Syy′,  C = 2·Sxy′           (central, via raw sums)
        θ = atan((A + √(A² + 4Sxy′²)) / C)     clockwise from north;
            C = 0 → 0 if Sxx′ ≥ Syy′ else 90°  (degenerate axes)
        σₓ = √2·√((cos²θ·Sxx′ − 2cosθsinθ·Sxy′ + sin²θ·Syy′)/n)
        σy = √2·√((sin²θ·Sxx′ + 2cosθsinθ·Sxy′ + cos²θ·Syy′)/n)

    (σ in degree units on the micro-degree plane — the planar ellipse
    convention; project first for metric axes.)

    100-TB shape: ONE map-side-combined groupBy — no window, no join.
    Returns (group, n, ctr_lon, ctr_lat, angle_deg, sigma_x, sigma_y).
    """
    from pyspark.sql import functions as F

    ux = F.round(F.col(lon) * 1e6, 0).cast("long")
    uy = F.round(F.col(lat) * 1e6, 0).cast("long")
    agg = (
        df.withColumn("_ux", ux).withColumn("_uy", uy)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_ux").alias("_sx"),
            F.sum("_uy").alias("_sy"),
            F.sum(F.col("_ux") * F.col("_ux")).alias("_sxx"),
            F.sum(F.col("_uy") * F.col("_uy")).alias("_syy"),
            F.sum(F.col("_ux") * F.col("_uy")).alias("_sxy"),
        )
    )

    def ctr(s: str):
        q = F.expr(f"(2 * abs({s}) + n) div (2 * n)")
        u = F.when(F.col(s) < 0, -q).otherwise(q)
        return u.cast("double") / F.lit(1000000.0)

    n = F.col("n").cast("double")
    # central second moments from exact integer raw sums (micro-deg²)
    cxx = F.col("_sxx").cast("double") - (F.col("_sx").cast("double")
                                          * F.col("_sx").cast("double")) / n
    cyy = F.col("_syy").cast("double") - (F.col("_sy").cast("double")
                                          * F.col("_sy").cast("double")) / n
    cxy = F.col("_sxy").cast("double") - (F.col("_sx").cast("double")
                                          * F.col("_sy").cast("double")) / n
    a = cxx - cyy
    c2 = 2.0 * cxy
    theta = F.when(
        cxy != 0.0,
        F.atan((a + F.sqrt(a * a + 4.0 * cxy * cxy)) / c2),
    ).otherwise(
        F.when(cxx >= cyy, F.lit(0.0)).otherwise(F.lit(math.pi / 2.0))
    )
    # atan range (−π/2, π/2): normalize to [0, π) clockwise-from-north
    theta = F.when(theta < 0.0, theta + math.pi).otherwise(theta)
    ct, st = F.cos(theta), F.sin(theta)
    sx2 = (ct * ct * cxx - 2.0 * ct * st * cxy + st * st * cyy) / n
    sy2 = (st * st * cxx + 2.0 * ct * st * cxy + ct * ct * cyy) / n
    scale = math.sqrt(2.0) / 1e6
    sig = lambda v: F.round(F.lit(scale) * F.sqrt(F.greatest(v, F.lit(0.0))),
                            6) + F.lit(0.0)  # noqa: E731
    return agg.select(
        group, "n", ctr("_sx").alias("ctr_lon"), ctr("_sy").alias("ctr_lat"),
        (F.round(F.degrees(theta), 6) + F.lit(0.0)).alias("angle_deg"),
        sig(sx2).alias("sigma_x"), sig(sy2).alias("sigma_y"),
    )
