"""Per-tile convex-hull summarization: collapse each tile cell's point
cloud to its convex hull plus shoelace area and polygon centroid — the
vector-summary stage of a tile pyramid (cheap per-cell geometry a map
renderer or coverage audit consumes instead of raw points).

Engine addition: the reference's geometry toolkit stops at per-ring
shoelace orientation (``IsClockwise``, /root/reference/geo.go:324-334);
the hull/area/centroid aggregate extends it to grouped point clouds.

Scale shape: one shuffle keyed on the tile cell (map-side nothing to
combine — hulls aren't decomposable — but each group's payload is just
its own points), then per-cell O(n log n) monotone chain inside
``applyInPandas``.  Dense urban cells skew the shuffle exactly like the
tile-assignment aggregations; the same ``salt_hot_cells`` +
hull-of-hulls merge (hull(∪ salted hulls) == hull(all points)) applies
when a single cell outgrows an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native


def _cross(o, a, b) -> float:
    """z of (a−o)×(b−o); plain floats, fixed op order (oracle parity)."""
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(points) -> list[tuple[float, float]]:
    """Andrew's monotone chain over DISTINCT points, counter-clockwise,
    first vertex = lexicographic minimum.  Strictly convex (collinear
    boundary points dropped: cross ≤ 0 pops)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts
    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0.0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0.0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def hull_stats(points) -> tuple[int, int, float, float, float]:
    """(n_distinct, hull_n, area, cx, cy) of a point iterable.

    Area = shoelace/2 of the CCW hull (≥ 0); centroid = polygon
    centroid Σ(x_i+x_{i+1})·cr_i / (3·Σcr_i).  Degenerate clouds
    (< 3 hull vertices or zero signed area) get area 0 and the
    arithmetic mean of the distinct points as centroid.  Every sum is
    a sequential plain-Python loop so an independent re-run reproduces
    the doubles bit-for-bit; outputs rounded to 8 dp (Python round)."""
    pts = sorted(set(points))
    hull = monotone_chain(pts)
    s = cx = cy = 0.0
    for i in range(len(hull)):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % len(hull)]
        cr = x1 * y2 - x2 * y1
        s += cr
        cx += (x1 + x2) * cr
        cy += (y1 + y2) * cr
    if len(hull) < 3 or s == 0.0:
        mx = my = 0.0
        for x, y in pts:
            mx += x
            my += y
        n = float(len(pts))
        return len(pts), len(hull), 0.0, round(mx / n, 8), round(my / n, 8)
    return (
        len(pts), len(hull),
        round(s / 2.0, 8), round(cx / (3.0 * s), 8), round(cy / (3.0 * s), 8),
    )


def tile_hull_stats(
    pts: DataFrame, zoom: int = 8,
    lon_col: str = "lon", lat_col: str = "lat",
    salt: int = 0,
) -> DataFrame:
    """Group points by packed tile cell at ``zoom`` (JVM-native encode,
    functions/native.py) and reduce each cell to hull statistics.

    Output: (cell, n_pts, hull_n, area, cx, cy) — n_pts counts DISTINCT
    coordinates (the derived point tables carry exact duplicate rows),
    area in deg² on the lon/lat plane.

    ``salt > 1`` is the hot-cell path for skewed clouds (one urban cell
    holding 10^9 points would otherwise land on a single task): points
    first reduce per (cell, hash(point) % salt) — each partial keeps
    only its DISTINCT-point count and hull vertices — then the final
    per-cell reduce runs the hull over the ≤ salt·|partial hull| merged
    vertices.  Exact, not approximate: hull(hull(A) ∪ hull(B)) =
    hull(A ∪ B), partitioning by the point value keeps the distinct
    counts additive, and the final vertex set is identical to the
    unsalted hull's input extremes, so area/centroid doubles match
    bit-for-bit."""
    import pandas as pd

    src = pts.select(
        native.cell(lon_col, lat_col, zoom).alias("cell"),
        F.col(lon_col).alias("_x"), F.col(lat_col).alias("_y"),
    )

    def stats(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n, hn, area, cx, cy = hull_stats(
            zip(pdf["_x"].tolist(), pdf["_y"].tolist())
        )
        return pd.DataFrame(
            {"cell": [key[0]], "n_pts": [n], "hull_n": [hn],
             "area": [area], "cx": [cx], "cy": [cy]}
        )

    schema = ("cell long, n_pts long, hull_n long, "
              "area double, cx double, cy double")
    if salt <= 1:
        return src.groupBy("cell").applyInPandas(stats, schema=schema)

    # ---- salted two-level reduce: partial hulls, then hull-of-hulls.
    # Each bucket emits ONE row (distinct count + hull vertex arrays),
    # so the merge sums counts directly and re-hulls ≤ salt·|hull|
    # vertices — dim-scale however many points the hot cell held.
    def partial(key, pdf: pd.DataFrame) -> pd.DataFrame:
        uniq = sorted(set(zip(pdf["_x"].tolist(), pdf["_y"].tolist())))
        hull = monotone_chain(uniq)
        return pd.DataFrame(
            {"cell": [key[0]], "n_part": [len(uniq)],
             "xs": [[p[0] for p in hull]], "ys": [[p[1] for p in hull]]}
        )

    parts = (
        src.withColumn("_salt", F.pmod(F.xxhash64("_x", "_y"), F.lit(salt)))
        .groupBy("cell", "_salt")
        .applyInPandas(
            partial,
            schema="cell long, n_part long, xs array<double>, ys array<double>",
        )
    )

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        verts = [
            (float(x), float(y))
            for xs, ys in zip(pdf["xs"], pdf["ys"])
            for x, y in zip(xs, ys)
        ]
        _, hn, area, cx, cy = hull_stats(verts)
        return pd.DataFrame(
            {"cell": [key[0]], "n_pts": [int(pdf["n_part"].sum())],
             "hull_n": [hn], "area": [area], "cx": [cx], "cy": [cy]}
        )

    return parts.groupBy("cell").applyInPandas(merge, schema=schema)
