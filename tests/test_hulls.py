"""Convex-hull tile summarization (operators/hulls.py)."""

import numpy as np
import pytest

from xutil_spark.operators.hulls import hull_stats, monotone_chain, tile_hull_stats


def test_monotone_chain_square_with_interior_and_collinear():
    pts = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
           (2.0, 2.0), (2.0, 0.0), (1.0, 1.0), (0.0, 0.0)]
    hull = monotone_chain(pts)
    # strictly convex: the collinear edge midpoint (2,0) is dropped
    assert hull == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    n, hn, area, cx, cy = hull_stats(pts)
    assert (n, hn) == (7, 4)
    assert area == pytest.approx(16.0)
    assert (cx, cy) == (pytest.approx(2.0), pytest.approx(2.0))


def test_hull_stats_degenerate():
    # single point, duplicate point, collinear segment
    assert hull_stats([(1.0, 2.0), (1.0, 2.0)]) == (1, 1, 0.0, 1.0, 2.0)
    n, hn, area, cx, cy = hull_stats([(0.0, 0.0), (2.0, 2.0), (1.0, 1.0)])
    assert area == 0.0
    assert (cx, cy) == (1.0, 1.0)


def test_hull_contains_all_points_property():
    rng = np.random.RandomState(11)
    pts = [(float(x), float(y)) for x, y in rng.uniform(-5, 5, (300, 2))]
    hull = monotone_chain(pts)
    assert len(hull) >= 3
    # CCW orientation: every point is left-of (or on) every directed edge
    for i in range(len(hull)):
        ax, ay = hull[i]
        bx, by = hull[(i + 1) % len(hull)]
        for px, py in pts:
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            assert cross >= -1e-9


def test_tile_hull_stats_matches_local(spark):
    rng = np.random.RandomState(3)
    rows = [(float(x), float(y)) for x, y in
            np.column_stack([rng.uniform(100, 120, 500),
                             rng.uniform(20, 40, 500)])]
    # duplicates must collapse into n_pts
    rows += rows[:25]
    df = spark.createDataFrame(rows, ["lon", "lat"])
    got = {r["cell"]: r for r in tile_hull_stats(df, zoom=4).collect()}

    import math
    cells = {}
    for lon, lat in rows:
        x = math.floor((lon + 180.0) / 360.0 * 16.0)
        rad = lat * math.pi / 180.0
        y = math.floor((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
                        / math.pi) / 2.0 * 16.0)
        cells.setdefault((4 << 58) | (x << 29) | y, []).append((lon, lat))
    assert set(got) == set(cells)
    for c, p in cells.items():
        n, hn, area, cx, cy = hull_stats(p)
        r = got[c]
        assert (r["n_pts"], r["hull_n"]) == (n, hn)
        assert r["area"] == area and r["cx"] == cx and r["cy"] == cy


def test_tile_hull_stats_salted_equals_unsalted(spark):
    """The hot-cell salted path (partial hulls -> hull-of-hulls merge)
    returns the unsalted result bit-for-bit: hull(hull(A) u hull(B)) ==
    hull(A u B), distinct counts additive across value-partitioned
    buckets."""
    rng = np.random.RandomState(9)
    rows = [(float(x), float(y)) for x, y in
            np.column_stack([rng.uniform(100, 118, 800),
                             rng.uniform(22, 42, 800)])]
    rows += rows[:40]  # duplicates must not double-count
    df = spark.createDataFrame(rows, ["lon", "lat"])
    plain = {r["cell"]: tuple(r) for r in tile_hull_stats(df, zoom=4).collect()}
    salted = {r["cell"]: tuple(r)
              for r in tile_hull_stats(df, zoom=4, salt=7).collect()}
    assert plain == salted and len(plain) > 3
