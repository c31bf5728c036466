"""Segment×segment crossing join — straddle-test semantics + a brute
all-pairs scalar cross-check."""

import pandas as pd
from pyspark.sql import Row

from xutil_spark.operators.intersections import crossing_counts, crossing_pairs


def _df(spark, rows, id_col):
    return spark.createDataFrame([
        Row(**{id_col: i, "x1": float(a), "y1": float(b),
               "x2": float(c), "y2": float(d)})
        for i, (a, b, c, d) in rows
    ])


_COLS = ("x1", "y1", "x2", "y2")


def _pairs(spark, A, B, zoom=8):
    return {
        (r.aid, r.bid)
        for r in crossing_pairs(
            _df(spark, A, "aid"), _df(spark, B, "bid"), zoom=zoom,
            a_cols=_COLS, b_cols=_COLS).collect()
    }


def test_basic_cross_and_miss(spark):
    A = [(1, (0.0, -1.0, 0.0, 1.0)),   # vertical through origin
         (2, (5.0, -1.0, 5.0, 1.0))]   # vertical far away
    B = [(10, (-1.0, 0.0, 1.0, 0.0))]  # horizontal through origin
    assert _pairs(spark, A, B) == {(1, 10)}


def test_proper_only_touch_and_collinear_excluded(spark):
    A = [(1, (0.0, 0.0, 1.0, 0.0)),    # touches B10 at endpoint
         (2, (0.0, 0.0, 2.0, 0.0)),    # collinear with B11
         (3, (0.5, 0.5, 0.5, 0.5))]    # zero-length on B11? (degenerate)
    B = [(10, (1.0, 0.0, 1.0, 1.0)),
         (11, (0.5, 0.0, 3.0, 0.0))]
    assert _pairs(spark, A, B) == set()


def test_matches_scalar_brute(spark):
    def ccw(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    def crosses(a, b):
        a1x, a1y, a2x, a2y = a
        b1x, b1y, b2x, b2y = b
        d1 = ccw(a1x, a1y, a2x, a2y, b1x, b1y)
        d2 = ccw(a1x, a1y, a2x, a2y, b2x, b2y)
        d3 = ccw(b1x, b1y, b2x, b2y, a1x, a1y)
        d4 = ccw(b1x, b1y, b2x, b2y, a2x, a2y)
        return d1 * d2 < 0 and d3 * d4 < 0

    A, B = [], []
    for i in range(30):
        h = (i * 2654435761) % 1048576
        A.append((i, (100.0 + h / 1048576.0 * 3.0,
                      30.0 + (h * 7 % 1048576) / 1048576.0 * 2.0,
                      100.0 + (h * 13 % 1048576) / 1048576.0 * 3.0,
                      30.0 + (h * 29 % 1048576) / 1048576.0 * 2.0)))
    for j in range(20):
        h = (j * 97 + 11) * 1597334677 % 1048576
        B.append((j, (100.0 + h / 1048576.0 * 3.0,
                      30.0 + (h * 5 % 1048576) / 1048576.0 * 2.0,
                      100.0 + (h * 17 % 1048576) / 1048576.0 * 3.0,
                      30.0 + (h * 23 % 1048576) / 1048576.0 * 2.0)))
    want = {(i, j) for i, a in A for j, b in B if crosses(a, b)}
    # two zooms: blocking must not change the result
    assert _pairs(spark, A, B, zoom=7) == want
    assert _pairs(spark, A, B, zoom=10) == want
    assert want  # non-degenerate fixture


def test_crossing_counts_groups(spark):
    pairs = spark.createDataFrame([
        Row(aid=1, bid=10, user=1),
        Row(aid=2, bid=10, user=1),
        Row(aid=3, bid=10, user=2),
        Row(aid=4, bid=11, user=3),
    ])
    out = {r.bid: (r.n_crossings, r.n_groups)
           for r in crossing_counts(pairs, b_id="bid", group_a="user").collect()}
    assert out == {10: (3, 2), 11: (1, 1)}


def test_emit_point_exact_crossing(spark):
    # vertical x=0.5 crosses horizontal y=0.25 at (0.5, 0.25)
    A = [(1, (0.5, 0.0, 0.5, 1.0))]
    B = [(10, (0.0, 0.25, 2.0, 0.25))]
    out = crossing_pairs(
        _df(spark, A, "aid"), _df(spark, B, "bid"), zoom=8,
        a_cols=_COLS, b_cols=_COLS, emit_point=True).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.aid, r.bid) == (1, 10)
    assert (r.t_a, r.px, r.py) == (0.25, 0.5, 0.25)


def test_emit_point_on_both_segments(spark):
    # the emitted point must lie inside both segments' bboxes
    A = [(1, (100.0, 30.0, 103.0, 32.0))]
    B = [(10, (100.0, 32.0, 103.0, 30.0))]
    out = crossing_pairs(
        _df(spark, A, "aid"), _df(spark, B, "bid"), zoom=8,
        a_cols=_COLS, b_cols=_COLS, emit_point=True).collect()
    assert len(out) == 1
    r = out[0]
    assert 0.0 < r.t_a < 1.0
    assert 100.0 <= r.px <= 103.0 and 30.0 <= r.py <= 32.0
