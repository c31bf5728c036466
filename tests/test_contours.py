"""contour_segments (operators/contours.py): marching squares on
hand-built lattices, checked against an independent pure-Python
replay of the 16-case table."""

import math

from xutil_spark.operators.contours import _CASE_SEGMENTS, contour_segments

_Z = 5
_NAXIS = 2 ** _Z


def _df(spark, cells):
    """cells: (x, y) -> value → (cell, cnt) DataFrame at zoom _Z."""
    rows = [(_Z * (1 << 58) + x * (1 << 29) + y, int(v))
            for (x, y), v in cells.items()]
    return spark.createDataFrame(rows, "cell long, cnt long")


def _replay(cells, t):
    """Pure-Python marching squares over the sparse dict."""
    out = {}
    blocks = set()
    for (x, y) in cells:
        for dx, dy in ((0, 0), (-1, 0), (0, -1), (-1, -1)):
            by = y + dy
            if 0 <= by < _NAXIS - 1:
                blocks.add(((x + dx) % _NAXIS, by))
    for (bx, by) in blocks:
        tl = cells.get((bx, by), 0)
        tr = cells.get(((bx + 1) % _NAXIS, by), 0)
        bl = cells.get((bx, by + 1), 0)
        br = cells.get(((bx + 1) % _NAXIS, by + 1), 0)
        case = ((tl >= t) * 8 + (tr >= t) * 4 + (br >= t) * 2
                + (bl >= t) * 1)
        if case in (0, 15):
            continue
        for i, (ea, eb) in enumerate(_CASE_SEGMENTS[case]):
            def pt(e):
                if e == 0:
                    return ((t - tl) / (tr - tl), 0.0)
                if e == 1:
                    return (1.0, (t - tr) / (br - tr))
                if e == 2:
                    return ((t - bl) / (br - bl), 1.0)
                return (0.0, (t - tl) / (bl - tl))
            (fx1, fy1), (fx2, fy2) = pt(ea), pt(eb)
            out[(bx, by, i + 1)] = (
                case,
                round(bx + fx1, 6), round(by + fy1, 6),
                round(bx + fx2, 6), round(by + fy2, 6),
            )
    return out


def _collect(spark, cells, t):
    got = {}
    df = contour_segments(_df(spark, cells), _Z, t, as_lonlat=False)
    for r in df.collect():
        got[(r.bx, r.by, r.seg)] = (r.case_id, r.x1, r.y1, r.x2, r.y2)
    return got


def test_single_peak_ring(spark):
    # one hot cell in a cold neighborhood → a closed diamond of 4 segs
    cells = {(10, 10): 100}
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1),
                   (1, -1), (-1, 1)):
        cells[(10 + dx, 10 + dy)] = 10
    got = _collect(spark, cells, 50.0)
    assert got == _replay(cells, 50.0)
    assert len(got) == 4  # the 4 blocks around the peak each cut once


def test_saddle_conventions(spark):
    # exact saddle: TR/BL high (case 5) and TL/BR high (case 10)
    cells5 = {(4, 4): 1, (5, 4): 9, (4, 5): 9, (5, 5): 1}
    got5 = _collect(spark, cells5, 5.0)
    assert got5 == _replay(cells5, 5.0)
    assert {k[2] for k in got5 if k[:2] == (4, 4)} == {1, 2}
    cells10 = {(8, 4): 9, (9, 4): 1, (8, 5): 1, (9, 5): 9}
    got10 = _collect(spark, cells10, 5.0)
    assert got10 == _replay(cells10, 5.0)


def test_antimeridian_wrap_and_pole_clamp(spark):
    # hot cell in the last column: its TR-corner blocks wrap to x=0
    cells = {(_NAXIS - 1, 3): 100, (0, 3): 10}
    got = _collect(spark, cells, 50.0)
    assert got == _replay(cells, 50.0)
    assert any(k[0] == _NAXIS - 1 for k in got)
    # hot cell on the top row: no block above (y = -1 dropped)
    cells_top = {(6, 0): 100, (6, 1): 10, (7, 0): 10}
    got_top = _collect(spark, cells_top, 50.0)
    assert got_top == _replay(cells_top, 50.0)
    assert all(k[1] >= 0 for k in got_top)


def test_lonlat_projection_matches_scalar(spark):
    cells = {(10, 10): 100, (11, 10): 10}
    df = contour_segments(_df(spark, cells), _Z, 50.0, as_lonlat=True)
    for r in df.collect():
        # recompute from the rounded lattice coords: allow 1e-6 slack
        # (engine projects from unrounded ones)
        lon = (r.x1 + 0.5) / _NAXIS * 360.0 - 180.0
        nv = math.pi - 2.0 * math.pi * (r.y1 + 0.5) / _NAXIS
        lat = 180.0 / math.pi * math.atan(0.5 * (math.exp(nv)
                                                 - math.exp(-nv)))
        assert abs(r.lon1 - lon) < 1e-4
        assert abs(r.lat1 - lat) < 1e-4


def test_interior_plateau_emits_no_segments(spark):
    # a 3x3 plateau all ≥ T: interior block is case 15 → nothing;
    # only the boundary blocks cut
    cells = {(x, y): 100 for x in (4, 5, 6) for y in (4, 5, 6)}
    got = _collect(spark, cells, 50.0)
    assert got == _replay(cells, 50.0)
    # blocks whose 4 corners all sit inside the plateau are case 15
    assert (4, 4, 1) not in got
    assert (5, 5, 1) not in got
