"""gi_star: Getis-Ord hotspot z-scores on hand-built grids, checked
against an independent pure-Python replay."""

import math

import pandas as pd

from xutil_spark.kernels.tiles import cell_pack
from xutil_spark.operators.hotspot import gi_star


def _expected(cells: dict, z: int, radius: int = 1) -> dict:
    """cells: (x, y) -> cnt.  Returns (x, y) -> (gsum, wn, z or None)."""
    n_axis = 2 ** z
    n = len(cells)
    sx = sum(cells.values())
    sxx = sum(v * v for v in cells.values())
    xbar = sx / n
    svar = (sxx / n) - (xbar * xbar)
    out = {}
    for (x, y) in cells:
        gsum = wn = 0
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                ny = y + dy
                if not (0 <= ny < n_axis):
                    continue
                key = ((x + dx) % n_axis, ny)
                if key in cells:
                    gsum += cells[key]
                    wn += 1
        u = (n * wn - wn * wn) / (n - 1)
        denom = math.sqrt(svar) * math.sqrt(u)
        zs = (round((gsum - xbar * wn) / denom, 6) + 0.0
              if denom > 0 else None)
        out[(x, y)] = (gsum, wn, zs)
    return out


def _run(spark, cells: dict, z: int, radius: int = 1) -> dict:
    df = spark.createDataFrame(pd.DataFrame({
        "cell": [int(cell_pack(x, y, z)) for (x, y) in cells],
        "cnt": list(cells.values()),
    }))
    return {r["cell"]: (r["gsum"], r["wn"], r["z"])
            for r in gi_star(df, z, radius=radius).collect()}


def test_hot_cluster_scores_high(spark):
    z = 6
    cells = {(10 + dx, 20 + dy): 50 for dx in (0, 1) for dy in (0, 1)}
    for i in range(12):
        cells[(30 + i, 40)] = 1  # cold background far away
    got = _run(spark, cells, z)
    exp = _expected(cells, z)
    assert len(got) == len(exp)
    for (x, y), e in exp.items():
        assert got[int(cell_pack(x, y, z))] == e
    hot = got[int(cell_pack(10, 20, z))]
    cold = got[int(cell_pack(35, 40, z))]
    assert hot[2] > 1.5 > cold[2]


def test_x_wraps_and_pole_rows_drop(spark):
    """A cell at x=0 sees its x=2^z-1 neighbor through the wrap; y=-1
    neighbors don't exist so wn shrinks at the top row."""
    z = 4
    cells = {(0, 0): 5, (15, 0): 7, (0, 1): 2, (8, 8): 1}
    got = _run(spark, cells, z)
    exp = _expected(cells, z)
    for (x, y), e in exp.items():
        assert got[int(cell_pack(x, y, z))] == e
    # (0,0)'s ring: wrapped (15,0), below (0,1), itself -> wn=3
    assert got[int(cell_pack(0, 0, z))][1] == 3


def test_uniform_grid_yields_null_z(spark):
    """All counts equal -> population std is 0 -> z is NULL, never a
    division blow-up."""
    z = 5
    cells = {(x, 10): 4 for x in range(6)}
    got = _run(spark, cells, z)
    assert all(v[2] is None for v in got.values())
    exp = _expected(cells, z)
    for (x, y), (gsum, wn, _) in exp.items():
        assert got[int(cell_pack(x, y, z))][:2] == (gsum, wn)


def test_radius_two_ring(spark):
    z = 6
    cells = {(20, 20): 9, (22, 20): 3, (23, 23): 5, (40, 40): 2}
    got = _run(spark, cells, z, radius=2)
    exp = _expected(cells, z, radius=2)
    for (x, y), e in exp.items():
        assert got[int(cell_pack(x, y, z))] == e
    # (22,20)'s Chebyshev-2 ring holds itself and (20,20) — (23,23)
    # is Chebyshev 3 away: wn=2
    assert got[int(cell_pack(22, 20, z))][1] == 2


def test_single_occupied_cell_yields_null_z_not_ansi_error(spark):
    """Regression: n = 1 makes the Gi* variance term divide by n−1 = 0;
    it must yield NULL z (try_divide), not a DIVIDE_BY_ZERO abort under
    Spark's default ANSI mode."""
    rows = _run(spark, {(100, 100): 7}, 8)
    assert list(rows.values()) == [(7, 1, None)]
