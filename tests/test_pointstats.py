"""nn_stats_cells (operators/pointstats.py): hand-built point sets with
known within-cell nearest-neighbor geometry."""

from __future__ import annotations

import math

import pytest

from xutil_spark.operators.pointstats import CE_SE_CONST, nn_stats_cells

_Z = 8


def _cell_area_u(lat: float, lon: float) -> float:
    """Planar micro-degree² area of the z8 cell containing (lon, lat) —
    independent replay of the operator's Mercator-row formula."""
    n = 2.0 ** _Z
    lr = math.radians(lat)
    y = math.floor((1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr))
                    / math.pi) / 2.0 * n)

    def row_lat(yv):
        m = math.pi - 2.0 * math.pi * yv / n
        return math.degrees(math.atan(0.5 * (math.exp(m) - math.exp(-m))))

    dlon_u = 1e6 * 360.0 / n
    return dlon_u * (row_lat(y) - row_lat(y + 1)) * 1e6


def test_nn_three_points_on_a_line(spark):
    # 100 and 300 micro-degree gaps along a parallel: NN dists are
    # (100, 100, 300) → mean 500/3
    rows = [(1, 100.0001, 30.0), (2, 100.0002, 30.0), (3, 100.0005, 30.0)]
    df = spark.createDataFrame(rows, "event_id long, lon double, lat double")
    out = nn_stats_cells(df, _Z).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 3
    assert r.mean_nn_u == round(500.0 / 3.0, 6)
    area = _cell_area_u(30.0, 100.0001)
    r_exp = 0.5 * math.sqrt(area / 3.0)
    assert r.r_expected_u == pytest.approx(round(r_exp, 6), abs=1e-6)
    assert r.ce_index == pytest.approx(round((500.0 / 3.0) / r_exp, 6),
                                       abs=1e-6)
    se = CE_SE_CONST * math.sqrt(area) / 3.0
    assert r.z_ce == pytest.approx(round((500.0 / 3.0 - r_exp) / se, 6),
                                   abs=1e-6)


def test_nn_singleton_cell_drops(spark):
    rows = [(1, 100.0001, 30.0), (2, 100.0002, 30.0),
            (3, 170.0, -40.0)]  # 3 is alone in its cell
    df = spark.createDataFrame(rows, "event_id long, lon double, lat double")
    out = nn_stats_cells(df, _Z).collect()
    assert len(out) == 1 and out[0].n == 2


def test_nn_coincident_points_count_as_zero(spark):
    rows = [(1, 100.0001, 30.0), (2, 100.0001, 30.0), (3, 100.0004, 30.0)]
    df = spark.createDataFrame(rows, "event_id long, lon double, lat double")
    r = nn_stats_cells(df, _Z).collect()[0]
    # NN dists: (0, 0, 300) → mean 100; extreme clustering ⇒ CE ≪ 1
    assert r.mean_nn_u == 100.0
    assert r.ce_index < 0.2
    assert r.z_ce < 0.0


def test_nn_vertical_pair_uses_lat_units(spark):
    rows = [(1, 100.0001, 30.0), (2, 100.0001, 30.0004)]
    df = spark.createDataFrame(rows, "event_id long, lon double, lat double")
    r = nn_stats_cells(df, _Z).collect()[0]
    assert (r.n, r.mean_nn_u) == (2, 400.0)


def test_ce_se_const_is_the_textbook_value():
    """Regression: an earlier revision halved √((4−π)/(4π)) to 0.13068,
    doubling every z_ce — borderline cells (true z≈1.2) read as
    significant (z≈2.4)."""
    assert CE_SE_CONST == pytest.approx(0.26136, abs=5e-6)
