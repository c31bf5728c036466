"""Horn surface + global autocorrelation (operators/terrain.py) on
hand-built cell grids with closed-form expected values."""

import math

import pytest

_ZB, _XB = 288230376151711744, 536870912
_Z = 4


def _cell(x, y, z=_Z):
    return z * _ZB + x * _XB + y


def _counts(spark, cells):
    return spark.createDataFrame(
        [(_cell(x, y), v) for x, y, v in cells], "cell long, cnt long")


def test_horn_gradients_2x2_block(spark):
    from xutil_spark.operators.terrain import _SUN_UP_8, horn_surface

    # values: (5,5)=10 (6,5)=20 (5,6)=30 (6,6)=40
    df = _counts(spark, [(5, 5, 10), (6, 5, 20), (5, 6, 30), (6, 6, 40)])
    out = {(r.cell, ): r for r in horn_surface(df, _Z).collect()}
    r = out[(_cell(5, 5), )]
    # present neighbors of (5,5): E(+1,0) w=(2,0); S(0,+1) w=(0,2);
    # SE(+1,+1) w=(1,1) → sxz=80 swx=3 gx=80-3·10=50; syz=100 gy=70
    assert (r.gx, r.gy) == (50, 70)
    g2 = 50 * 50 + 70 * 70
    assert r.slope_deg == round(math.degrees(math.atan(math.sqrt(g2) / 8)), 6)
    a = math.degrees(math.atan2(-50, 70))
    assert r.aspect_deg == round(a + 360.0 if a < 0 else a, 6)
    hs = 255.0 * max(0.0, (25.0 + 35.0 + _SUN_UP_8) / math.sqrt(g2 + 64))
    assert r.hillshade == round(hs)
    # symmetric corner: (6,6) sees W(-1,0) SE?… its neighbors are
    # (5,6) w=(-2,0), (6,5) w=(0,-2), (5,5) w=(-1,-1)
    r2 = out[(_cell(6, 6), )]
    sxz = -2 * 30 + 0 - 1 * 10
    syz = 0 + -2 * 20 - 1 * 10
    assert (r2.gx, r2.gy) == (sxz + 3 * 40, syz + 3 * 40)


def test_horn_flat_and_isolated(spark):
    from xutil_spark.operators.terrain import horn_surface

    # constant 2×2 block → all gradients 0, aspect NULL, shade from
    # the flat normal: 255·(8·sin45 / 8) = 255·sin45 ≈ 180
    df = _counts(spark, [(5, 5, 7), (6, 5, 7), (5, 6, 7), (6, 6, 7)])
    rows = horn_surface(df, _Z).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.gx, r.gy, r.slope_deg) == (0, 0, 0.0)
        assert r.aspect_deg is None
        assert r.hillshade == round(255.0 * math.sin(math.radians(45.0)))
    # isolated occupied cell: no occupied neighbor → excluded (the
    # surface is undefined beyond the center; oracle mirrors)
    iso = _counts(spark, [(1, 1, 5)])
    assert horn_surface(iso, _Z).count() == 0


def test_horn_antimeridian_wrap(spark):
    from xutil_spark.operators.terrain import horn_surface

    # x=0 and x=n−1 are adjacent across the antimeridian
    n = 2 ** _Z
    df = _counts(spark, [(0, 5, 10), (n - 1, 5, 30)])
    out = {r.cell: r for r in horn_surface(df, _Z).collect()}
    r = out[_cell(0, 5)]
    # sole neighbor W(−1,0) w=(−2,0): gx = −2·30 − (−2)·10 = −40
    assert (r.gx, r.gy) == (-40, 0)


def test_autocorr_two_cell_exact(spark):
    from xutil_spark.operators.terrain import spatial_autocorr

    # x = [1, 3] adjacent: I = −1 exactly, Var = 0 → z NULL, C = 1
    df = _counts(spark, [(5, 5, 1), (6, 5, 3)])
    r = spatial_autocorr(df, _Z).collect()[0]
    assert (r.n_cells, r.w_pairs) == (2, 2)
    assert r.morans_i == -1.0
    assert r.z_i is None
    assert r.gearys_c == 1.0


def test_autocorr_constant_surface_null(spark):
    from xutil_spark.operators.terrain import spatial_autocorr

    df = _counts(spark, [(5, 5, 4), (6, 5, 4), (7, 5, 4)])
    r = spatial_autocorr(df, _Z).collect()[0]
    assert (r.morans_i, r.z_i, r.gearys_c) == (None, None, None)


def test_autocorr_clustered_positive(spark):
    from xutil_spark.operators.terrain import spatial_autocorr

    # two tight value clusters far apart → strong positive I, C < 1
    cells = [(5, 5, 10), (6, 5, 10), (5, 6, 10),
             (12, 12, 1), (13, 12, 1), (12, 13, 1)]
    r = spatial_autocorr(_counts(spark, cells), _Z).collect()[0]
    assert r.morans_i == pytest.approx(1.0, abs=1e-9)
    assert r.gearys_c == 0.0
    assert r.z_i is not None and r.z_i > 2.0


def test_local_moran_two_cell(spark):
    from xutil_spark.operators.terrain import local_moran

    # x = [1, 3]: x̄ = 2, m₂ = 1; both cells Ii = −1, opposite outliers
    df = _counts(spark, [(5, 5, 1), (6, 5, 3)])
    out = {r.v: r for r in local_moran(df, _Z).collect()}
    assert (out[1].local_i, out[1].quadrant) == (-1.0, "LH")
    assert (out[3].local_i, out[3].quadrant) == (-1.0, "HL")


def test_local_moran_clustered(spark):
    from xutil_spark.operators.terrain import local_moran

    cells = [(5, 5, 10), (6, 5, 10), (5, 6, 10),
             (12, 12, 1), (13, 12, 1), (12, 13, 1)]
    rows = local_moran(_counts(spark, cells), _Z).collect()
    # x̄ = 5.5, m₂ = 20.25; every cell: |dev| = 4.5, lagdev = ±9 → Ii = 2
    for r in rows:
        assert r.local_i == 2.0
        assert r.quadrant == ("HH" if r.v == 10 else "LL")


def test_focal_stats_block_and_isolated(spark):
    from xutil_spark.operators.terrain import focal_stats

    df = _counts(spark, [(5, 5, 10), (6, 5, 20), (5, 6, 30), (6, 6, 40),
                         (1, 1, 7)])
    out = {r.cell: r for r in focal_stats(df, _Z, radius=1).collect()}
    r = out[_cell(5, 5)]
    assert (r.fcnt, r.fsum, r.fmin, r.fmax, r.frange, r.fmean) == (
        4, 100, 10, 40, 30, 25.0)
    # isolated cell keeps itself (include_self default) — unlike horn
    iso = out[_cell(1, 1)]
    assert (iso.fcnt, iso.fsum, iso.fmean) == (1, 7, 7.0)


def test_bilinear_upsample_weights(spark):
    from xutil_spark.operators.interpolate import bilinear_upsample

    def child(x, y):
        return (_Z + 1) * _ZB + x * _XB + y

    # isolated parent: every child sees only it → est == parent value
    iso = bilinear_upsample(_counts(spark, [(3, 3, 16)]), _Z)
    rows = {r.cell: r for r in iso.collect()}
    assert set(rows) == {child(6, 6), child(7, 6), child(6, 7), child(7, 7)}
    for r in rows.values():
        assert (r.wsum, r.vwsum, r.est) == (9, 144, 16.0)

    # two adjacent parents: child (11,10) mixes 3:1 in x → est 20
    two = bilinear_upsample(_counts(spark, [(5, 5, 16), (6, 5, 32)]), _Z)
    out = {r.cell: r for r in two.collect()}
    r = out[child(11, 10)]
    assert (r.wsum, r.vwsum, r.est) == (12, 240, 20.0)
    # the mirror child on the other parent mixes 3:1 the other way
    r2 = out[child(12, 10)]
    assert (r2.wsum, r2.vwsum, r2.est) == (12, 3 * 3 * 32 + 3 * 16, 28.0)
    # children of unoccupied parents (e.g. under (4,5)) are dropped
    assert child(9, 10) not in out
