"""Golden + property tests for the coordinate-transform kernels.

Golden values: the reference's own published vectors —
``gisdemo`` (gis.go:359-367, comment gis.go:361: Wgs2bd of the Shanghai
Tower GPS → 121.512245, 31.239186) — plus pinned 8-dp outputs of this
line-for-line transcription on a grid over China (since both sides round
half-away-from-zero to 8 dp, equality is exact).
"""

import numpy as np
import pytest

from xutil_spark.kernels import coords, rounding

SH_LON, SH_LAT = 121.5012091398, 31.2355502882  # gis.go:360 上海中心大厦


def test_round_half_away_from_zero():
    # gonum floats.Round semantics (half away from zero), NOT banker's
    assert rounding.round_half_away(0.5, 0) == 1.0
    assert rounding.round_half_away(-0.5, 0) == -1.0
    assert rounding.round_half_away(2.5, 0) == 3.0
    assert rounding.round_half_away(1.234567895, 8) == 1.2345679
    np.testing.assert_array_equal(
        rounding.round_half_away(np.array([0.125, -0.125]), 2),
        np.array([0.13, -0.13]),
    )


def test_wgs2bd_reference_golden():
    """gis.go:361: Wgs2bd(121.5012091398, 31.2355502882) ≈ 121.512245, 31.239186."""
    lon, lat = coords.wgs2bd(SH_LON, SH_LAT)
    assert round(float(lon), 6) == 121.512245
    assert round(float(lat), 6) == 31.239186
    # full 8-dp pins from the transcription
    assert float(lon) == 121.51224514
    assert float(lat) == 31.2391863


def test_wgs2gcj_golden():
    lon, lat = coords.wgs2gcj(SH_LON, SH_LAT)
    assert (float(lon), float(lat)) == (121.50563645, 31.23353016)


def test_all_test_go_swapped_args_vector():
    """all_test.go:10-14 passes (lat, lon) swapped into Wgs2bd; replicate
    the call exactly as written and pin the transcription's output."""
    lon, lat = coords.wgs2bd(31.2355502882, 121.5012091398)
    assert (float(lon), float(lat)) == (31.24133108, 121.51535243)


def test_gcj2wgs_is_single_step_approximate_inverse():
    """gis.go:106-112 subtracts the forward offset at the GCJ point —
    NOT iterative. Round-tripping must therefore NOT be exact, only
    close (< 1e-4 deg inside China)."""
    glon, glat = coords.wgs2gcj(SH_LON, SH_LAT)
    wlon, wlat = coords.gcj2wgs(glon, glat)
    assert abs(float(wlon) - SH_LON) < 1e-4
    assert abs(float(wlat) - SH_LAT) < 1e-4
    assert (float(wlon), float(wlat)) != (SH_LON, SH_LAT)


def test_bd_gcj_roundtrip():
    glon, glat = coords.wgs2gcj(SH_LON, SH_LAT)
    blon, blat = coords.gcj2bd(glon, glat)
    g2lon, g2lat = coords.bd2gcj(blon, blat)
    assert abs(float(g2lon) - float(glon)) < 1e-6
    assert abs(float(g2lat) - float(glat)) < 1e-6


def test_vectorized_matches_scalar_on_grid():
    lons = np.arange(75.0, 135.0, 5.0)
    lats = np.arange(20.0, 55.0, 5.0)
    glon, glat = np.meshgrid(lons, lats)
    vlon, vlat = coords.wgs2gcj(glon.ravel(), glat.ravel())
    for i, (lo, la) in enumerate(zip(glon.ravel(), glat.ravel())):
        slon, slat = coords.wgs2gcj(float(lo), float(la))
        assert float(vlon[i]) == float(slon)
        assert float(vlat[i]) == float(slat)


def test_outputs_are_8dp_rounded():
    lons = np.arange(75.0, 135.0, 2.5)
    lats = np.full_like(lons, 30.0)
    for fn in (coords.wgs2gcj, coords.gcj2wgs, coords.gcj2bd,
               coords.bd2gcj, coords.wgs2bd, coords.bd2wgs):
        lon, lat = fn(lons, lats)
        np.testing.assert_array_equal(lon, rounding.round_half_away(lon, 8))
        np.testing.assert_array_equal(lat, rounding.round_half_away(lat, 8))
