"""Baidu Mercator / tile kernel tests (gis.go:285-355), quirks pinned."""

import numpy as np
import pytest

from xutil_spark.kernels import baidu

BD_LON, BD_LAT = 121.51224514, 31.2391863  # Wgs2bd of the Shanghai Tower


def test_bd09_to_mercator_golden():
    x, y = baidu.bd09_to_mercator(BD_LON, BD_LAT)
    assert float(x[0]) == pytest.approx(13526828.435328415, rel=1e-12)
    assert float(y[0]) == pytest.approx(3641487.942178627, rel=1e-12)


def test_mercator_roundtrip():
    x, y = baidu.bd09_to_mercator(BD_LON, BD_LAT)
    lng, lat = baidu.mercator_to_bd09(float(x[0]), float(y[0]))
    assert float(lng[0]) == pytest.approx(BD_LON, abs=1e-6)
    assert float(lat[0]) == pytest.approx(BD_LAT, abs=1e-6)


def test_mercator_to_bd09_abs_x_quirk():
    """gis.go:297 abs()'s x before yr, so longitude sign is dropped."""
    lng_pos, lat_pos = baidu.mercator_to_bd09(13526828.44, 3641487.94)
    lng_neg, lat_neg = baidu.mercator_to_bd09(-13526828.44, -3641487.94)
    assert float(lng_neg[0]) == float(lng_pos[0])  # sign NOT restored
    assert float(lat_neg[0]) == -float(lat_pos[0])  # sign restored


def test_bd09_to_tile_golden():
    tx, ty = baidu.bd09_to_tile(BD_LON, BD_LAT, 15)
    assert (int(tx[0]), int(ty[0])) == (6604, 1778)


def test_lng_wrap_and_lat_clamp():
    """gis.go:310-325: lng wrapped ±360, lat clamped to [-74, 74]."""
    x_wrapped, y_clamped = baidu.bd09_to_mercator(200.0, 80.0)
    x_direct, y_at74 = baidu.bd09_to_mercator(-160.0, 74.0)
    assert float(x_wrapped[0]) == float(x_direct[0])
    assert float(y_clamped[0]) == float(y_at74[0])
    # Go loop semantics at the boundary: +180 stays +180, -180 stays -180
    assert float(baidu._wrap_lng(180.0)) == 180.0
    assert float(baidu._wrap_lng(-180.0)) == -180.0
    assert float(baidu._wrap_lng(540.0)) == 180.0
    assert float(baidu._wrap_lng(-540.0)) == -180.0


def test_negative_lat_uses_band5_quirk():
    """gis.go:332-339: the reverse scan breaks at i=5 for ANY negative
    lat (lat <= -0 is true), so southern-hemisphere points all use the
    equatorial polynomial bank."""
    x_neg, y_neg = baidu.bd09_to_mercator(121.0, -40.0)
    # compute what band 5 would give (mirror the _yr call directly)
    ce = baidu._LL2MC[np.array([5])]
    x_exp, y_exp = baidu._yr(np.array([121.0]), np.array([-40.0]), ce)
    assert float(x_neg[0]) == float(x_exp[0])
    assert float(y_neg[0]) == float(y_exp[0])


def test_band_selection_northern():
    # lat ≥ 75 is unreachable (clamped to 74 first), so band 0's
    # coefficients are dead code in practice — matching the reference.
    for lat, want_band in [(76.0, 1), (74.0, 1), (61.0, 1), (59.0, 2),
                           (44.0, 3), (29.0, 4), (14.0, 5), (0.0, 5)]:
        lat_c = min(lat, 74.0)
        band = 5
        for i in range(len(baidu._LLBAND) - 1, -1, -1):
            if lat_c >= baidu._LLBAND[i]:
                band = i
        assert band == want_band, lat


def test_bmap_mocator_reference_example():
    """map.go:263 comment example → LINESTRING via MercatorToBd09 with
    Go %g formatting; pinned end-to-end (Shanghai-region output)."""
    from xutil_spark.kernels.baidu import bmap_mocator

    moc = ("4|13534914.0122,3645387.5227;13535422.4951,3645834.93158|"
           "1-13534914.0122,3645542.22157,13534919.2537,3645555.85957,"
           "13535111.9804,3645672.21552,13535163.1497,3645713.32995;")
    got = bmap_mocator(moc)
    assert got == (
        "LINESTRING (121.58487832255089 31.27047536226687,"
        "121.58492540723418 31.270580596842727,"
        "121.5866566817995 31.2714784266792,"
        "121.58711633844082 31.27179567321359)"
    )


def test_bmap_mocator_edge_cases():
    from xutil_spark.kernels.baidu import bmap_mocator

    assert bmap_mocator("") == ""
    assert bmap_mocator("3|a|b") == ""        # non-type-4
    assert bmap_mocator("4|bbox") == ""       # too few sections
    assert bmap_mocator("4|b|2-1,2;") == ""   # no kind-1 segment
    # LAST kind-1 segment wins (reference loop semantics)
    two = bmap_mocator("4|b|1-13534914.0122,3645542.22157;1-13535111.9804,3645672.21552;")
    assert two == "LINESTRING (121.5866566817995 31.2714784266792)"
