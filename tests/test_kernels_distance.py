"""Distance / bearing / midpoint / destination kernel tests
(gis.go:156-249 semantics, values pinned from the transcription)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xutil_spark.kernels import distance

P1 = (121.5012091398, 31.2355502882)  # Shanghai Tower (gis.go:360)
P2 = (121.47521, 31.37982)            # People's Square area


def test_distance_goldens():
    assert float(distance.point_distance(*P1, *P2)) == pytest.approx(
        16231.101602498524, rel=1e-12
    )
    assert float(distance.point_dist_haversine(*P1, *P2)) == pytest.approx(
        16231.101602430148, rel=1e-12
    )
    # law of cosines and haversine agree to sub-mm at city scale
    assert abs(
        float(distance.point_distance(*P1, *P2))
        - float(distance.point_dist_haversine(*P1, *P2))
    ) < 1e-3


def test_azimuth_quirk_branch():
    """gis.go:177-179 adds 2π only when dLon < 0."""
    a_fwd = float(distance.azimuth(*P1, *P2))  # dLon < 0 → +2π branch
    a_rev = float(distance.azimuth(*P2, *P1))  # dLon > 0 → raw atan2
    assert a_fwd == pytest.approx(351.25359072269464, rel=1e-12)
    assert a_rev == pytest.approx(171.2400806821735, rel=1e-12)


def test_midpoint_golden():
    lon, lat = distance.point_mid(*P1, *P2)
    assert float(lon) == pytest.approx(121.48821952380202, rel=1e-12)
    assert float(lat) == pytest.approx(31.30768579882381, rel=1e-12)


def test_point_at_golden_uses_gcj_radius():
    """gis.go:238 normalizes by A=6378245 (not 6371000) — quirk pinned."""
    lon, lat = distance.point_at(P1[0], P1[1], 5000.0, 45.0)
    assert float(lon) == pytest.approx(121.53836563150085, rel=1e-12)
    assert float(lat) == pytest.approx(31.26730465006748, rel=1e-12)


def test_point_at_wraps_lon_to_0_2pi():
    """gis.go:243-245: λ2 < 0 → +2π, so heading west across the
    antimeridian yields a longitude near 360-ε, not negative."""
    lon, _ = distance.point_at(-179.9, 0.0, 50000.0, 270.0)
    assert float(lon) > 179.0


def test_identical_points_zero():
    assert float(distance.point_distance(*P1, *P1)) == 0.0
    assert float(distance.point_dist_haversine(*P1, *P1)) == 0.0


@settings(max_examples=200, deadline=None)
@given(
    lon1=st.floats(min_value=-179.0, max_value=179.0),
    lat1=st.floats(min_value=-80.0, max_value=80.0),
    lon2=st.floats(min_value=-179.0, max_value=179.0),
    lat2=st.floats(min_value=-80.0, max_value=80.0),
)
def test_haversine_symmetric_nonnegative(lon1, lat1, lon2, lat2):
    d12 = float(distance.point_dist_haversine(lon1, lat1, lon2, lat2))
    d21 = float(distance.point_dist_haversine(lon2, lat2, lon1, lat1))
    assert d12 >= 0.0
    assert d12 == pytest.approx(d21, rel=1e-9, abs=1e-9)
    assert d12 <= np.pi * 6371000.0 + 1.0


@settings(max_examples=100, deadline=None)
@given(
    lon=st.floats(min_value=-170.0, max_value=170.0),
    lat=st.floats(min_value=-70.0, max_value=70.0),
    dist=st.floats(min_value=1.0, max_value=100000.0),
    az=st.floats(min_value=0.0, max_value=359.9),
)
def test_point_at_distance_consistency(lon, lat, dist, az):
    """Traveling dist then measuring with the same radius convention
    should return ~dist (scaled by 6371000/6378245 because point_at uses
    A as its radius — the reference's inconsistency, preserved)."""
    lon2, lat2 = distance.point_at(lon, lat, dist, az)
    lon2 = float(lon2)
    if lon2 > 180.0:
        lon2 -= 360.0
    measured = float(distance.point_dist_haversine(lon, lat, lon2, float(lat2)))
    expected = dist * 6371000.0 / 6378245.0
    assert measured == pytest.approx(expected, rel=1e-6, abs=0.5)
