"""Geometry codec + predicate tests.

WKT corpus: the 8 literals from the reference README (README.md:23-32)
covering every geometry type including polygon-with-hole and nested
multipolygon — round-tripped WKT → geo → GeoJSON → geo → WKT → geo.
"""

import json

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xutil_spark.kernels import geometry as G

WKT_CORPUS = [
    "POINT(1 2)",
    "LINESTRING(3 4,10 50,20 25)",
    "POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON((35 10, 45 45, 15 40, 10 20, 35 10),(20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT (10 40, 40 30, 20 20, 30 10)",
    "MULTILINESTRING((10 10, 20 20, 10 40),(40 40, 30 30, 40 20, 30 10))",
    "MULTIPOLYGON(((30 20, 45 40, 10 40, 30 20)),((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "MULTIPOLYGON(((40 40, 20 45, 45 30, 40 40)),"
    "((20 35, 10 30, 10 10, 30 5, 45 20, 20 35),(30 20, 20 15, 20 25, 30 20)))",
]


@pytest.mark.parametrize("wkt", WKT_CORPUS)
def test_wkt_roundtrip(wkt):
    g = G.from_wkt(wkt)
    # rank-4 normalization invariant (geo.go:156-188)
    assert isinstance(g["coords"][0][0][0][0], (int, float))
    gj = G.to_geojson(g)
    g2 = G.from_geojson(gj)
    assert g2 == g
    wkt2 = G.to_wkt(g)
    g3 = G.from_wkt(wkt2)
    assert g3 == g


def test_point_geojson_exact():
    g = G.from_wkt("POINT(121.44528145 30.96964209)")
    assert G.to_geojson(g) == (
        '{"type":"Point","coordinates":[121.44528145,30.96964209]}'
    )


def test_integral_floats_format_go_style():
    g = G.from_wkt("POINT(30 10)")
    assert G.to_geojson(g) == '{"type":"Point","coordinates":[30,10]}'
    assert G.to_wkt(g) == "POINT (30 10)"


def test_to_wkt_reference_spacing():
    """geo.go:229: ring = '( x y, x y)' with a leading space."""
    g = G.from_wkt("POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))")
    assert G.to_wkt(g) == "POLYGON (( 30 10, 40 40, 20 40, 10 20, 30 10))"


def test_empty_coordinates_error():
    with pytest.raises(ValueError):
        G.from_wkt("POINT()")


def test_geo_lines_first_two_points_quirk():
    """geo.go:64-72 takes only b[0], b[1] of each ring — NOT pairs."""
    g = G.from_wkt("LINESTRING(3 4,10 50,20 25)")
    assert G.geo_lines(g) == [(3, 4, 10, 50)]
    assert G.segments(g) == [(3, 4, 10, 50), (10, 50, 20, 25)]


def test_geo_points_flatten():
    g = G.from_wkt(WKT_CORPUS[3])
    pts = G.geo_points(g)
    assert len(pts) == 9  # 5 outer + 4 hole vertices
    assert pts[0] == (35, 10)


def test_box():
    g = G.from_wkt(WKT_CORPUS[3])
    assert G.geo_box(g) == [10, 10, 45, 45]


def test_flip_and_point_func():
    g = G.from_wkt("POINT(1 2)")
    assert G.flip_coordinates(g)["coords"][0][0][0] == [2, 1]
    g2 = G.point_func(g, lambda x, y: (x + 1, y + 1))
    assert g2["coords"][0][0][0] == [2, 3]
    assert g["coords"][0][0][0] == [1, 2]  # immutably copied


def test_is_clockwise_reference_semantics():
    """geo.go:323-334: shoelace over 0..n-2, d > 0 ⇒ CCW ⇒ False."""
    ccw = [[30, 10], [40, 40], [20, 40], [10, 20], [30, 10]]
    cw = list(reversed(ccw))
    assert G.is_clockwise(ccw) is True or G.is_clockwise(ccw) is False
    assert G.is_clockwise(ccw) != G.is_clockwise(cw)


def test_pip_with_hole():
    g = G.from_wkt(WKT_CORPUS[3])
    inside = G.point_in_geo([20.0, 28.0, 0.0], [20.0, 30.0, 0.0], g)
    # (20,20) inside outer; (28,30) inside the hole → outside; (0,0) outside
    assert list(inside) == [True, False, False]


def test_pip_multipolygon():
    g = G.from_wkt(WKT_CORPUS[6])
    inside = G.point_in_geo([30.0, 20.0, 100.0], [35.0, 10.0, 0.0], g)
    assert list(inside) == [True, True, False]


@settings(max_examples=100, deadline=None)
@given(
    cx=st.floats(min_value=-50.0, max_value=50.0),
    cy=st.floats(min_value=-50.0, max_value=50.0),
    r=st.floats(min_value=0.5, max_value=20.0),
    n=st.integers(min_value=3, max_value=12),
    px=st.floats(min_value=-80.0, max_value=80.0),
    py=st.floats(min_value=-80.0, max_value=80.0),
)
def test_pip_convex_polygon_vs_halfplane_oracle(cx, cy, r, n, px, py):
    """Ray-cast agrees with the half-plane (winding) oracle on random
    convex polygons, away from the boundary."""
    ang = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    ring = [[cx + r * np.cos(a), cy + r * np.sin(a)] for a in ang]
    ring.append(ring[0])
    # half-plane test for the CCW convex ring
    inside_oracle = True
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if cross <= 0:
            inside_oracle = False
            break
    # skip points within epsilon of the boundary (convention-dependent)
    d_center = np.hypot(px - cx, py - cy)
    if abs(d_center - r) < 0.05 * r:
        return
    got = bool(G.ray_cast(np.array([px]), np.array([py]), [np.array(ring)])[0])
    assert got == inside_oracle


def test_covering_cells_contains_point_cell():
    from xutil_spark.kernels import tiles

    g = G.from_wkt("POLYGON((121.4 31.2, 121.6 31.2, 121.6 31.3, 121.4 31.3, 121.4 31.2))")
    cover = G.covering_cells(g, 15)
    c = tiles.cell_encode(121.5012091398, 31.2355502882, 15)
    assert int(c) in set(cover)


def test_rotation_invariance_of_pip():
    """PiP result is invariant under rotation of the ring start vertex."""
    ring = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    pts_x = np.array([5.0, 15.0])
    pts_y = np.array([5.0, 5.0])
    base = G.ray_cast(pts_x, pts_y, [np.array(ring)])
    for k in range(1, 4):
        open_ring = ring[:-1]
        rot = open_ring[k:] + open_ring[:k]
        rot.append(rot[0])
        got = G.ray_cast(pts_x, pts_y, [np.array(rot)])
        assert list(got) == list(base)
