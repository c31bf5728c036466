"""Tile / cell-id kernel tests (gis.go:262-283 semantics + packing)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xutil_spark.kernels import tiles

SH_LON, SH_LAT = 121.5012091398, 31.2355502882


def test_wgs2tile_golden():
    # pinned from the line-for-line transcription of gis.go:262-267
    assert tiles.wgs2tile(SH_LON, SH_LAT, 15) == (27443, 13388)
    x, y = tiles.wgs2tile(0.0, 0.0, 1)
    # floor semantics put the equator/prime-meridian point in the SE tile
    assert (int(x), int(y)) == (1, 1)


def test_tile2wgs_returns_lat_lng_order():
    """gis.go:269-275 returns (lat, lng) — quirk preserved."""
    lat, lng = tiles.tile2wgs(27443, 13388, 15)
    assert 31.0 < float(lat) < 31.5
    assert 121.0 < float(lng) < 122.0


def test_tile_image_golden():
    # gis.go:277-283: pixel = remainder of tile coordinate at z+log2(deg)
    x, y, px, py = tiles.tile_image(SH_LON, SH_LAT, 15, 256)
    assert (int(x), int(y)) == (27443, 13388)
    assert 0 <= int(px) < 256 and 0 <= int(py) < 256
    assert (int(px), int(py)) == (79, 148)


def test_cell_pack_roundtrip():
    c = tiles.cell_encode(SH_LON, SH_LAT, 15)
    x, y, z = tiles.cell_decode(c)
    assert (int(x), int(y), int(z)) == (27443, 13388, 15)
    assert int(tiles.cell_zoom(c)) == 15


def test_cell_parent_is_bit_arithmetic():
    c = tiles.cell_encode(SH_LON, SH_LAT, 15)
    p = tiles.cell_parent(c, 10)
    x, y, z = tiles.cell_decode(p)
    assert (int(x), int(y), int(z)) == (27443 >> 5, 13388 >> 5, 10)
    # parent cell must equal direct encode at the coarser zoom
    assert int(p) == int(tiles.cell_encode(SH_LON, SH_LAT, 10))


def test_cell_neighbors_ring1():
    c = tiles.cell_encode(SH_LON, SH_LAT, 15)
    n = tiles.cell_neighbors(c, ring=1)
    assert n.shape == (1, 9)
    assert int(c) in set(int(v) for v in n[0])
    xs = sorted(set(int(tiles.cell_decode(v)[0]) for v in n[0]))
    assert xs == [27442, 27443, 27444]


def test_cell_neighbors_wraps_x_clamps_y():
    # tile (0, 0) at z=3: x wraps to 7, y clamps at 0
    c = tiles.cell_pack(0, 0, 3)
    n = tiles.cell_neighbors(c, ring=1)[0]
    decoded = {(int(tiles.cell_decode(v)[0]), int(tiles.cell_decode(v)[1])) for v in n}
    assert (7, 0) in decoded  # x wrapped
    assert all(y >= 0 for _, y in decoded)  # y clamped


@settings(max_examples=200, deadline=None)
@given(
    lng=st.floats(min_value=-179.9, max_value=179.9),
    lat=st.floats(min_value=-84.0, max_value=84.0),
    z=st.integers(min_value=1, max_value=20),
)
def test_tile_roundtrip_property(lng, lat, z):
    """Tile2Wgs(Wgs2Tile(p)) is the tile's NW corner; re-encoding the
    center of the tile must land in the same tile."""
    x, y = tiles.wgs2tile(lng, lat, z)
    n = 2 ** z
    assert 0 <= int(x) < n
    lat_nw, lng_nw = tiles.tile2wgs(int(x), int(y), z)
    lat_se, lng_se = tiles.tile2wgs(int(x) + 1, int(y) + 1, z)
    cx, cy = (float(lng_nw) + float(lng_se)) / 2, (float(lat_nw) + float(lat_se)) / 2
    x2, y2 = tiles.wgs2tile(cx, cy, z)
    assert (int(x2), int(y2)) == (int(x), int(y))


@settings(max_examples=200, deadline=None)
@given(
    lng=st.floats(min_value=-179.9, max_value=179.9),
    lat=st.floats(min_value=-84.0, max_value=84.0),
    z=st.integers(min_value=1, max_value=20),
)
def test_point_is_inside_its_cell_bounds(lng, lat, z):
    c = tiles.cell_encode(lng, lat, z)
    w, s, e, n = tiles.cell_bounds(c)
    # epsilon on both sides: lng within one ulp of a tile edge may round
    # into the neighbor during encode (float artifact, not a logic bug)
    assert float(w) - 1e-9 <= lng < float(e) + 1e-9
    assert float(s) - 1e-9 <= lat <= float(n) + 1e-9
