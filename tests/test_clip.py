"""Sutherland-Hodgman bbox clipping + the clipped PiP join."""

import numpy as np
import pandas as pd

from xutil_spark.kernels.geometry import (
    clip_geo_bbox, clip_ring_bbox, covering_cells, from_wkt, point_in_geo,
    ray_cast,
)


def _rand_poly(rng, n_min=3, n_max=12):
    """Random simple-ish star polygon around a random center."""
    n = rng.randint(n_min, n_max + 1)
    cx, cy = rng.uniform(2, 8), rng.uniform(2, 8)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.5, 4.0, n)
    return [(cx + r * np.cos(a), cy + r * np.sin(a)) for a, r in zip(ang, rad)]


def test_clip_identity_and_outside():
    sq = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]
    inside = clip_ring_bbox(sq, 0, 0, 10, 10)  # box contains polygon
    assert [tuple(p) for p in inside] == sq
    assert clip_ring_bbox(sq, 5, 5, 9, 9).shape == (0, 2)  # disjoint


def test_clip_membership_property():
    """For points strictly inside the clip box, even-odd membership in
    the clipped rings equals membership in the original polygon — the
    invariant the clipped PiP join rests on.  500 random star polygons
    (convex and concave) x 64 probe points each."""
    rng = np.random.RandomState(4)
    for _ in range(500):
        ring = _rand_poly(rng)
        w, s = rng.uniform(0, 6, 2)
        e, n = w + rng.uniform(0.5, 5), s + rng.uniform(0.5, 5)
        clipped = clip_ring_bbox(ring, w, s, e, n)
        px = rng.uniform(w + 1e-9, e - 1e-9, 64)
        py = rng.uniform(s + 1e-9, n - 1e-9, 64)
        want = ray_cast(px, py, [np.asarray(ring)])
        got = (ray_cast(px, py, [clipped]) if clipped.shape[0] >= 3
               else np.zeros(64, dtype=bool))
        assert (got == want).all()


def test_clip_holes_parity():
    g = from_wkt(
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0),"
        "(2 2, 6 2, 6 6, 2 6, 2 2))"
    )
    rings = clip_geo_bbox(g, 1, 1, 7, 7)  # box straddles the hole
    rng = np.random.RandomState(9)
    px = rng.uniform(1 + 1e-9, 7 - 1e-9, 400)
    py = rng.uniform(1 + 1e-9, 7 - 1e-9, 400)
    want = point_in_geo(px, py, g)
    got = ray_cast(px, py, rings)
    assert (got == want).all()
    assert not got[(px > 2.1) & (px < 5.9) & (py > 2.1) & (py < 5.9)].any()


def test_thin_diagonal_prunes_empty_cells():
    """A thin diagonal polygon bbox-covers a full square of cells but
    intersects only the diagonal band — the clip must drop the rest."""
    from xutil_spark.kernels.tiles import cell_bounds

    wkt = "POLYGON((80 20, 80.5 20, 120 50, 119.5 50, 80 20))"
    g = from_wkt(wkt)
    cover = covering_cells(g, 6)
    kept = []
    for c in cover:
        w, s, e, n = (float(v) for v in cell_bounds(c))
        if clip_geo_bbox(g, w, s, e, n):
            kept.append(c)
    assert len(kept) < len(cover) / 2


def test_clipped_pip_join_matches_plain(spark):
    from xutil_spark.operators.spatial_join import (
        clip_polygons_to_cells, clipped_pip_join, point_in_polygon_join,
    )

    polys = spark.createDataFrame(pd.DataFrame({
        "poly_id": ["tri", "chevron", "holey"],
        "wkt": [
            "POLYGON((100.0137 25.0721, 130.7213 33.4177, 107.3391 44.9143,"
            " 100.0137 25.0721))",
            "POLYGON((80.1371 20.2177, 98.9433 20.2177, 98.9433 33.8891,"
            " 89.5402 27.4133, 80.1371 33.8891, 80.1371 20.2177))",
            "POLYGON((90 35, 125 35, 125 52, 90 52, 90 35),"
            "(100 40, 115 40, 115 48, 100 48, 100 40))",
        ],
    }))
    rng = np.random.RandomState(11)
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(4000),
        "lon": rng.uniform(73.5, 134.5, 4000),
        "lat": rng.uniform(18.2, 53.5, 4000),
    }))
    for zoom in (4, 6):
        plain = {(r["pid"], r["poly_id"]) for r in
                 point_in_polygon_join(pts, polys, zoom=zoom).collect()}
        clipped = {(r["pid"], r["poly_id"]) for r in
                   clipped_pip_join(pts, polys, zoom=zoom).collect()}
        assert clipped == plain and len(plain) > 500
    # the fragment dim prunes: holey's hole-interior cells drop entirely
    frags = clip_polygons_to_cells(polys, 6).toPandas()
    assert set(frags["poly_id"]) == {"tri", "chevron", "holey"}
    g = from_wkt(polys.toPandas().set_index("poly_id")["wkt"]["tri"])
    assert (frags["poly_id"] == "tri").sum() < len(covering_cells(g, 6))
