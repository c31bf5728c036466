"""Spherical-excess polygon area (kernels/geometry.py engine addition)."""

import numpy as np
import pandas as pd

from xutil_spark.kernels.distance import R_EARTH
from xutil_spark.kernels.geometry import (
    from_wkt, geo_area_m2, spherical_ring_area_m2,
)


def test_small_square_matches_local_planar():
    """A 0.01 deg square at 39N: spherical area == cos-scaled planar
    area to <1e-8 relative (the small-edge regime the kernel serves)."""
    sq = [(116.0, 39.0), (116.01, 39.0), (116.01, 39.01), (116.0, 39.01)]
    a = spherical_ring_area_m2(sq)
    step = 0.01 * np.pi / 180.0 * R_EARTH
    approx = step * np.cos(np.radians(39.005)) * step
    assert a > 0  # CCW positive
    assert abs(a - approx) / approx < 1e-6
    assert spherical_ring_area_m2(list(reversed(sq))) < 0  # CW negative


def test_latitude_dependence():
    """Same lon/lat-degree square shrinks by ~cos(lat) toward the pole
    — the deg² shoelace (geo.go:324-334) cannot see this."""
    def sq(lat):
        return [(10.0, lat), (11.0, lat), (11.0, lat + 1), (10.0, lat + 1)]
    a0 = abs(spherical_ring_area_m2(sq(0.0)))
    a60 = abs(spherical_ring_area_m2(sq(60.0)))
    assert 0.45 < a60 / a0 < 0.55  # ~cos(60.5) = 0.49


def test_antimeridian_wrap():
    am = [(179.5, -0.5), (-179.5, -0.5), (-179.5, 0.5), (179.5, 0.5)]
    a = abs(spherical_ring_area_m2(am))
    approx = (np.pi / 180.0 * R_EARTH) ** 2
    assert abs(a - approx) / approx < 1e-4


def test_holes_subtract():
    g = from_wkt(
        "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0),"
        "(0.2 0.2, 0.4 0.2, 0.4 0.4, 0.2 0.4, 0.2 0.2))"
    )
    outer = abs(spherical_ring_area_m2([(0, 0), (1, 0), (1, 1), (0, 1)]))
    frac = geo_area_m2(g) / outer
    assert 0.955 < frac < 0.965  # 1 - 0.04, spherical wobble


def test_clip_fragments_tile_area_additive():
    """Clipping a polygon to cells partitions its area: fragment areas
    sum back to the original (the raster-vector bookkeeping invariant)."""
    from xutil_spark.kernels.geometry import clip_geo_bbox, covering_cells
    from xutil_spark.kernels.tiles import cell_bounds

    g = from_wkt(
        "POLYGON((100.0137 25.0721, 130.7213 33.4177, 107.3391 44.9143,"
        " 100.0137 25.0721))"
    )
    total = geo_area_m2(g)
    parts = 0.0
    for c in covering_cells(g, 6):
        w, s, e, n = (float(v) for v in cell_bounds(c))
        for ring in clip_geo_bbox(g, w, s, e, n):
            parts += abs(spherical_ring_area_m2(ring))
    assert abs(parts - total) / total < 1e-6


def test_wkt_area_udf(spark):
    from xutil_spark.functions import geo_udfs
    import pyspark.sql.functions as F

    df = spark.createDataFrame(pd.DataFrame({
        "wkt": ["POLYGON((116.0 39.0, 116.01 39.0, 116.01 39.01,"
                " 116.0 39.01, 116.0 39.0))"],
    }))
    got = df.select(geo_udfs.wkt_area_m2(F.col("wkt")).alias("a")).first()["a"]
    assert abs(got - spherical_ring_area_m2(
        [(116.0, 39.0), (116.01, 39.0), (116.01, 39.01), (116.0, 39.01)]
    )) < 1e-9
