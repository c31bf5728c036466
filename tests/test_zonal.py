"""Raster↔vector zonal statistics (raster/zonal.py)."""

import numpy as np
import pandas as pd
import pytest

from xutil_spark.data.synth import images_table, pixels_for, with_location
from xutil_spark.kernels.geometry import from_wkt, point_in_geo
from xutil_spark.raster.zonal import pixel_sums, zonal_pixel_stats

# two OVERLAPPING zones + one far-away zone nothing falls into
_ZONES = pd.DataFrame({
    "zone_id": ["big_tri", "mid_diamond", "nowhere"],
    "wkt": [
        "POLYGON((74.1 19.1, 133.9 19.1, 104.0 52.9, 74.1 19.1))",
        "POLYGON((104.0 22.0, 120.0 35.0, 104.0 48.0, 88.0 35.0, 104.0 22.0))",
        "POLYGON((0.1 0.1, 1.1 0.1, 0.6 1.1, 0.1 0.1))",
    ],
})


def test_pixel_sums_exact(spark):
    got = pixel_sums(images_table(spark, 30)).toPandas()
    assert len(got) == 30
    for r in got.itertuples(index=False):
        i = int(r.image_id[3:])
        px = pixels_for(i).astype(np.int64)
        s = px.reshape(-1, 3).sum(axis=0)
        assert (r.sum_r, r.sum_g, r.sum_b) == (s[0], s[1], s[2])
        assert r.n_px == px.shape[0] * px.shape[1]
        assert r.caption.startswith(f"caption {i} ")  # passthrough


def test_zonal_matches_brute_and_counts_overlaps(spark):
    img = with_location(images_table(spark, 400))
    zones = spark.createDataFrame(_ZONES)
    got = {r["zone_id"]: r for r in
           zonal_pixel_stats(img, zones, zoom=4).collect()}

    # brute force: decode + scalar PiP per (image, zone)
    pts = img.select("image_id", "lon", "lat").toPandas()
    geos = {z.zone_id: from_wkt(z.wkt) for z in _ZONES.itertuples(index=False)}
    exp: dict = {}
    for r in pts.itertuples(index=False):
        i = int(r.image_id[3:])
        px = pixels_for(i).astype(np.int64)
        s = px.reshape(-1, 3).sum(axis=0)
        for zid, g in geos.items():
            if point_in_geo(r.lon, r.lat, g)[0]:
                e = exp.setdefault(zid, [0, 0, 0, 0, 0])
                e[0] += 1
                e[1] += px.shape[0] * px.shape[1]
                e[2] += int(s[0])
                e[3] += int(s[1])
                e[4] += int(s[2])

    assert set(got) == set(exp) and "nowhere" not in got
    for zid, (n, npx, sr, sg, sb) in exp.items():
        r = got[zid]
        assert (r["n_images"], r["total_px"]) == (n, npx)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (sr, sg, sb)
        assert r["mean_r"] == round(sr / npx, 6)
    # the zones overlap: summed per-zone counts exceed distinct matches
    assert exp["big_tri"][0] > 0 and exp["mid_diamond"][0] > 0
    total = sum(e[0] for e in exp.values())
    assert total > max(e[0] for e in exp.values())


def test_zonal_requires_location_columns(spark):
    zones = spark.createDataFrame(_ZONES)
    img = images_table(spark, 5)  # no lon/lat attached
    with pytest.raises(Exception):
        zonal_pixel_stats(img, zones).collect()
