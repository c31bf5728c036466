"""Spark-surface tests: native expressions ≡ numpy kernels ≡ pandas UDFs,
and the synthetic tables' determinism."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xutil_spark.data import synth
from xutil_spark.functions import native, register_all
from xutil_spark.kernels import coords as K_coords
from xutil_spark.kernels import distance as K_dist
from xutil_spark.kernels import tiles as K_tiles


@pytest.fixture(scope="module")
def points(spark):
    img = synth.with_location(synth.images_table(spark, 500, with_bytes=False))
    return img.select("image_id", "phash", "lon", "lat").toPandas()


def test_location_derivation_matches_numpy(points):
    ph = points["phash"].to_numpy(np.int64)
    lon = 73.5 + (ph & 0xFFFFF) / 1048576.0 * 61.0
    lat = 18.2 + ((ph >> 20) & 0xFFFFF) / 1048576.0 * 35.3
    np.testing.assert_allclose(points["lon"], lon, rtol=0, atol=0)
    np.testing.assert_allclose(points["lat"], lat, rtol=0, atol=0)
    assert points["lon"].between(73.5, 134.5).all()
    assert points["lat"].between(18.2, 53.5).all()


def test_native_cell_matches_kernel(spark, points):
    df = spark.createDataFrame(points[["image_id", "lon", "lat"]])
    got = (
        df.withColumn("cell", native.cell("lon", "lat", 15))
        .orderBy("image_id")
        .toPandas()
    )
    exp = K_tiles.cell_encode(
        points.sort_values("image_id")["lon"].to_numpy(),
        points.sort_values("image_id")["lat"].to_numpy(),
        15,
    )
    np.testing.assert_array_equal(got["cell"].to_numpy(np.int64), exp)


def test_native_cell_parent_matches(spark, points):
    df = spark.createDataFrame(points[["lon", "lat"]])
    got = df.select(
        native.cell("lon", "lat", 15).alias("c15"),
        native.cell_parent(native.cell("lon", "lat", 15), 15, 10).alias("p10"),
        native.cell("lon", "lat", 10).alias("c10"),
    ).toPandas()
    np.testing.assert_array_equal(got["p10"], got["c10"])


def test_native_haversine_matches_kernel(spark, points):
    pdf = points.head(100).copy()
    pdf["lon2"] = pdf["lon"].to_numpy()[::-1]
    pdf["lat2"] = pdf["lat"].to_numpy()[::-1]
    df = spark.createDataFrame(pdf[["lon", "lat", "lon2", "lat2"]])
    got = df.select(
        native.haversine_m("lon", "lat", "lon2", "lat2").alias("d")
    ).toPandas()["d"].to_numpy()
    exp = K_dist.point_dist_haversine(
        pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
        pdf["lon2"].to_numpy(), pdf["lat2"].to_numpy(),
    )
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_udf_transforms_match_kernel(spark, points):
    register_all(spark)
    df = spark.createDataFrame(points[["image_id", "lon", "lat"]])
    df.createOrReplaceTempView("pts")
    got = spark.sql(
        "SELECT image_id, wgs2gcj(lon, lat) AS g, wgs2bd(lon, lat) AS b,"
        " dist_hav_m(lon, lat, 121.5, 31.2) AS d FROM pts ORDER BY image_id"
    ).toPandas()
    srt = points.sort_values("image_id")
    glon, glat = K_coords.wgs2gcj(srt["lon"].to_numpy(), srt["lat"].to_numpy())
    np.testing.assert_array_equal([g["lon"] for g in got["g"]], glon)
    np.testing.assert_array_equal([g["lat"] for g in got["g"]], glat)
    blon, blat = K_coords.wgs2bd(srt["lon"].to_numpy(), srt["lat"].to_numpy())
    np.testing.assert_array_equal([b["lon"] for b in got["b"]], blon)
    np.testing.assert_array_equal([b["lat"] for b in got["b"]], blat)
    exp_d = K_dist.point_dist_haversine(
        srt["lon"].to_numpy(), srt["lat"].to_numpy(), 121.5, 31.2
    )
    np.testing.assert_allclose(got["d"].to_numpy(), exp_d, rtol=1e-12)


def test_udf_cells_and_wkt(spark):
    register_all(spark)
    got = spark.sql(
        "SELECT cell_encode(121.5012091398, 31.2355502882, 15) AS c,"
        " cell_parent(cell_encode(121.5012091398, 31.2355502882, 15), 10) AS p,"
        " tile_pixel(121.5012091398, 31.2355502882, 15, 256) AS tp,"
        " wkt_to_geojson('POINT(1 2)') AS gj,"
        " wkt_transform('POINT(121.5012091398 31.2355502882)', 'wgs2bd') AS wt,"
        " size(cell_neighbors(cell_encode(121.5, 31.2, 15), 1)) AS nn"
    ).collect()[0]
    assert got["c"] == int(K_tiles.cell_encode(121.5012091398, 31.2355502882, 15))
    assert got["p"] == int(K_tiles.cell_encode(121.5012091398, 31.2355502882, 10))
    assert (got["tp"]["tx"], got["tp"]["ty"], got["tp"]["px"], got["tp"]["py"]) == (
        27443, 13388, 79, 148)
    assert got["gj"] == '{"type":"Point","coordinates":[1,2]}'
    assert got["wt"] == "POINT (121.51224514 31.2391863)"
    assert got["nn"] == 9


def test_images_table_deterministic(spark):
    a = synth.images_table(spark, 50).orderBy("image_id").toPandas()
    b = synth.images_table(spark, 50).orderBy("image_id").toPandas()
    assert (a["phash"] == b["phash"]).all()
    assert (a["caption"] == b["caption"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))
    assert list(a.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def test_images_bytes_decode_roundtrip(spark):
    from xutil_spark.kernels import codec

    rows = synth.images_table(spark, 10).collect()
    for r in rows:
        i = int(r["image_id"][3:])
        px = codec.decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        np.testing.assert_array_equal(px, synth.pixels_for(i))
        assert r["caption"] == synth.caption_for(i)


def test_skew_mode_concentrates_points(spark):
    img = synth.with_location(synth.images_table(spark, 2000, skew=True, with_bytes=False))
    counts = (
        img.groupBy(native.cell("lon", "lat", 15).alias("cell"))
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
        .toPandas()
    )
    assert counts["count"].sum() >= 0.28 * 2000


def test_tiles_table_cells_match_point_encoding(spark):
    tiles_df = synth.tiles_table(spark, zoom=15, bbox=(121.0, 31.0, 122.0, 31.5))
    n = tiles_df.count()
    assert n > 100
    row = tiles_df.filter(F.col("tile_id") == "z15x27443y13388").collect()
    assert len(row) == 1
    assert row[0]["cell"] == int(K_tiles.cell_encode(121.5012091398, 31.2355502882, 15))


def test_ip_long_roundtrip(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ip": ["1.2.3.4", "255.255.255.255", "10.0.0.1"]})
    )
    got = df.select(
        native.long2ip(native.ip2long("ip")).alias("rt"),
        native.ip2long("ip").alias("v"),
    ).toPandas()
    assert list(got["rt"]) == ["1.2.3.4", "255.255.255.255", "10.0.0.1"]
    assert list(got["v"]) == [16909060, 4294967295, 167772161]
