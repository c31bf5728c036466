"""S2 cell encoding: numpy-vs-scalar parity, id-layout invariants, and
the Spark operator path (UDF encode + JVM bit-mask parent/token)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from xutil_spark.kernels.s2 import (
    cell_id_np, cell_id_py, cell_level_np, cell_parent_np, token_np, token_py,
)


def _grid(n=60):
    rng = np.random.default_rng(20260817)
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-89.99, 89.99, n)
    # include face centers, edges, poles, antimeridian
    lon = np.concatenate([lon, [0.0, 90.0, 180.0, -180.0, -90.0, 0.0, 45.0]])
    lat = np.concatenate([lat, [0.0, 0.0, 0.0, 0.0, 0.0, 90.0, -45.0]])
    return lon, lat


def test_np_matches_scalar_all_levels():
    lon, lat = _grid()
    for level in (0, 1, 6, 12, 16, 29, 30):
        got = cell_id_np(lon, lat, level)
        want = np.array([cell_id_py(float(o), float(a), level)
                         for o, a in zip(lon, lat)], dtype=np.int64)
        np.testing.assert_array_equal(got, want, err_msg=f"level {level}")


def test_id_layout_invariants():
    lon, lat = _grid(500)
    leaf = cell_id_np(lon, lat)
    u = leaf.view(np.uint64)
    # trailing bit set on every leaf; level decodes as 30
    assert (u & np.uint64(1)).all()
    assert (cell_level_np(leaf) == 30).all()
    # face bits in 0..5
    faces = (u >> np.uint64(61)).astype(int)
    assert faces.min() >= 0 and faces.max() <= 5
    assert len(set(faces)) == 6  # global sample touches every face
    # parent prefix property: parent at L shares the id above its lsb
    for level in (4, 10, 20):
        par = cell_parent_np(leaf, level).view(np.uint64)
        lsb = np.uint64(1 << (2 * (30 - level)))
        assert ((par & (lsb - np.uint64(1))) == 0).all()
        assert (par & lsb).astype(bool).all()
        assert (cell_level_np(par.view(np.int64)) == level).all()
        # re-encoding directly at the coarse level gives the same id
        np.testing.assert_array_equal(
            par.view(np.int64), cell_id_np(lon, lat, level))


def test_known_anchors():
    # face-center level-0 ids: the 6 cube faces in canonical order
    anchors = [(0.0, 0.0, 0), (90.0, 0.0, 1), (0.0, 90.0, 2)]
    for lon, lat, face in anchors:
        cid = cell_id_py(lon, lat, 0) & ((1 << 64) - 1)
        assert cid == ((2 * face + 1) << 60), (lon, lat, face, hex(cid))
    # antipodal faces
    assert (cell_id_py(-180.0, 0.0, 0) & ((1 << 64) - 1)) == ((2 * 3 + 1) << 60)
    assert (cell_id_py(0.0, -90.0, 0) & ((1 << 64) - 1)) == ((2 * 5 + 1) << 60)


def test_hilbert_locality():
    """Adjacent points along a parallel map to nearby Hilbert positions
    within a face much more often than random — the property that makes
    the id a good range-partition key."""
    lon = np.linspace(10.0, 11.0, 200)
    lat = np.full(200, 30.0)
    ids = cell_id_np(lon, lat, 16).view(np.uint64).astype(np.float64)
    jumps = np.abs(np.diff(ids))
    # consecutive 500 m steps stay within a tiny fraction of the face range
    assert np.median(jumps) < 2.0 ** 40


def test_token_roundtrip():
    lon, lat = _grid(50)
    for level in (12, 30):
        ids = cell_id_np(lon, lat, level)
        toks = token_np(ids)
        assert all(token_py(int(c)) == t for c, t in zip(ids, toks))
        assert all(1 <= len(t) <= 16 for t in toks)


def test_spark_operator_and_parent_mask(spark):
    from xutil_spark.operators.s2cells import cell_encode_s2, s2_parent, s2_token

    lon, lat = _grid(300)
    pdf = pd.DataFrame({"pid": range(len(lon)), "lon": lon, "lat": lat})
    df = cell_encode_s2(spark.createDataFrame(pdf), level=30, out_col="leaf")
    out = (
        df.select(
            "pid", "leaf",
            s2_parent("leaf", 12).alias("p12"),
            s2_token(s2_parent("leaf", 12)).alias("tok"),
        )
        .toPandas()
        .sort_values("pid")
    )
    want_leaf = cell_id_np(lon, lat, 30)
    np.testing.assert_array_equal(out["leaf"].to_numpy(), want_leaf)
    np.testing.assert_array_equal(
        out["p12"].to_numpy(), cell_parent_np(want_leaf, 12))
    assert all(token_py(int(c)) == t for c, t in zip(out["p12"], out["tok"]))


def test_repartition_by_s2_splits_hot_cells(spark):
    """A dense cluster (urban-skew stand-in) must spread across
    2**salt_bits shuffle keys while staying on one coarse prefix, and
    the salted layout must cut the max-partition share vs unsalted."""
    from xutil_spark.operators.s2cells import cell_encode_s2, repartition_by_s2

    rng = np.random.default_rng(3)
    # 90% of points inside one ~1 km blob, 10% spread over a continent
    hot = rng.normal([116.40, 39.90], 0.005, (9000, 2))
    cold = rng.uniform([75.0, 20.0], [130.0, 50.0], (1000, 2))
    pts = np.vstack([hot, cold])
    pdf = pd.DataFrame({"pid": range(len(pts)),
                        "lon": pts[:, 0], "lat": pts[:, 1]})
    df = cell_encode_s2(spark.createDataFrame(pdf))

    def max_share(frame):
        counts = (frame.groupBy(F.spark_partition_id().alias("p"))
                  .count().toPandas()["count"])
        return counts.max() / counts.sum()

    unsalted = max_share(repartition_by_s2(df, level=8, num_partitions=16))
    salted = max_share(
        repartition_by_s2(df, level=8, salt_bits=4, num_partitions=16))
    assert unsalted > 0.85            # the blob lands on one coarse key
    assert salted < unsalted * 0.5    # salting genuinely splits it
