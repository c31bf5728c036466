"""Results must be BIT-IDENTICAL at any parallelism level.

The north rule runs the same job at N and 4N executors; these tests
pin the property that makes that comparison meaningful: operator
output is invariant to input partitioning.  The hazard is real for
the partition-BATCHED Python kernels (the padded-tensor Viterbi, the
pair-batched Fréchet/DTW DPs): batch composition changes with the
partition layout, so any cross-pair leakage through padding, batch
float order, or batch-relative indexing would make a 32-way run
differ from a 1-way run.  Every float op in those kernels is pinned
elementwise-per-pair, and here we verify it end to end: each operator
runs with the SAME rows squeezed into 1 partition and scattered over
13, and the sorted outputs must agree exactly (no tolerance).
"""

import numpy as np
import pandas as pd
import pytest
from pandas.testing import assert_frame_equal
from pyspark.sql import functions as F


def _sorted_pdf(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return (pdf[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def _assert_invariant(build, spark, base_pdf):
    outs = []
    for parts in (1, 13):
        src = spark.createDataFrame(base_pdf).repartition(parts)
        outs.append(_sorted_pdf(build(src)))
    assert_frame_equal(outs[0], outs[1], check_exact=True)
    return outs[0]


@pytest.fixture(scope="module")
def tracks_pd():
    rng = np.random.RandomState(7)
    rows = []
    for trk in range(12):
        n = 5 + (trk % 4) * 3
        base_lon = 100.0 + (trk % 5) * 0.02
        base_lat = 30.0 + (trk % 3) * 0.02
        for i in range(n):
            rows.append({
                "user_id": trk, "event_id": trk * 1000 + i,
                "ts": 1_700_000_000 + trk * 50 + i * 7,
                "lon": base_lon + i * 0.001 + rng.rand() * 1e-4,
                "lat": base_lat + i * 0.0005 + rng.rand() * 1e-4,
            })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def segs(spark):
    segs_pd = pd.DataFrame({
        "seg_id": [1, 2, 3],
        "ax": [100.00, 100.05, 100.00],
        "ay": [30.01, 30.00, 30.05],
        "bx": [100.10, 100.05, 100.10],
        "by": [30.01, 30.10, 30.05],
    })
    return spark.createDataFrame(segs_pd)


def test_hmm_decode_invariant_to_partitioning(spark, tracks_pd, segs):
    from xutil_spark.operators.mapmatch import hmm_map_match

    def build(pts):
        return hmm_map_match(
            pts, segs, radius_m=50_000.0, sigma_m=5_000.0, beta_m=1_000.0,
            k=3, track="user_id", point_id="event_id", ts="ts")

    out = _assert_invariant(build, spark, tracks_pd)
    assert len(out) == len(tracks_pd)  # every point within 50 km here


def test_frechet_join_invariant_to_partitioning(spark, tracks_pd):
    from xutil_spark.operators.trajsim import frechet_join

    def build(pts):
        return frechet_join(pts, tau_m=50_000.0, track="user_id",
                            ts="ts", tiebreak="event_id")

    out = _assert_invariant(build, spark, tracks_pd)
    assert len(out) > 0


def test_dtw_join_invariant_to_partitioning(spark, tracks_pd):
    from xutil_spark.operators.trajsim import dtw_join

    def build(pts):
        return dtw_join(pts, tau_norm_m=20_000.0, track="user_id",
                        ts="ts", tiebreak="event_id")

    out = _assert_invariant(build, spark, tracks_pd)
    assert len(out) > 0


def test_dedup_by_fingerprint_invariant_to_partitioning(spark):
    from xutil_spark.operators.dedup import dedup_by_fingerprint

    rng = np.random.RandomState(11)
    base = rng.randint(-2**62, 2**62, size=40, dtype=np.int64)
    fps = np.concatenate([base, base[:20], base[:10] ^ 1])  # dups + ham-1
    df_pd = pd.DataFrame({"doc_id": np.arange(len(fps)), "fp": fps})

    def build(src):
        return dedup_by_fingerprint(src, "fp", id_col="doc_id",
                                    max_hamming=3, bands=4)

    out = _assert_invariant(build, spark, df_pd)
    assert 0 < len(out) <= 40


def test_encounter_join_invariant_to_partitioning(spark, tracks_pd):
    from xutil_spark.operators.encounters import encounter_join

    ev = tracks_pd.rename(columns={"ts": "epoch"}).copy()
    ev["ts"] = pd.to_datetime(ev.pop("epoch"), unit="s")

    def build(src):
        return encounter_join(src, radius_m=10_000.0, window_s=600,
                              entity="user_id", event_id="event_id",
                              ts="ts")

    out = _assert_invariant(build, spark, ev)
    assert len(out) > 0
