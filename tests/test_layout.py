"""Spatially-clustered write layout: per-file key ranges must be
(near-)disjoint, and a bbox predicate on the key must prune files."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_cluster_spatially_files_are_disjoint_ranges(spark, tmp_path):
    from xutil_spark.plans.layout import cluster_spatially

    rng = np.random.default_rng(23)
    n = 20_000
    pdf = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(73.5, 134.5, n),
        "lat": rng.uniform(18.2, 53.5, n),
    })
    # urban skew: 30% of points in a tiny hot box
    hot = rng.random(n) < 0.3
    pdf.loc[hot, "lon"] = rng.uniform(121.0, 121.6, int(hot.sum()))
    pdf.loc[hot, "lat"] = rng.uniform(31.0, 31.5, int(hot.sum()))

    out = str(tmp_path / "clustered")
    clustered = cluster_spatially(spark.createDataFrame(pdf), num_files=8)
    clustered.write.mode("overwrite").parquet(out)

    stats = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("gh_bits").alias("lo"), F.max("gh_bits").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(stats) == 8
    # range partitioning balances sizes even under skew (each file well
    # below the 30% hot mass) and produces disjoint key ranges
    spans = sorted((r["lo"], r["hi"], r["n"]) for r in stats)
    for (lo1, hi1, _), (lo2, _, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file key ranges overlap"
    assert max(r["n"] for r in stats) < n * 0.35

    # a key-range predicate prunes: Spark's parquet scan reports the
    # pushed filter, and the matched row set is correct
    lo, hi = spans[0][0], spans[0][1]
    q = spark.read.parquet(out).filter(
        (F.col("gh_bits") >= lo) & (F.col("gh_bits") <= hi)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "gh_bits" in plan
    assert q.count() == spans[0][2]
