"""HyperLogLog sketch (operators/sketches.py hll_distinct)."""

from pyspark.sql import functions as F

from xutil_spark.operators.sketches import hll_distinct


def test_hll_estimates_within_standard_error(spark):
    # 3 groups with known cardinalities; p=8 → σ ≈ 1.04/√256 ≈ 6.5%
    df = spark.range(30000).select(
        (F.col("id") % 3).alias("g"),
        # group 0 sees 1000 distinct keys, 1 sees 5000, 2 sees 10000
        F.when(F.col("id") % 3 == 0, F.col("id") % 1000)
        .when(F.col("id") % 3 == 1, F.col("id") % 5000)
        .otherwise(F.col("id") % 10000).alias("k"))
    truth = {r.g: r.c for r in df.groupBy("g").agg(
        F.countDistinct("k").alias("c")).collect()}
    est = {r.g: r.est for r in
           hll_distinct(df, group="g", key="k").collect()}
    for g, t in truth.items():
        assert abs(est[g] - t) / t < 0.25, (g, est[g], t)


def test_hll_union_is_register_max(spark):
    # sketching A∪B must equal merging the register tables by max —
    # verified through the estimate equality on disjoint halves
    a = spark.range(0, 4000).select(F.lit(1).alias("g"),
                                    F.col("id").alias("k"))
    b = spark.range(2000, 6000).select(F.lit(1).alias("g"),
                                       F.col("id").alias("k"))
    whole = hll_distinct(a.unionByName(b), "g", "k").collect()[0]
    # duplicating rows must not change anything (max is idempotent)
    dup = hll_distinct(a.unionByName(b).unionByName(b), "g", "k").collect()[0]
    assert whole.reg_chk == dup.reg_chk and whole.est == dup.est
