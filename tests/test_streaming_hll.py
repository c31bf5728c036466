"""Streaming HyperLogLog (streaming/stateful.py streaming_hll)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from xutil_spark.operators.sketches import hll_distinct
from xutil_spark.streaming.stateful import streaming_hll


def _run_stream(spark, src, n_files):
    schema = "cell long, user_id long"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*.parquet"))
    out = streaming_hll(stream, group="cell", key="user_id", p=6)
    q = (out.writeStream.format("memory").queryName("hllstream")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    return spark.sql(
        "SELECT * FROM hllstream").toPandas()


def test_state_merges_across_micro_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 forces one micro-batch per file; the LAST
    emitted row per cell must equal the batch sketch over the union —
    register maxima merge exactly."""
    src = str(tmp_path / "hll_src")
    os.makedirs(src)
    b1 = pd.DataFrame({"cell": [1] * 40 + [2] * 10,
                       "user_id": list(range(40)) + list(range(10))})
    b2 = pd.DataFrame({"cell": [1] * 30,
                       "user_id": list(range(20, 50))})  # overlap 20-39
    spark.createDataFrame(b1).coalesce(1).write.parquet(src + "/a.parquet")
    spark.createDataFrame(b2).coalesce(1).write.parquet(src + "/b.parquet")

    got = _run_stream(spark, src, 2)
    # keep the final (largest-n_regs ⇒ latest) row per cell
    final = {}
    for _, r in got.iterrows():
        cur = final.get(r["cell"])
        if cur is None or r["n_regs"] >= cur["n_regs"]:
            final[r["cell"]] = r

    both = spark.createDataFrame(pd.concat([b1, b2]))
    batch = {r.g if hasattr(r, "g") else r["cell"]: r for r in
             hll_distinct(both, group="cell", key="user_id", p=6)
             .withColumnRenamed("cell", "cell").collect()}
    for cell in (1, 2):
        assert final[cell]["reg_chk"] == batch[cell]["reg_chk"]
        assert final[cell]["est"] == batch[cell]["est"]


def test_round3_half_up_matches_spark_round(spark):
    """The streaming side's _r3 must agree with batch F.round(x, 3)
    (BigDecimal HALF_UP on the shortest decimal repr) on the values
    where Python round() diverges — decimal-halfway estimates."""
    from decimal import ROUND_HALF_UP, Decimal

    def _r3(x):  # mirror of the closure inside streaming_hll
        return float(Decimal(repr(float(x))).quantize(
            Decimal("0.001"), rounding=ROUND_HALF_UP))

    vals = [2.0005, 1.1235, 0.0625, 0.0015, 123.4565, 3.0004999,
            41.2125, 7.9995, 0.001, 256.0]
    # Python banker's rounding disagrees on at least one of these
    assert any(round(v, 3) != _r3(v) for v in vals)
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    got = [r["r"] for r in
           sdf.select(F.round("x", 3).alias("r")).collect()]
    assert got == [_r3(v) for v in vals]
