"""Streaming-sketch operators: space-saving heavy hitters.

The space-saving summary (Metwally, Agrawal, El Abbadi — "Efficient
computation of frequent and top-k elements in data streams", public
algorithm) keeps at most ``capacity`` counters per partition; an
arriving key not in the summary evicts the minimum counter and
inherits its count as overestimation error.  Guarantees per partition:

* every key with true count > N/capacity is present;
* for a kept key, ``count - err ≤ true ≤ count``.

Distributed shape (Spark-first): one ``mapInPandas`` pass builds a
per-PARTITION summary (the generator folds every Arrow batch of its
partition into one bounded dict — batches are value_counts-vectorized,
the Python loop is per DISTINCT key per batch, capped by capacity);
the partition summaries (≤ capacity rows each) then merge with one
tiny groupBy.  Merge bound: a key absent from a SATURATED partition
may have occurred up to that partition's min-counter times there, so
its upper bound adds that partition's min; absent from an unsaturated
partition (nothing ever evicted) truly means count 0 there.

EXACT MODE: with ``capacity`` ≥ the per-partition distinct-key count
no partition saturates, every err is 0, and the merged counts equal
GROUP BY COUNT exactly — that regime is what the driver oracle checks
(same trick as IVF at nprobe = n_lists); the approximate regime's
bounds are pinned in pytest.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def space_saving_summaries(
    df: DataFrame, key_col: str, capacity: int = 4096,
) -> DataFrame:
    """Per-partition space-saving summaries: ≤ ``capacity`` rows per
    input partition, each (key, cnt, err, pmin, pid_).  ``pmin`` is
    the partition's absent-key bound — its minimum counter if the
    summary saturated, else 0 — riding along on every row so the merge
    needs no second pass."""
    schema = T.StructType([
        T.StructField("key", df.schema[key_col].dataType, True),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("err", T.LongType(), False),
        T.StructField("pmin", T.LongType(), False),
        T.StructField("pid_", T.IntegerType(), False),
    ])
    tagged = df.select(F.col(key_col).alias("key"),
                       F.spark_partition_id().alias("_pid"))

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import heapq

        pid = -1
        counters: dict = {}  # key -> [cnt, err]
        # lazy min-heap of (cnt, key): entries go stale when a key's
        # count is bumped (or the key is evicted); eviction pops stale
        # tops until it finds a live minimum — amortized O(log cap) per
        # eviction instead of a full O(cap) dict scan (a batch of many
        # distinct misses would otherwise degrade to O(distinct·cap))
        heap: list = []
        saturated = False
        for b in it:
            if len(b) and pid < 0:
                pid = int(b["_pid"].iloc[0])
            for key, n in b["key"].value_counts(dropna=True).items():
                n = int(n)
                if key in counters:
                    c = counters[key]
                    c[0] += n
                    heapq.heappush(heap, (c[0], key))
                elif len(counters) < capacity:
                    counters[key] = [n, 0]
                    heapq.heappush(heap, (n, key))
                else:
                    saturated = True
                    while True:
                        mc, mk = heap[0]
                        if counters.get(mk, (None,))[0] == mc:
                            break
                        heapq.heappop(heap)  # stale
                    heapq.heappop(heap)
                    counters.pop(mk)
                    counters[key] = [mc + n, mc]
                    heapq.heappush(heap, (mc + n, key))
            if len(heap) > 4 * capacity:  # compact accumulated stale entries
                heap = [(v[0], k) for k, v in counters.items()]
                heapq.heapify(heap)
        if not counters:
            return
        pmin = min(v[0] for v in counters.values()) if saturated else 0
        yield pd.DataFrame({
            "key": list(counters.keys()),
            "cnt": [v[0] for v in counters.values()],
            "err": [v[1] for v in counters.values()],
            "pmin": pmin,
            "pid_": pid,
        })

    return tagged.mapInPandas(build, schema=schema)


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 20, capacity: int = 4096,
) -> DataFrame:
    """Top-k keys with count bounds from merged space-saving summaries.

    Output: (key, count_lb, count_ub) ordered by count_ub DESC with a
    deterministic key tiebreak, limited to k.  In exact mode (no
    partition saturates) count_lb == count_ub == the true count."""
    summ = space_saving_summaries(df, key_col, capacity).localCheckpoint()
    total_pmin = (
        summ.select("pid_", "pmin").distinct()
        .agg(F.sum("pmin").alias("t")).first()["t"]
    ) or 0
    merged = (
        summ.groupBy("key")
        .agg(
            F.sum("cnt").alias("_cnt"),
            F.sum("err").alias("_err"),
            F.sum("pmin").alias("_seen_pmin"),
        )
        .select(
            "key",
            (F.col("_cnt") - F.col("_err")).alias("count_lb"),
            (F.col("_cnt") + F.lit(int(total_pmin)) - F.col("_seen_pmin"))
            .alias("count_ub"),
        )
    )
    return (
        merged.orderBy(F.col("count_ub").desc(), F.col("key").asc())
        .limit(k)
    )


def hll_reg_rank(key, p: int):
    """(register index, rank) columns for one key — the JVM half of the
    HLL sketch, shared by the batch and streaming variants.  Register =
    top ``p`` bits of xxhash64 (unsigned); rank = leading-zero count of
    the remaining bits + 1 via the ``bin()`` string-length trick."""
    h = F.xxhash64(F.col(key))
    reg = F.shiftrightunsigned(h, 64 - p)
    w = F.shiftleft(h, p)
    # bin() drops leading zeros (64 chars only when bit63 set);
    # w == 0 → max rank
    rank = F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(65) - F.length(F.bin(w)))
    return reg, rank


def hll_distinct(
    df: DataFrame,
    group: str,
    key: str,
    p: int = 8,
) -> DataFrame:
    """From-scratch HyperLogLog distinct-count sketch per group
    (Flajolet et al. 2007) — the mergeable cardinality estimator next
    to the space-saving frequency sketch.  Spark ships approx_count_
    distinct (HLL++); this one exists so the REGISTERS are a first-
    class mergeable table (cross-partition, cross-day, cross-source
    unions are register-max joins) and the estimate is exactly
    replayable.

    Determinism contract: the hash is ``xxhash64`` (pinned, replayed
    in pure Python elsewhere in the contract); register index = top
    ``p`` bits (unsigned), rank = leading-zero count of the remaining
    bits + 1 (via the ``bin()`` string-length trick — all JVM); the
    register table is exact integers (MAX is order-independent), and
    the final harmonic sum folds over registers in ASCENDING REGISTER
    ORDER (sort_array + aggregate), so even the float estimate is
    bit-reproducible.  Standard small-range correction (linear
    counting) included.

    Scale shape (10^12 rows): one map-side-combined MAX shuffle at
    (group, register ≤ 2^p) cardinality, then one per-group fold —
    the fact table is read once, nothing else is fact-sized.

    Returns (group, n_regs, est, est_hll) — ``est`` applies the
    small-range correction, ``est_hll`` is the raw HLL estimate; both
    rounded to 3 dp.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    reg, rank = hll_reg_rank(key, p)
    regs = (
        df.select(F.col(group).alias("g"), reg.alias("reg"),
                  rank.alias("rank"))
        .groupBy("g", "reg").agg(F.max("rank").alias("rank"))
    )
    per = regs.groupBy("g").agg(
        F.sort_array(F.collect_list(F.struct("reg", "rank"))).alias("_r"))
    # harmonic sum: absent registers contribute 2^0 = 1 each; present
    # ones fold in ascending register order
    n_regs = F.size("_r")
    hsum = (F.lit(float(m)) - n_regs.cast("double")
            + F.aggregate(
                "_r", F.lit(0.0),
                lambda acc, s: acc + F.pow(F.lit(2.0),
                                           -s["rank"].cast("double"))))
    raw = F.lit(alpha * m * m) / hsum
    zeros = (F.lit(m) - n_regs).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    # exact-integer register checksum: the strong (float-free) anchor
    chk = F.aggregate(
        "_r", F.lit(0).cast("long"),
        lambda acc, s: acc + s["reg"].cast("long") * 128 + s["rank"])
    return per.select(
        F.col("g").alias(group),
        n_regs.alias("n_regs"),
        chk.alias("reg_chk"),
        F.round(est, 3).alias("est"),
        F.round(raw, 3).alias("est_hll"),
    )
