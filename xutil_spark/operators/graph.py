"""Graph analytics over edge tables — integer-quantized PageRank.

Engine addition: the mobility/doc-similarity graphs the other operators
emit (OD flows, co-route edges, near-dup pairs, kNN adjacency) want a
centrality measure; PageRank is the standard one and the classic
iterative-join Spark workload.

Determinism contract (the engine-wide quantize-before-reduce idea):
ranks live as int64 ``rank_q`` in units of 1/``scale``; every update
uses only integer arithmetic —

    share(u→v)   = (rank_q[u] · w_uv) div W_u        (W_u = Σ out-weights)
    new_rank_q[v] = base + (d_num · (Σ shares + dangling div N)) div d_den
    base          = (scale · (d_den − d_num)) div d_den

— so the result after a FIXED number of iterations is exact integer
arithmetic: order-independent (integer sums), platform-exact, and a
pure-Python replay agrees digit-for-digit.  Floor-division mass loss
(< 1 unit per edge per iteration) is part of the pinned semantics, not
error.

Scale shape (10^10 edges): the per-edge (u, v, w, W_u) table
materializes once (one groupBy + one join, checkpointed); each
iteration is ONE join of ranks onto edges + ONE map-side-combined sum
at node cardinality + a broadcast 1-row dangling frame — no driver
collect in the loop; a checkpoint per iteration truncates lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_q(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 10,
    scale: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """(node, rank_q) after ``iters`` exact quantized iterations.
    ``weight`` None treats every edge as weight 1; multi-edges add."""
    from xutil_spark.operators.dedup import _ckpt

    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    # canonicalize parallel edges first: the per-edge floor division
    # makes (w=2) + (w=1) differ from (w=3) otherwise
    e = (edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"),
                      w.alias("_w"))
         .groupBy("_u", "_v").agg(F.sum("_w").alias("_w")))
    nodes = (e.select(F.col("_u").alias("node"))
             .unionByName(e.select(F.col("_v").alias("node")))
             .distinct())
    nodes = _ckpt(nodes)
    n = nodes.count()
    outw = e.groupBy("_u").agg(F.sum("_w").alias("_tot"))
    e = _ckpt(e.join(outw, "_u"))
    base = (scale * (damp_den - damp_num)) // damp_den

    ranks = nodes.select("node", F.lit(int(scale)).cast("long").alias("rq"))
    for _ in range(iters):
        shares = (
            e.join(ranks.withColumnRenamed("node", "_u"), "_u")
            .select(F.col("_v").alias("node"),
                    F.expr("rq * _w div _tot").alias("_s"))
            .groupBy("node").agg(F.sum("_s").alias("_in"))
        )
        dang = (
            ranks.join(outw.withColumnRenamed("_u", "node"), "node",
                       "left_anti")
            .agg(F.coalesce(F.sum("rq"), F.lit(0)).alias("_dang"))
        )
        ranks = (
            nodes.join(shares, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (F.lit(base) + F.expr(
                    f"{damp_num} * (coalesce(_in, 0) + _dang div {n})"
                    f" div {damp_den}")).cast("long").alias("rq"))
        )
        ranks = _ckpt(ranks)
    return ranks
