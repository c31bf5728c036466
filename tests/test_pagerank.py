"""Integer-quantized PageRank (operators/graph.py)."""

import pandas as pd

from xutil_spark.operators.graph import pagerank_q

S = 10**9


def _edges(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        {"src": [r[0] for r in rows], "dst": [r[1] for r in rows],
         "w": [r[2] for r in rows]}))


def _replay(rows, iters=10, scale=S):
    nodes = sorted({u for u, _, _ in rows} | {v for _, v, _ in rows})
    n = len(nodes)
    W: dict = {}
    for u, _, w in rows:
        W[u] = W.get(u, 0) + w
    rank = {v: scale for v in nodes}
    base = scale * 15 // 100
    for _ in range(iters):
        inc = dict.fromkeys(nodes, 0)
        for u, v, w in rows:
            inc[v] += rank[u] * w // W[u]
        dang = sum(rank[v] for v in nodes if v not in W)
        rank = {v: base + 85 * (inc[v] + dang // n) // 100 for v in nodes}
    return rank


def _run(spark, rows, **kw):
    out = pagerank_q(_edges(spark, rows), weight="w", **kw)
    return {r.node: r.rq for r in out.collect()}


def test_two_node_cycle_symmetric(spark):
    rows = [(1, 2, 1), (2, 1, 1)]
    got = _run(spark, rows)
    assert got == _replay(rows)
    assert got[1] == got[2] == S  # symmetric cycle keeps initial mass


def test_star_concentrates_and_dangling_redistributes(spark):
    rows = [(1, 9, 1), (2, 9, 1), (3, 9, 1)]  # 9 is a dangling sink
    got = _run(spark, rows)
    assert got == _replay(rows)
    assert got[9] > got[1] == got[2] == got[3]


def test_weighted_asymmetry(spark):
    rows = [(1, 2, 3), (1, 3, 1), (2, 1, 1), (3, 1, 1)]
    got = _run(spark, rows)
    assert got == _replay(rows)
    assert got[2] > got[3]  # 3/4 of node 1's mass flows to 2


def test_multi_edges_add(spark):
    got_multi = _run(spark, [(1, 2, 2), (1, 2, 1), (2, 1, 1)])
    got_single = _run(spark, [(1, 2, 3), (2, 1, 1)])
    assert got_multi == got_single
