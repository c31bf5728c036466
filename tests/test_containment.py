"""Fingerprint-containment near-dup pairs (operators/dedup.py)."""

import pandas as pd

from xutil_spark.operators.dedup import fingerprint_containment


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}))


BODY = ("the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd watches in silence under the stars")


def test_exact_dup_and_containment(spark):
    docs = _docs(spark, [
        (1, BODY),
        (2, BODY),                                     # exact dup of 1
        (3, BODY + " " + "x y z w v u t s " * 40),     # contains 1
        (4, "completely unrelated content about spark partitions and "
            "adaptive query execution at terabyte scale every day"),
    ])
    out = {(r.a, r.b): r for r in
           fingerprint_containment(docs, tau=0.5).collect()}
    assert out[(1, 2)].contain_ab == 1.0
    assert out[(1, 2)].contain_ba == 1.0
    assert out[(1, 2)].jaccard_est == 1.0
    # doc 1 inside doc 3: containment of A high, resemblance diluted
    pair13 = out.get((1, 3))
    assert pair13 is not None and pair13.contain_ab >= 0.5
    assert pair13.jaccard_est < pair13.contain_ab
    assert not any(4 in k for k in out)


def test_short_docs_excluded(spark):
    docs = _docs(spark, [(1, "tiny"), (2, "tiny"), (3, BODY)])
    assert fingerprint_containment(docs, tau=0.1).collect() == []


def test_max_df_drops_boilerplate_only_pairs(spark):
    head = "standard license header shared by every file in the corpus "
    rows = [(i, head + f"unique body {i} " * 12) for i in range(8)]
    docs = _docs(spark, rows)
    dense = fingerprint_containment(docs, tau=0.1)
    sparse = fingerprint_containment(docs, tau=0.1, max_df=4)
    n_dense, n_sparse = dense.count(), sparse.count()
    assert n_dense > 0
    # the boilerplate prints hit all 8 docs; capping df at 4 removes
    # the candidate pairs they alone generated
    assert n_sparse < n_dense
