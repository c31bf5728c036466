"""Exact duplicate token spans + coverage (operators/textops.py)."""

import pandas as pd

from xutil_spark.operators.textops import dup_span_coverage, dup_token_spans


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}))


def _w(k, tag=""):
    return " ".join(f"w{tag}{i}" for i in range(k))


def test_dup_spans_counts(spark):
    shared = _w(6, "s")           # a 6-token verbatim block
    docs = _docs(spark, [
        (1, shared + " " + _w(4, "a")),
        (2, _w(4, "b") + " " + shared),
        (3, _w(10, "c")),
    ])
    out = dup_token_spans(docs, n=6).collect()
    # exactly the one shared 6-gram is duplicated
    assert len(out) == 1
    r = out[0]
    assert (r.n_occ, r.n_docs, r.min_doc, r.max_doc) == (2, 2, 1, 2)


def test_coverage_interval_union_not_sum(spark):
    # doc 1 and 2 share a 8-token block → doc 1 has 3 overlapping
    # duplicated 6-grams; covered tokens must be 8 (union), not 18
    shared = _w(8, "s")
    docs = _docs(spark, [
        (1, shared + " " + _w(5, "a")),
        (2, _w(3, "b") + " " + shared),
        (3, _w(12, "c")),
    ])
    cov = {r.doc_id: r for r in dup_span_coverage(docs, n=6).collect()}
    assert cov[1].n_dup_spans == 3
    assert cov[1].covered_tokens == 8
    assert cov[1].coverage == round(8 / 13, 9)
    assert cov[3].covered_tokens == 0 and cov[3].coverage == 0.0


def test_exact_dup_docs_fully_covered(spark):
    body = _w(15, "d")
    docs = _docs(spark, [(1, body), (2, body)])
    cov = {r.doc_id: r for r in dup_span_coverage(docs, n=10).collect()}
    assert cov[1].coverage == 1.0 and cov[2].coverage == 1.0


def test_short_docs_report_zero(spark):
    docs = _docs(spark, [(1, _w(5)), (2, _w(5)), (3, _w(25, "x"))])
    assert dup_token_spans(docs, n=20).collect() == []
    cov = {r.doc_id: r for r in dup_span_coverage(docs, n=20).collect()}
    assert set(cov) == {1, 2, 3}
    assert all(c.coverage == 0.0 for c in cov.values())


def test_within_doc_repetition_counts(spark):
    block = _w(6, "r")
    docs = _docs(spark, [(1, block + " " + _w(3, "m") + " " + block),
                         (2, _w(9, "z"))])
    out = dup_token_spans(docs, n=6).collect()
    assert len(out) == 1
    assert out[0].n_occ == 2 and out[0].n_docs == 1
