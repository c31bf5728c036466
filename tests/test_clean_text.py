"""C4-style text cleaning (operators/textops.py clean_text)."""

import pandas as pd

from xutil_spark.operators.textops import clean_text


def _run(spark, texts):
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(len(texts))), "text": texts}))
    return {r.doc_id: r for r in clean_text(df).collect()}


def test_tags_entities_controls_whitespace(spark):
    out = _run(spark, [
        '<p class="a">hello <b>world</b></p>',
        "a&nbsp;b &amp; c &#169; d",
        "line1\x00\x07line2\tline3\n\nline4",
        "   already clean   ",
    ])
    assert out[0].clean == "hello world"
    assert out[0].n_tags == 4 and out[0].n_entities == 0
    assert out[1].clean == "a b c d"
    assert out[1].n_entities == 3
    assert out[2].clean == "line1line2 line3 line4"
    assert out[3].clean == "already clean"
    assert out[3].markup_ratio > 0  # trimmed padding counts as markup


def test_unclosed_angle_not_a_tag(spark):
    out = _run(spark, ["3 < 5 and 7 > 2", "a<b>c"])
    assert out[0].clean == "3 < 5 and 7 > 2"
    assert out[0].n_tags == 0
    assert out[1].clean == "a c" and out[1].n_tags == 1


def test_empty_and_null_safe(spark):
    out = _run(spark, ["", "<br/>"])
    assert out[0].clean == "" and out[0].markup_ratio == 0.0
    assert out[1].clean == "" and out[1].markup_ratio == 1.0
