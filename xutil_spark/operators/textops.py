"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All heuristics are deterministic and built from builtin column
expressions (codegen'd, SQL-oracle-friendly); only the rolling-hash
fingerprint drops to a vectorized pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# deliberately small and fixed so the oracle SQL can embed them verbatim
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "fr": ["le", "la", "les", "de", "et", "est"],
    "de": ["der", "die", "und", "das", "ist", "von"],
}


def tokens(col) -> Column:
    """Whitespace tokenization of lowercased text (empty-safe)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """BPE-ish subword estimate: word-chunks + digits + punctuation each
    count; long words count ceil(len/4) pieces (a common ~4-chars/token
    heuristic)."""
    c = col if isinstance(col, Column) else F.col(col)
    words = tokens(c)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )


def stopword_hits(col, lang: str) -> Column:
    """How many tokens are stopwords of ``lang``."""
    sw = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(*sw)))


def lang_id(col) -> Column:
    """Deterministic stopword-ratio language ID over LANG_STOPWORDS;
    ties and zero-hit rows resolve to 'und'."""
    hits = [(lang, stopword_hits(col, lang)) for lang in LANG_STOPWORDS]
    best_score = F.greatest(*[h for _, h in hits])
    out = F.lit("und")
    # later langs win ties in reverse build order; iterate reversed so
    # the alphabetically-first language wins (deterministic, documented)
    for lang, h in reversed(hits):
        out = F.when((best_score > 0) & (h == best_score), lang).otherwise(out)
    return out


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition features + a 0-1
    quality score (fixed weights, deterministic)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    sw_total = sum((stopword_hits(c, lang) for lang in LANG_STOPWORDS), F.lit(0))
    uniq_ratio = F.size(F.array_distinct(tokens(c))) / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    upper_ratio = n_upper / F.greatest(n_chars, F.lit(1))
    stop_ratio = sw_total / F.greatest(n_tokens, F.lit(1))
    mean_word_len = (
        F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(n_tokens, F.lit(1))
    )
    score = (
        F.when(n_tokens >= 5, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((punct_ratio > 0.001) & (punct_ratio < 0.2), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(uniq_ratio > 0.5, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_word_len > 2.0) & (mean_word_len < 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_token_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(score, 2).alias("quality_score"),
    )


def rolling_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 16, keep: int = 8,
) -> DataFrame:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    char windows, keep the ``keep`` smallest hashes (a robust order-
    invariant sketch).  Fully vectorized: one sliding_window_view matmul
    per Arrow batch (uint64 wraparound = mod 2^64), no per-char Python."""
    from pyspark.sql.functions import pandas_udf

    B = np.uint64(1000003)
    # weights B^(w-1-j) mod 2^64 so hash(i) = sum data[i+j]*W[j]
    W = np.ones(window, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(window - 2, -1, -1):
            W[j] = W[j + 1] * B
    def fp(texts: pd.Series) -> pd.Series:
        bufs = [(t or "").encode("utf-8") for t in texts]
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        if len(bufs) == 0:
            return pd.Series([], dtype=object)
        # one concatenated buffer, window-1 zero-pad between docs so a
        # single sliding-window pass covers every doc without crossing
        data = np.frombuffer(
            (b"\x00" * (window - 1)).join(bufs), dtype=np.uint8
        ) if len(bufs) > 1 else np.frombuffer(bufs[0], dtype=np.uint8)
        starts = np.concatenate(
            ([0], np.cumsum(lens[:-1] + (window - 1)))
        )
        out = []
        if len(data) < window:
            return pd.Series([[] for _ in bufs])
        # accumulate over the `window` offsets (16 vectorized passes,
        # O(n) memory) instead of materializing an (n, window) matrix
        n_win = len(data) - window + 1
        h = np.zeros(n_win, dtype=np.uint64)
        d64 = data.astype(np.uint64)
        with np.errstate(over="ignore"):  # uint64 wrap == mod 2^64
            for j in range(window):
                h += d64[j : j + n_win] * W[j]
        for s, n in zip(starts, lens):
            if n < window:
                out.append([])
                continue
            smallest = np.unique(h[s : s + n - window + 1])[:keep]
            out.append([int(x.astype(np.int64)) for x in smallest])
        return pd.Series(out)

    fp.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(fp, "array<long>")
    return df.select(F.col(id_col), udf(F.col(text_col)).alias("fingerprint"))
