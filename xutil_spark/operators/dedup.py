"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash-LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each expressed Spark-first:

* exact       — hash-groupBy (map-side combined), keeps first doc per digest
* minhash-LSH — shingle → per-band min-hash signature → bucket self-join;
  the signature/bucket stages are pure builtin expressions (explode +
  md5 + groupBy(min)) so they scale shuffle-bound, not Python-bound.
  The md5-hex *lexicographic min* is a valid uniform min-hash (the hex
  string order equals the 128-bit integer order).
* simhash     — 64-bit token-hash bit-vote fingerprint (vectorized numpy
  UDF), near-dups = hamming distance ≤ t via band-exact buckets
* ngram-jaccard — exact Jaccard on shingle sets for candidate pairs
* embedding near-dup — cosine ≥ τ pairs via the similarity module

At 10^12-document scale: every stage is a narrow projection + one
shuffle (groupBy or self-join on bucket key); no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (min id wins — deterministic)."""
    digest = F.md5(F.col(text_col))
    keep = (
        df.withColumn("_digest", digest)
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )
    return keep


def shingles(col: str, k: int = 8) -> Column:
    """Character k-shingles as an array column (builtin sequence + substr
    — JVM-side, no Python).  ``col`` is a column name (the lambda-based
    substr needs SQL form).  Spark's sequence(1, 0) would count DOWN, so
    texts shorter than k need the explicit empty branch."""
    return F.expr(
        f"CASE WHEN length({col}) >= {k} THEN"
        f" transform(sequence(1, length({col}) - {k - 1}), i -> substr({col}, i, {k}))"
        f" ELSE array() END"
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 8, bands: int = 4,
) -> DataFrame:
    """Per-(doc, band) min-hash: min over shingles of md5(band || shingle).

    Output: (id, band, sig).  Documents sharing (band, sig) are LSH
    candidates.  One explode + one groupBy — map-side partial min keeps
    the shuffle small (one row per doc×band)."""
    sh = (
        df.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("_sh"))
        .withColumn("_band", F.explode(F.array(*[F.lit(b) for b in range(bands)])))
        .withColumn("_h", F.md5(F.concat(F.col("_band").cast("string"), F.lit("|"), F.col("_sh"))))
    )
    return sh.groupBy(id_col, "_band").agg(F.min("_h").alias("sig")).withColumnRenamed("_band", "band")


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 8, bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, sig) bucket.
    Self-join on the bucket key; a < b ordering dedups the pair set."""
    sig = minhash_signatures(df, text_col, id_col, k, bands)
    a = sig.select(F.col(id_col).alias("a"), "band", "sig")
    b = sig.select(F.col(id_col).alias("b"), "band", "sig")
    return (
        a.join(b, on=["band", "sig"], how="inner")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", k: int = 8, threshold: float = 0.7,
) -> DataFrame:
    """Exact Jaccard over char-k-shingle SETS for the candidate pairs.

    jaccard = |A∩B| / |A∪B| via array_intersect/array_union on
    deduplicated shingle arrays (builtin, JVM-side)."""
    sets = df.select(
        F.col(id_col), F.array_distinct(shingles(text_col, k)).alias("_set")
    )
    out = (
        pairs
        .join(sets.withColumnRenamed(id_col, "a").withColumnRenamed("_set", "_sa"), on="a")
        .join(sets.withColumnRenamed(id_col, "b").withColumnRenamed("_set", "_sb"), on="b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_union("_sa", "_sb")),
        )
        .select("a", "b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold is not None else out


# ------------------------------------------------------------------ simhash


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash: tokens hashed (splitmix64 of md5-low64), bit votes
    summed, sign → fingerprint.  Vectorized per batch over token arrays."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            continue
        hs = np.frombuffer(
            b"".join(hashlib.md5(tok.encode()).digest()[:8] for tok in toks),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(toks)
        fp = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(fp.astype(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    f = _simhash_batch
    f.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(f, "long")
    return df.select(F.col(id_col), udf(F.col(text_col)).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming ≤ t: split the 64-bit print into
    ``bands`` 16-bit bands; by pigeonhole any pair within hamming ≤
    bands-1 shares an exact band → bucket join, then exact hamming
    filter via bit_count(xor)."""
    sh = simhash(df, text_col, id_col)
    parts = []
    for b in range(bands):
        shift = b * (64 // bands)
        mask = (1 << (64 // bands)) - 1
        parts.append(
            sh.select(
                F.col(id_col),
                F.col("simhash"),
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", shift).bitwiseAND(F.lit(mask).cast("long")).alias("bkey"),
            )
        )
    bands_df = parts[0]
    for p in parts[1:]:
        bands_df = bands_df.unionByName(p)
    a = bands_df.select(F.col(id_col).alias("a"), F.col("simhash").alias("_ha"), "band", "bkey")
    b_ = bands_df.select(F.col(id_col).alias("b"), F.col("simhash").alias("_hb"), "band", "bkey")
    return (
        a.join(b_, on=["band", "bkey"], how="inner")
        .filter(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )
