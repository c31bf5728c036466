"""Deterministic sampling / mixture operators for training-data
curation (engine additions beyond the reference — a 100 TB corpus
pipeline's "data mixing" stage).

Everything is DETERMINISTIC by construction: selection orders rows by
a 60-bit hash rank ``conv(substr(md5(concat_ws('|', key…, salt)), 1,
15), 16, 10)`` — a pure builtin (codegen'd, no RNG state, no
``rand()`` whose value changes per task re-execution), so the same
input always yields the same sample, retries and speculative tasks
can't corrupt the result, and every operator is exactly reproducible
by an ANSI-SQL oracle (DuckDB spells the identical rank
``('0x' || substr(md5(…), 1, 15))::BIGINT``).

Scale shapes:

* ``sample_stratified_n`` — top-n per stratum by hash order: one
  window over a shuffle on the stratum key (rank ≤ n prunes in the
  window sort's partial stage).
* ``sample_fraction`` / ``sample_stratified_fraction`` — stateless
  hash-threshold filter: ``rank < fraction·2^60`` keeps ~fraction of
  rows with NO shuffle at all (the per-stratum variant reads its
  threshold from a broadcast dim).  This is the 10^12-row path: a
  pure narrow projection.
* ``mixture_resample`` — integer up/down-sampling to target mixture
  weights: per-row copy counts derive deterministically from the
  hash, rows explode by their copy count.  One broadcast join + one
  explode, no shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RANK_BITS = 60  # 15 hex digits of the md5 — fits a signed long
_RANK_SPAN = float(1 << _RANK_BITS)


def hash_rank(key_cols, salt: int = 0) -> Column:
    """Deterministic uniform rank in [0, 2^60) from the key columns
    (numerics are concat_ws-stringified identically in Spark and the
    SQL oracle)."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = F.md5(F.concat_ws("|", *[F.col(c) if isinstance(c, str) else c
                                 for c in key_cols], F.lit(str(salt))))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    return int(float(fraction) * _RANK_SPAN)


def sample_fraction(
    df: DataFrame, fraction: float, key_cols, salt: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically: a row survives
    iff its hash rank falls below fraction·2^60.  Stateless narrow
    filter — no shuffle, no RNG; the same (key, salt) always makes the
    same decision, so reruns/retries/speculation are exact."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return df
    return df.filter(hash_rank(key_cols, salt) < F.lit(_threshold(fraction)))


def sample_stratified_n(
    df: DataFrame, strata_col: str, n: int, key_cols, salt: int = 0,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum — the rows with the
    smallest hash ranks, ties broken by the key itself (total order →
    fully deterministic).  One window over the stratum shuffle."""
    from pyspark.sql.window import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(strata_col).orderBy(
        hash_rank(key_cols, salt).asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_srank", F.row_number().over(w))
        .filter(F.col("_srank") <= n)
        .drop("_srank")
    )


def sample_stratified_fraction(
    df: DataFrame, strata_col: str, fractions: dict,
    key_cols, default: float = 0.0, salt: int = 0,
) -> DataFrame:
    """Per-stratum hash-threshold sampling: stratum s keeps
    ~fractions[s] of its rows (``default`` for unlisted strata).
    Broadcast dim of thresholds + the stateless filter — the fact
    table never shuffles (the 10^12-row mixing path)."""
    spark = df.sparkSession
    rows = [(str(s), _threshold(f)) for s, f in fractions.items()]
    out = df
    if rows:
        dim = spark.createDataFrame(rows, schema=f"{strata_col} string, _thr long")
        out = df.join(F.broadcast(dim), on=strata_col, how="left")
    else:
        out = df.withColumn("_thr", F.lit(None).cast("long"))
    return (
        out.filter(hash_rank(key_cols, salt)
                   < F.coalesce(F.col("_thr"), F.lit(_threshold(default))))
        .drop("_thr")
    )


def mixture_resample(
    df: DataFrame, strata_col: str, weights: dict,
    key_cols, salt: int = 0,
) -> DataFrame:
    """Deterministic up/down-sampling to target mixture WEIGHTS (mean
    copies per row; e.g. 2.5 → every row appears twice and ~half the
    rows a third time; 0.25 → ~a quarter of rows appear once).

    copies(row) = floor(w) + [rank(row) < frac(w)·2^60] — the EXPECTED
    multiplicity is exactly w and the realization is a deterministic
    function of (key, salt).  Implementation: broadcast weight dim →
    per-row copy count → ``explode(sequence(1, copies))``; rows with
    copies = 0 drop.  Unlisted strata keep weight 1.  Output carries a
    ``copy_id`` column (1-based) so downstream stages can distinguish
    replicas."""
    spark = df.sparkSession
    rows = []
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for stratum {s!r}")
        base = int(w)
        rows.append((str(s), base, _threshold(float(w) - base)))
    out = df
    if rows:
        dim = spark.createDataFrame(
            rows, schema=f"{strata_col} string, _base int, _fthr long"
        )
        out = df.join(F.broadcast(dim), on=strata_col, how="left")
    else:
        out = (df.withColumn("_base", F.lit(None).cast("int"))
                 .withColumn("_fthr", F.lit(None).cast("long")))
    copies = (
        F.coalesce(F.col("_base"), F.lit(1))
        + F.when(hash_rank(key_cols, salt)
                 < F.coalesce(F.col("_fthr"), F.lit(0)), 1).otherwise(0)
    )
    return (
        out.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_base", "_fthr", "_copies")
    )
