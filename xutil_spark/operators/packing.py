"""Token-budget sequence packing — the LLM-pretraining data-prep stage
that bins documents into fixed-capacity training sequences.

Given per-document token counts, pack documents GREEDILY in id order
into sequences of at most ``budget`` tokens: a document that would
overflow the running sequence starts a new one (a document alone
larger than the budget gets its own sequence — downstream truncation
is the trainer's concern, not the packer's).

Packing is inherently sequential, so at scale it runs PER SHARD — the
standard web-pipeline shape: shard by ``doc_id % n_shards``, pack each
shard independently, emit ``(shard, seq_id)`` as the global sequence
key.  Shard count scales with the cluster; each shard's pack is one
``applyInPandas`` group whose work is O(#sequences) numpy
``searchsorted`` steps over one cumulative-sum array, not a per-row
Python loop.

100-TB story: one shuffle on the shard key (uniform by construction —
it's a modulus over dense ids), per-shard state is two scalars, output
cardinality = input.  The greedy order inside a shard is doc_id — a
deterministic total order, so re-runs (and the DuckDB oracle's
recursive-CTE replay) reproduce byte-identical packings.

Reference scope: engine addition beyond xvill/xutil (no reference
counterpart; closest is the split-parse-agg ColFloat64 math.go:18-37
shape of "derive numbers per row, fold per group").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("seq_id", T.LongType(), False),
    T.StructField("seq_offset", T.LongType(), False),
    T.StructField("n_tokens", T.LongType(), False),
])


def pack_sequences(docs: DataFrame, budget: int, n_shards: int = 8,
                   id_col: str = "doc_id",
                   token_col: str = "n_tokens") -> DataFrame:
    """Greedy fixed-budget packing: ``(doc_id, shard, seq_id,
    seq_offset, n_tokens)`` with ``seq_id`` counting sequences within
    the shard from 0 and ``seq_offset`` the document's token start
    inside its sequence.

    Invariants (pytest-pinned): per (shard, seq_id) the token sum is
    ≤ ``budget`` unless the sequence is a single over-budget document;
    offsets are the exclusive running sum of token counts inside the
    sequence; every input doc appears exactly once."""
    if budget < 1:
        raise ValueError("budget must be >= 1")

    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
        .cast("int").alias("shard"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        tok = pdf["n_tokens"].to_numpy(np.int64)
        cs = np.cumsum(tok)
        n = len(tok)
        seq = np.empty(n, dtype=np.int64)
        off = np.empty(n, dtype=np.int64)
        start, base, s = 0, 0, 0
        while start < n:
            # maximal prefix from `start` with cs[k] - base <= budget;
            # an over-budget head still ships alone (j clamps to start+1)
            j = int(np.searchsorted(cs, base + budget, side="right"))
            j = max(j, start + 1)
            seq[start:j] = s
            off[start] = 0
            if j > start + 1:
                off[start + 1: j] = cs[start: j - 1] - base
            base = int(cs[j - 1])
            start = j
            s += 1
        pdf["seq_id"] = seq
        pdf["seq_offset"] = off
        return pdf[["doc_id", "shard", "seq_id", "seq_offset", "n_tokens"]]

    return src.groupBy("shard").applyInPandas(pack, schema=PACK_SCHEMA)
