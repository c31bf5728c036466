"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two training-pipeline staples the built-in windowed aggregations can't
express:

* **streaming first-seen dedup** — emit each digest's FIRST arrival
  only, across micro-batches; per-key state is the seen-digest set.
  The streaming twin of ``operators.dedup.exact_dedup``.
* **session windows with inactivity gap** — group events per key into
  sessions closed after ``gap`` of silence; state carries the open
  session, processing-time timeout flushes it.

Both follow the Spark-recommended shape: grouped Arrow batches in,
GroupState handle per key, vectorized pandas inside.  State size is
bounded per key (a hash set / one open-session tuple), so executors
hold O(keys) state — the scale knob is the key partitioning, as with
any stateful streaming op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

_DEDUP_OUT = StructType([
    StructField("shard", LongType(), False),
    StructField("digest", StringType(), False),
    StructField("doc_id", LongType(), True),
])
_DEDUP_STATE = StructType([StructField("seen", StringType(), True)])


def streaming_first_seen(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shards: int = 32,
) -> DataFrame:
    """First occurrence per md5 digest across the stream (exact dedup,
    streaming flavor).  Keys are digest shards — state distributes over
    ``shards`` groups; within one micro-batch the smallest id wins
    (deterministic), across batches the earlier batch wins.

    State per shard is the seen-digest set, serialized as one joined
    string (GroupState rows must be flat); at real scale prefer more
    shards + a digest-prefix key so each set stays small."""

    def dedup(key, pdfs, state: GroupState):
        seen = set()
        if state.exists:
            (blob,) = state.get
            if blob:
                seen = set(blob.split(","))
        # concat the group's Arrow chunks BEFORE dedup so "smallest id
        # wins" holds across the whole micro-batch, not per chunk
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                id_col, kind="stable"
            )
            fresh = batch[~batch["digest"].isin(seen)]
            first = fresh.drop_duplicates("digest", keep="first")
            seen.update(first["digest"])
            state.update((",".join(sorted(seen)),))
            if len(first):
                yield first[["shard", "digest", id_col]]
        else:
            state.update((",".join(sorted(seen)),))

    keyed = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    ).withColumn(
        "shard", F.pmod(F.xxhash64(F.col("digest")), F.lit(shards))
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        dedup, _DEDUP_OUT, _DEDUP_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


_SESS_OUT = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), True),
    StructField("session_end", TimestampType(), True),
    StructField("n_events", LongType(), False),
])
_SESS_STATE = StructType([
    StructField("start_us", LongType(), True),
    StructField("last_us", LongType(), True),
    StructField("n", LongType(), True),
])


def streaming_sessionize(
    events: DataFrame, gap_seconds: int = 1800,
    ts_col: str = "ts", key_col: str = "user_id",
    idle_flush_ms: int = 10_000,
    flush: str = "timeout",
) -> DataFrame:
    """Event-time session windows with an inactivity gap, one open
    session of state per key.

    Sessions CLOSE when a later event for the key arrives more than
    ``gap_seconds`` after the previous one (event-time); the open tail
    drains per ``flush``:

    * ``"timeout"`` — processing-time timeout after ``idle_flush_ms``
      of key silence (continuous pipelines with ongoing triggers);
    * ``"none"`` — no timeout registered; close tails by appending one
      far-future SENTINEL event per key to the replay instead (the
      sentinel closes every real session by the gap rule and itself
      stays open in state, never emitted).  Deterministic for bounded
      replays, and sidesteps the repeated timeout-only micro-batches
      an availableNow trigger would otherwise spin through."""
    gap_us = gap_seconds * 1_000_000

    def sess(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            for _ in pdfs:  # Arrow stream must drain even when empty
                pass
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            })
            return
        cur = state.get if state.exists else None
        closed = []
        for pdf in pdfs:
            # unit-safe µs: the source may be datetime64[us] (parquet)
            # or [ns] (createDataFrame) — normalize, don't assume ns
            ts_us = np.sort(
                pdf[ts_col].to_numpy("datetime64[us]").astype(np.int64),
                kind="stable",
            )
            for t in ts_us:  # per EVENT within the key group — bounded
                if cur is None:
                    cur = (int(t), int(t), 1)
                elif t - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (int(t), int(t), 1)
                else:
                    cur = (cur[0], int(t), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            if flush == "timeout":
                state.setTimeoutDuration(idle_flush_ms)
        if closed:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
            })

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush == "timeout" else GroupStateTimeout.NoTimeout
    )
    return events.select(key_col, ts_col).groupBy(key_col).applyInPandasWithState(
        sess, _SESS_OUT, _SESS_STATE, "append", timeout_conf,
    )
