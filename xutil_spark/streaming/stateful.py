"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two training-pipeline staples the built-in windowed aggregations can't
express:

* **streaming first-seen dedup** — emit each digest's FIRST arrival
  only, across micro-batches.  The state group IS the digest, so the
  per-key state is one flag row: Spark's state store shards the keys
  across executors (HDFS/RocksDB backed at real scale), state size is
  O(1) per key and never re-serialized as a growing blob.  The
  streaming twin of ``operators.dedup.exact_dedup``.
* **session windows with inactivity gap** — group events per key into
  sessions closed after ``gap`` of silence; state carries the open
  session, processing-time timeout flushes it.  Session splitting is
  one vectorized ``np.diff`` pass over the key's (globally sorted)
  micro-batch timestamps — no per-event Python.

Both follow the Spark-recommended shape: grouped Arrow batches in,
GroupState handle per key, vectorized pandas inside.  At 10^12-doc
scale the dedup state-key cardinality equals the distinct-digest count
— exactly how Spark's streaming dedupe (`dropDuplicates`) shards its
own state, and the shape the state store is built to hold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

_DEDUP_OUT = StructType([
    StructField("digest", StringType(), False),
    StructField("doc_id", LongType(), True),
])
# one flag row per digest — the state store shards keys, state per key
# never grows (vs a per-shard concatenated digest blob, which would
# re-serialize ALL seen digests every micro-batch)
_DEDUP_STATE = StructType([StructField("seen", LongType(), True)])


def streaming_first_seen(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """First occurrence per md5 digest across the stream (exact dedup,
    streaming flavor).  Keys the state group BY DIGEST: within one
    micro-batch the smallest id wins (deterministic), across batches
    the earlier batch wins (the state flag suppresses every later
    arrival).  Per-key state is a single long — bounded by
    construction; a pytest pins this across two micro-batches."""

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            for _ in pdfs:  # drain the Arrow stream; digest already out
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf[id_col].min())
                best = m if best is None or m < best else best
        if best is not None:
            state.update((1,))
            yield pd.DataFrame({"digest": [key[0]], "doc_id": [best]})

    keyed = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    )
    return keyed.groupBy("digest").applyInPandasWithState(
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
      an availableNow trigger would otherwise spin through.

    The split itself is vectorized: ALL of the key's Arrow chunks
    concatenate, sort once globally (a >10k-row group spans chunks in
    arbitrary shuffle order — per-chunk sorting would mis-split), then
    ``np.diff > gap`` marks the session breaks in one pass; only the
    carry-in/out of the open session is scalar."""
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
        # unit-safe µs: the source may be datetime64[us] (parquet) or
        # [ns] (createDataFrame) — normalize, don't assume ns.  Concat
        # EVERY chunk before the single global sort: a key group larger
        # than one Arrow batch arrives as multiple chunks in arbitrary
        # order, and session splitting is only correct on the fully
        # sorted sequence.
        chunks = [
            pdf[ts_col].to_numpy("datetime64[us]").astype(np.int64)
            for pdf in pdfs if len(pdf)
        ]
        cur = state.get if state.exists else None
        if not chunks:
            if cur is not None:
                state.update(cur)
                if flush == "timeout":
                    state.setTimeoutDuration(idle_flush_ms)
            return
        ts = np.sort(np.concatenate(chunks), kind="stable")
        closed: list[tuple[int, int, int]] = []
        carry_n = 0
        start0 = int(ts[0])
        if cur is not None:
            if start0 - cur[1] <= gap_us:
                start0, carry_n = cur[0], cur[2]  # open session continues
            else:
                closed.append(cur)
        # vectorized session splitting: break after index i when the
        # next event is > gap away
        breaks = np.flatnonzero(np.diff(ts) > gap_us)
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [len(ts) - 1]))
        counts = (ends - starts + 1).astype(np.int64)
        s_us = ts[starts].astype(object)
        s_us[0] = start0
        counts = counts.astype(object)
        counts[0] = int(counts[0]) + carry_n
        e_us = ts[ends]
        # all sessions but the last are closed; the last stays open
        for i in range(len(starts) - 1):
            closed.append((int(s_us[i]), int(e_us[i]), int(counts[i])))
        state.update((int(s_us[-1]), int(e_us[-1]), int(counts[-1])))
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


_GEOFENCE_OUT = StructType([
    StructField("user_id", LongType(), False),
    StructField("event_id", LongType(), False),
    StructField("ts", TimestampType(), True),
    StructField("kind", StringType(), False),
    StructField("fence_id", LongType(), False),
])
# one open row per entity: the fence it was last seen in (-1 = outside)
_GEOFENCE_STATE = StructType([StructField("last_fence", LongType(), True)])


def streaming_geofence(
    located: DataFrame, fence_col: str = "fence",
    key_col: str = "user_id", ts_col: str = "ts", id_col: str = "event_id",
) -> DataFrame:
    """Stateful geofence transition detection (geospatial × streaming):
    emit an ``exit`` / ``enter`` row whenever an entity's fence
    assignment changes between consecutive events.

    ``located`` already carries the per-event fence id (-1 = outside
    every fence) — assignment happens UPSTREAM as a codegen'd JVM
    expression (literal rectangles) or a broadcast PiP join, so this
    stage is pure transition logic.  Semantics (mirrored 1:1 by the
    batch lag() oracle):

    * events order by (ts, event_id) within each entity — WITHIN one
      micro-batch.  Across batches the state only remembers the last
      fence, so events arriving out of time order in a LATER batch
      produce transitions the batch lag() oracle would not: the 1:1
      oracle mirror holds only when each entity's events arrive in
      (ts, event_id) order across batches (trivially satisfied by the
      contract query's single availableNow batch; a production feed
      needs source ordering or an upstream watermark+sort stage);
    * a change from fence p to fence f at event e emits ``exit`` of p
      (if p ≠ -1) and ``enter`` of f (if f ≠ -1), both stamped with
      e's (ts, event_id);
    * the entity's first-ever event compares against -1 (outside).

    State per key is ONE long (the last fence) — bounded by
    construction, sharded by the state store; within a batch the
    change-scan is one vectorized shift-compare over the concatenated,
    lexsorted chunks (no per-event Python)."""

    def fence(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            for _ in pdfs:
                pass
            return
        chunks = [
            (
                pdf[ts_col].to_numpy("datetime64[us]").astype(np.int64),
                pdf[id_col].to_numpy(np.int64),
                pdf[fence_col].to_numpy(np.int64),
            )
            for pdf in pdfs if len(pdf)
        ]
        if not chunks:
            return
        ts = np.concatenate([c[0] for c in chunks])
        eid = np.concatenate([c[1] for c in chunks])
        fc = np.concatenate([c[2] for c in chunks])
        order = np.lexsort((eid, ts))
        ts, eid, fc = ts[order], eid[order], fc[order]
        carry = int(state.get[0]) if state.exists else -1
        prev = np.concatenate(([carry], fc[:-1]))
        chg = prev != fc
        state.update((int(fc[-1]),))
        if not chg.any():
            return
        exits = chg & (prev != -1)
        enters = chg & (fc != -1)
        rows = {
            "user_id": np.concatenate((np.full(int(exits.sum()), int(key[0]),
                                               dtype=np.int64),
                                       np.full(int(enters.sum()), int(key[0]),
                                               dtype=np.int64))),
            "event_id": np.concatenate((eid[exits], eid[enters])),
            "ts": pd.to_datetime(np.concatenate((ts[exits], ts[enters])),
                                 unit="us"),
            "kind": ["exit"] * int(exits.sum()) + ["enter"] * int(enters.sum()),
            "fence_id": np.concatenate((prev[exits], fc[enters])),
        }
        yield pd.DataFrame(rows)

    cols = [key_col, id_col, ts_col, fence_col]
    return located.select(*cols).groupBy(key_col).applyInPandasWithState(
        fence, _GEOFENCE_OUT, _GEOFENCE_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


_HLL_OUT = StructType([
    StructField("cell", LongType(), False),
    StructField("n_regs", IntegerType(), False),
    StructField("reg_chk", LongType(), False),
    StructField("est", DoubleType(), False),
    StructField("est_hll", DoubleType(), False),
])
_HLL_STATE = StructType([
    StructField("regs", ArrayType(LongType()), True),
])


def streaming_hll(
    events: DataFrame, group: str = "cell", key: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Streaming HyperLogLog per group — the sketch whose state update
    IS a streaming-native operation: registers only ever take maxima,
    so the per-key state (2^p small ints) is bounded, idempotent under
    replay, and merges across micro-batches exactly like the batch
    operator's shuffle combine.  After each batch the group emits its
    current (n_regs, reg_chk, est) — identical to
    ``operators.sketches.hll_distinct`` on the same prefix of the
    stream (the batch≡stream parity a sketch must have; pinned by the
    contract query's shared oracle replay).

    The xxhash64 register/rank math runs JVM-side BEFORE the stateful
    exchange (``hll_reg_rank`` — same expressions as batch); the
    Python side only folds maxima and evaluates the pinned-order
    harmonic sum."""
    import math as _math
    from decimal import ROUND_HALF_UP, Decimal

    from xutil_spark.operators.sketches import hll_reg_rank

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def _r3(x: float) -> float:
        # Match batch hll_distinct's F.round(col, 3) exactly: Spark
        # rounds the SHORTEST decimal repr of the double HALF_UP
        # (BigDecimal.valueOf), not the binary value — Python round()
        # is half-even and diverges on decimal-halfway estimates.
        return float(Decimal(repr(float(x))).quantize(
            Decimal("0.001"), rounding=ROUND_HALF_UP))

    def upd(key_, pdfs, state: GroupState):
        regs = [0] * m
        if state.exists:
            (prev,) = state.get
            regs = list(prev)
        for pdf in pdfs:
            for r, k in zip(pdf["reg"], pdf["rank"]):
                r = int(r)
                if int(k) > regs[r]:
                    regs[r] = int(k)
        state.update((regs,))
        present = [(i, v) for i, v in enumerate(regs) if v > 0]
        acc = 0.0
        for _, v in present:
            acc += 2.0 ** (-float(v))
        hsum = (float(m) - len(present)) + acc
        raw = (alpha * m * m) / hsum
        zeros = float(m - len(present))
        if raw <= 2.5 * m and zeros > 0:
            est = float(m) * _math.log(float(m) / zeros)
        else:
            est = raw
        chk = sum(i * 128 + v for i, v in present)
        yield pd.DataFrame({
            "cell": [int(key_[0])], "n_regs": [len(present)],
            "reg_chk": [chk], "est": [_r3(est)],
            "est_hll": [_r3(raw)],
        })

    reg, rank = hll_reg_rank(key, p)
    keyed = events.select(F.col(group).alias("cell"),
                          reg.alias("reg"), rank.alias("rank"))
    return keyed.groupBy("cell").applyInPandasWithState(
        upd, _HLL_OUT, _HLL_STATE, "update", GroupStateTimeout.NoTimeout)
