"""Audio constellation fingerprinting + snippet→track matching — the
Shazam-style landmark pipeline (Wang 2003, public ISMIR paper) as exact
integer arithmetic, so the fingerprints are platform-exact and
VALUES-oracle-able (the ``phash_dct`` fixed-point idea applied to the
spectral domain).

Pipeline per clip (mono pcm16):

1. frame the int16 signal: ``frame``-sample windows every ``hop``;
2. integer spectrum per frame: ``|S| = |C · x|`` with the fixed-point
   DCT-II basis ``C[k][m] = rnd(cos(π(2m+1)k/2F)·16384)`` for
   k = 1..F/2−1 (DC dropped) — all int64, max |S| ≈ 2^37, exact;
3. one peak bin per LOG BAND (bin ranges [2^b, 2^{b+1}), 7 bands for
   F = 256; argmax with first-bin tie-break);
4. landmarks: the band-b peak at frame t pairs with the band-b peak at
   frames t+1..t+``fan_out``; ``fp = (p1·F/2 + p2)·8 + dt`` — band
   identity is implicit because bin ranges are disjoint.

Matching is the classic offset-vote: equi-join snippet and reference
fingerprints on ``fp``, count votes per (snippet, track, t_ref−t_snip)
— a true match concentrates its votes at ONE offset, noise spreads.

Scale shape (10^8 tracks): fingerprints are one ``mapInPandas`` with
batched framing + one (B·frames, F)×(F, F/2) integer matmul per Arrow
batch; the match is one equi-join on the 64-bit landmark (AQE handles
hot landmarks; a ``max_df`` cap like the containment join's applies if
a corpus has degenerate constant clips) + one count shuffle at
(snippet, track, offset) cardinality + one window top-1.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xutil_spark.raster.av import decode_audio


def _rnd(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def spec_basis(frame: int = 256, scale: int = 16384) -> np.ndarray:
    """Fixed-point DCT-II rows k = 1..frame/2−1 (images._dct_basis
    rounding convention)."""
    kmax = frame // 2
    out = np.empty((kmax - 1, frame), dtype=np.int64)
    for k in range(1, kmax):
        for m in range(frame):
            out[k - 1, m] = _rnd(
                math.cos(math.pi * (2 * m + 1) * k / (2 * frame)) * scale)
    return out


def _band_edges(frame: int) -> list[tuple[int, int]]:
    """Disjoint [2^b, 2^{b+1}) bin bands over k = 1..frame/2−1."""
    edges = []
    lo = 1
    while lo < frame // 2:
        hi = min(lo * 2, frame // 2)
        edges.append((lo, hi))
        lo = hi
    return edges


def clip_landmarks(samples: np.ndarray, C: np.ndarray,
                   bands: list[tuple[int, int]],
                   frame: int, hop: int, fan_out: int) -> list[tuple[int, int]]:
    """(t, fp) landmarks of one mono int64 sample array — shared by the
    engine kernel and usable by an independent replay (all-integer, so
    any correct implementation agrees exactly)."""
    if fan_out > 7:
        # fp = (p1*half + p2)*8 + dt reserves exactly 3 bits for dt:
        # a larger fan-out would silently alias (p2, dt) pairs and
        # corrupt offset votes downstream
        raise ValueError(
            f"fan_out={fan_out} exceeds the 3-bit dt field of the "
            "landmark packing (max 7)")
    n = len(samples)
    if n < frame:
        return []
    nf = (n - frame) // hop + 1
    idx = hop * np.arange(nf)[:, None] + np.arange(frame)[None, :]
    spec = np.abs(samples[idx].astype(np.int64) @ C.T)  # (nf, F/2-1)
    peaks = np.empty((nf, len(bands)), dtype=np.int64)
    for b, (lo, hi) in enumerate(bands):
        # spec column j holds bin k = j+1
        peaks[:, b] = np.argmax(spec[:, lo - 1:hi - 1], axis=1) + lo
    half = np.int64(C.shape[0] + 1)
    out = []
    for dt in range(1, fan_out + 1):
        if nf <= dt:
            continue
        fp = (peaks[:-dt] * half + peaks[dt:]) * 8 + dt  # (nf-dt, B)
        for t in range(nf - dt):
            out.extend((t, int(v)) for v in fp[t])
    return out


def audio_fingerprints(
    clips: DataFrame, frame: int = 256, hop: int = 128, fan_out: int = 3,
    id_col: str = "clip_id",
) -> DataFrame:
    """(id, t, fp) constellation landmarks per clip (see module doc)."""
    C = spec_basis(frame)
    bands = _band_edges(frame)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, ts, fps = [], [], []
            for r in b.itertuples(index=False):
                x = decode_audio(bytes(r.bytes), int(r.n_samples),
                                 int(r.channels), r.fmt)
                # decode normalizes int16/32768 → float64; ×32768 is
                # exact in float64, recovering the raw integer samples
                mono = (np.asarray(x[:, 0] if x.ndim == 2 else x)
                        * 32768.0).astype(np.int64)
                for t, fp in clip_landmarks(mono, C, bands, frame, hop,
                                            fan_out):
                    ids.append(getattr(r, id_col))
                    ts.append(t)
                    fps.append(fp)
            yield pd.DataFrame({id_col: ids, "t": ts, "fp": fps})

    return clips.mapInPandas(run, schema=f"{id_col} string, t int, fp long")


def audio_match(
    snippet_fp: DataFrame, ref_fp: DataFrame,
    snippet_id: str = "snippet_id", ref_id: str = "clip_id",
    min_votes: int = 4,
) -> DataFrame:
    """Best reference track per snippet by offset-consistent landmark
    votes.  Returns (snippet_id, ref_id, dt_off, votes) for snippets
    whose best offset reaches ``min_votes``; ties break on (ref, dt)."""
    s = snippet_fp.select(F.col(snippet_id), F.col("t").alias("_ts"), "fp")
    r = ref_fp.select(F.col(ref_id), F.col("t").alias("_tr"), "fp")
    votes = (
        s.join(r, "fp")
        .groupBy(snippet_id, ref_id,
                 (F.col("_tr") - F.col("_ts")).alias("dt_off"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy(snippet_id).orderBy(
        F.desc("votes"), F.col(ref_id), F.col("dt_off"))
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col("votes") >= min_votes))
        .drop("_rk")
    )
