"""Audio / video multimodal columns: opaque ``binary`` payloads with
typed metadata, decoded and feature-extracted inside ``mapInPandas``.

Same pattern as raster.images (the BASELINE input_hint shape extended
to the other modalities):

* audio rows: ``(clip_id, bytes, sample_rate, n_samples, channels,
  fmt, caption)`` — fmt ``"pcm16"`` (interleaved little-endian int16)
  decodes for real with numpy; compressed codecs (mp3/flac/ogg) have
  no library in this environment and raise ``NotImplementedError`` —
  the plumbing (schema, batch shape, partitioning) is identical for
  any codec.
* video rows: ``(video_id, bytes, w, h, fps, n_frames, fmt,
  caption)`` — fmt ``"rawrgb"`` (frame-major H×W×3 uint8) decodes for
  real; containered codecs are stubbed the same way.

Deterministic synthetic tables live in ``data.synth_av`` so every
operator is testable end-to-end without external media files.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("sample_rate", T.IntegerType(), False),
    T.StructField("n_samples", T.IntegerType(), False),
    T.StructField("channels", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("caption", T.StringType(), False),
])

VIDEO_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("fps", T.DoubleType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("caption", T.StringType(), False),
])


def decode_audio(data: bytes, n_samples: int, channels: int, fmt: str) -> np.ndarray:
    """bytes → float64 (n_samples, channels) in [-1, 1)."""
    if fmt == "pcm16":
        a = np.frombuffer(data, dtype="<i2", count=n_samples * channels)
        return a.reshape(n_samples, channels).astype(np.float64) / 32768.0
    raise NotImplementedError(
        f"audio codec {fmt!r}: no decoder library in this environment "
        "(plug a real one here; the Spark plumbing is codec-agnostic)"
    )


def decode_video(data: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    """bytes → uint8 (n_frames, h, w, 3)."""
    if fmt == "rawrgb":
        a = np.frombuffer(data, dtype=np.uint8, count=n_frames * h * w * 3)
        return a.reshape(n_frames, h, w, 3)
    raise NotImplementedError(
        f"video codec {fmt!r}: no decoder library in this environment"
    )


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("caption", T.StringType(), False),
    T.StructField("duration_sec", T.DoubleType(), False),
    T.StructField("rms", T.DoubleType(), False),
    T.StructField("peak", T.DoubleType(), False),
    T.StructField("zero_cross_rate", T.DoubleType(), False),
])


def audio_features(clips: DataFrame) -> DataFrame:
    """Per-clip acoustic features: duration, RMS, peak, zero-crossing
    rate — the decode is per row (inherent for variable-length blobs),
    the feature math is vectorized numpy per clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                x = decode_audio(bytes(r.bytes), int(r.n_samples),
                                 int(r.channels), r.fmt)
                mono = x.mean(axis=1)
                zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                rows.append((
                    r.clip_id, r.caption,
                    round(int(r.n_samples) / int(r.sample_rate), 6),
                    round(float(np.sqrt(np.mean(mono * mono))), 6),
                    round(float(np.abs(mono).max(initial=0.0)), 6),
                    round(zc, 6),
                ))
            yield pd.DataFrame(rows, columns=[
                "clip_id", "caption", "duration_sec", "rms", "peak",
                "zero_cross_rate",
            ])

    return clips.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("caption", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_sec", T.DoubleType(), False),
    T.StructField("frame", T.BinaryType(), False),
    T.StructField("mean_lum", T.DoubleType(), False),
])


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Sample every ``every_n``-th frame of each video → one row per
    sampled frame (raw RGB bytes + timestamp + mean luminance).  The
    image operators (decode_stats / resize / tile_mosaic) then apply to
    the sampled frames directly — video is images after this stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                frames = decode_video(bytes(r.bytes), int(r.w), int(r.h),
                                      int(r.n_frames), r.fmt)
                idxs = np.arange(0, int(r.n_frames), every_n)
                lum = (
                    frames[idxs].astype(np.float64)
                    @ np.array([0.299, 0.587, 0.114])
                ).mean(axis=(1, 2))
                for j, i in enumerate(idxs):
                    rows.append((
                        r.video_id, r.caption, int(i),
                        round(int(i) / float(r.fps), 6),
                        frames[i].tobytes(),
                        round(float(lum[j]), 6),
                    ))
            yield pd.DataFrame(rows, columns=[
                "video_id", "caption", "frame_idx", "ts_sec", "frame",
                "mean_lum",
            ])

    return videos.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


SCENE_CUT_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("diff_sum", T.LongType(), False),
    T.StructField("is_cut", T.BooleanType(), False),
])


def scene_cuts(videos: DataFrame, threshold: int,
               circular: bool = False) -> DataFrame:
    """Scene-change detection: one row per consecutive frame pair —
    ``frame_idx`` is the LATER frame, ``diff_sum`` the exact integer
    sum of per-pixel-per-channel differences to the previous frame,
    ``is_cut`` whether it exceeds ``threshold``.

    The standard shot-boundary primitive for video training-data
    curation (segmenting web video into shots before frame sampling /
    captioning).  ``circular=False`` is the plain absolute difference
    (natural-image content); ``circular=True`` measures each channel
    on the mod-256 circle — ``min(d, 256−d)`` — the right metric for
    wrapping channels (hue planes, phase imagery, and the synthetic
    mod-gradient fixtures, where a +7 drift must read as 7, not 249).

    All-integer math (uint8 → int64 diff sum), so every value is
    platform-exact and oracle-checkable; one vectorized tensor op per
    video inside a single ``mapInPandas`` pass — no shuffle, no
    per-pixel Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("video_id", "frame_idx", "diff_sum",
                                    "is_cut")}
            for r in b.itertuples(index=False):
                nf = int(r.n_frames)
                if nf < 2:
                    continue
                fr = decode_video(bytes(r.bytes), int(r.w), int(r.h),
                                  nf, r.fmt).astype(np.int64)
                ad = np.abs(fr[1:] - fr[:-1])
                if circular:
                    ad = np.minimum(ad, 256 - ad)
                d = ad.sum(axis=(1, 2, 3))
                rows["video_id"].extend([r.video_id] * (nf - 1))
                rows["frame_idx"].extend(range(1, nf))
                rows["diff_sum"].extend(int(x) for x in d)
                rows["is_cut"].extend(bool(x > threshold) for x in d)
            yield pd.DataFrame(rows)

    return videos.mapInPandas(run, schema=SCENE_CUT_SCHEMA)
