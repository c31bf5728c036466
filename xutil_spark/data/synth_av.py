"""Deterministic synthetic audio / video tables (raster.av schemas) —
no external media, every byte derivable from the row id, so decode
operators pin exactly in tests and contract queries."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from xutil_spark.data.synth import splitmix64
from xutil_spark.raster.av import AUDIO_SCHEMA, VIDEO_SCHEMA


def audio_samples_for(i: int, n_samples: int, channels: int = 1) -> np.ndarray:
    """Deterministic int16 PCM: a sine at an id-derived frequency plus
    splitmix noise — non-trivial RMS / zero-cross structure."""
    freq = 55.0 * (1 + (i % 32))
    t = np.arange(n_samples, dtype=np.float64) / 8000.0
    base = 0.5 * np.sin(2 * np.pi * freq * t)
    noise = (
        splitmix64(np.arange(n_samples, dtype=np.int64) + i * 1_000_003)
        .astype(np.float64) / 2**63 - 1.0
    ) * 0.05
    mono = np.clip(base + noise, -0.999, 0.999)
    x = np.repeat(mono[:, None], channels, axis=1)
    return (x * 32768.0).astype("<i2")


def audio_table(spark: SparkSession, n: int, n_samples: int = 4000) -> DataFrame:
    base = spark.range(n).toDF("i")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["i"]:
                i = int(i)
                pcm = audio_samples_for(i, n_samples)
                rows.append((
                    f"clip{i:06d}", pcm.tobytes(), 8000, n_samples, 1,
                    "pcm16", f"synthetic clip {i}",
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA])

    return base.mapInPandas(gen, schema=AUDIO_SCHEMA)


def video_frames_for(i: int, w: int, h: int, n_frames: int) -> np.ndarray:
    """Deterministic uint8 frames: a moving gradient (per-frame shift)
    seeded by the id — frame means differ frame-to-frame."""
    yy, xx = np.mgrid[0:h, 0:w]
    f = np.arange(n_frames)[:, None, None]
    r = (xx[None] * 3 + f * 7 + i) % 256
    g = (yy[None] * 5 + f * 11 + i * 3) % 256
    bch = (xx[None] + yy[None] + f * 13 + i * 5) % 256
    return np.stack([r, g, bch], axis=-1).astype(np.uint8)


def video_table(spark: SparkSession, n: int, w: int = 32, h: int = 24,
                n_frames: int = 30, fps: float = 10.0) -> DataFrame:
    base = spark.range(n).toDF("i")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["i"]:
                i = int(i)
                frames = video_frames_for(i, w, h, n_frames)
                rows.append((
                    f"vid{i:06d}", frames.tobytes(), w, h, fps, n_frames,
                    "rawrgb", f"synthetic video {i}",
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA])

    return base.mapInPandas(gen, schema=VIDEO_SCHEMA)


def video_scene_frames_for(i: int, w: int, h: int, n_frames: int,
                           scene_len: int) -> np.ndarray:
    """Deterministic frames with SCENE STRUCTURE: within a scene the
    gradient drifts slowly (+7/+11/+13 per frame, like
    ``video_frames_for``); at every ``scene_len`` boundary a per-scene
    offset jumps the whole palette, so consecutive-frame pixel
    difference is ~5× larger across a boundary than inside a scene —
    the signal ``raster.av.scene_cuts`` detects."""
    yy, xx = np.mgrid[0:h, 0:w]
    f = np.arange(n_frames)[:, None, None]
    off = (i * 131 + (f // scene_len) * 977) % 256
    r = (xx[None] * 3 + f * 7 + i + off) % 256
    g = (yy[None] * 5 + f * 11 + i * 3 + 2 * off) % 256
    bch = (xx[None] + yy[None] + f * 13 + i * 5 + 3 * off) % 256
    return np.stack([r, g, bch], axis=-1).astype(np.uint8)


def video_scene_table(spark: SparkSession, n: int, w: int = 16, h: int = 12,
                      n_frames: int = 24, scene_len: int = 8,
                      fps: float = 10.0) -> DataFrame:
    """Scene-structured videos (VIDEO_SCHEMA) for cut detection."""
    base = spark.range(n).toDF("i")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["i"]:
                i = int(i)
                frames = video_scene_frames_for(i, w, h, n_frames, scene_len)
                rows.append((
                    f"vid{i:06d}", frames.tobytes(), w, h, fps, n_frames,
                    "rawrgb", f"synthetic scenes {i}",
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA])

    return base.mapInPandas(gen, schema=VIDEO_SCHEMA)


def melody_samples_for(i: int, n_samples: int) -> np.ndarray:
    """Deterministic NON-STATIONARY int16 PCM: the sine frequency steps
    to a new id-derived note every 512 samples (so spectral frames
    differ over time — constellation fingerprints need time structure;
    ``audio_samples_for``'s stationary tone makes every frame's peaks
    identical).  Same splitmix noise floor."""
    blocks = []
    for b in range((n_samples + 511) // 512):
        ln = min(512, n_samples - b * 512)
        freq = 55.0 * (1 + ((i * 31 + b * 17) % 32))
        t = (np.arange(ln, dtype=np.float64) + b * 512) / 8000.0
        blocks.append(0.5 * np.sin(2 * np.pi * freq * t))
    base = np.concatenate(blocks)
    noise = (
        splitmix64(np.arange(n_samples, dtype=np.int64) + i * 1_000_003)
        .astype(np.float64) / 2**63 - 1.0
    ) * 0.05
    mono = np.clip(base + noise, -0.999, 0.999)
    return (mono[:, None] * 32768.0).astype("<i2")


def melody_table(spark: SparkSession, n: int, n_samples: int = 4000) -> DataFrame:
    """audio_table's schema over the non-stationary melody signal."""
    base = spark.range(n).toDF("i")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["i"]:
                i = int(i)
                pcm = melody_samples_for(i, n_samples)
                rows.append((
                    f"clip{i:06d}", pcm.tobytes(), 8000, n_samples, 1,
                    "pcm16", f"melody clip {i}",
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA])

    return base.mapInPandas(gen, schema=AUDIO_SCHEMA)


def snippet_table(spark: SparkSession, n: int, n_refs: int,
                  ref_samples: int = 4000, length: int = 2048,
                  hop: int = 128) -> DataFrame:
    """Deterministic query snippets: snippet i is a byte-exact excerpt
    of MELODY clip ``i*7 % n_refs`` starting at a hop-aligned,
    id-derived offset — so its frames align with the reference's and a
    correct fingerprint matcher recovers (ref, offset) exactly."""
    base = spark.range(n).toDF("i")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["i"]:
                i = int(i)
                ref = (i * 7) % n_refs
                off = hop * 2 * (i % 8)
                pcm = melody_samples_for(ref, ref_samples)[off:off + length]
                rows.append((
                    f"snip{i:06d}", pcm.tobytes(), 8000, len(pcm), 1,
                    "pcm16", f"snippet {i} of clip {ref}",
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA])

    return base.mapInPandas(gen, schema=AUDIO_SCHEMA).withColumnRenamed(
        "clip_id", "snippet_id")
