"""ViT-style image patch extraction over the images fact table.

Training pipelines for vision models consume images as fixed-size
patch grids (patch embedding inputs); at 10^12-image scale patch
extraction is the map stage that dominates preprocessing cost.  This
operator decodes each image once and emits one row per full ``P×P``
patch — patch bytes (raw interleaved RGB, C-order) plus exact integer
channel statistics — inside a single ``mapInPandas`` pass.

Engine shape: narrow projection in, one Python stage, no shuffle.
Patch counts per image are ``⌊w/P⌋·⌊h/P⌋`` (partial border patches are
dropped, the standard ViT convention).  The per-image reshape
``(ny, P, nx, P, 3)`` turns per-patch channel sums into one vectorized
``.sum(axis=(2, 4))`` — no per-patch Python except the byte slice.

100-TB story: embarrassingly parallel, output partitioning inherits
the input, patch rows are written columnar so downstream shuffles
(e.g. patch-level dedup) key on scalar columns only.

Reference scope: engine addition beyond xvill/xutil (the reference has
no raster surface; nearest neighbors are the byte codecs in
archive.go) — implements the BASELINE.json input_hint multimodal
contract alongside raster/images.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from xutil_spark.kernels import codec as K_codec

PATCH_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("py", T.IntegerType(), False),
    T.StructField("px", T.IntegerType(), False),
    T.StructField("mean_r", T.DoubleType(), False),
    T.StructField("mean_g", T.DoubleType(), False),
    T.StructField("mean_b", T.DoubleType(), False),
    T.StructField("psum", T.LongType(), False),
    T.StructField("bytes", T.BinaryType(), False),
])


def patchify(images: DataFrame, patch: int = 16,
             id_col: str = "image_id") -> DataFrame:
    """One row per full ``patch×patch`` tile of every image:
    ``(image_id, py, px, mean_r, mean_g, mean_b, psum, bytes)``.

    ``py``/``px`` index the patch grid (row-major), ``bytes`` is the
    raw interleaved-RGB patch (C-order ``uint8``, exactly
    ``patch·patch·3`` bytes), channel means are integer-exact
    (integer pixel sums / patch area, rounded to 6 dp), ``psum`` is
    the exact all-channel pixel sum.  Images smaller than one patch
    on either axis emit no rows."""
    if patch < 1:
        raise ValueError("patch must be >= 1")
    area = patch * patch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("image_id", "py", "px", "mean_r",
                                    "mean_g", "mean_b", "psum", "bytes")}
            for r in b.itertuples(index=False):
                w, h = int(r.w), int(r.h)
                ny, nx = h // patch, w // patch
                if ny == 0 or nx == 0:
                    continue
                img = K_codec.decode_image(bytes(r.bytes), w, h, r.fmt)
                crop = np.ascontiguousarray(img[: ny * patch, : nx * patch])
                grid = crop.reshape(ny, patch, nx, patch, 3)
                sums = grid.sum(axis=(1, 3), dtype=np.int64)  # (ny, nx, 3)
                rid = getattr(r, id_col)
                for yi in range(ny):
                    for xi in range(nx):
                        s = sums[yi, xi]
                        rows["image_id"].append(rid)
                        rows["py"].append(yi)
                        rows["px"].append(xi)
                        rows["mean_r"].append(round(float(s[0]) / area, 6))
                        rows["mean_g"].append(round(float(s[1]) / area, 6))
                        rows["mean_b"].append(round(float(s[2]) / area, 6))
                        rows["psum"].append(int(s.sum()))
                        rows["bytes"].append(
                            np.ascontiguousarray(grid[yi, :, xi]).tobytes())
            yield pd.DataFrame(rows)

    return images.mapInPandas(run, schema=PATCH_SCHEMA)


SHARPNESS_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("lap_sum", T.LongType(), False),
    T.StructField("lap_sq", T.LongType(), False),
    T.StructField("n_int", T.LongType(), False),
    T.StructField("sharpness", T.DoubleType(), False),
])


def sharpness_stats(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Blur/sharpness score per image: variance of the 4-neighbor
    Laplacian of the integer grayscale — the standard cheap blur
    detector for training-data image curation (low variance = flat /
    out-of-focus image).

    All-integer interior math: ``gray = (299r + 587g + 114b) // 1000``
    (same luma as ``images.dhash``), ``L = 4·g − g_up − g_down −
    g_left − g_right`` at the ``(w−2)·(h−2)`` interior pixels; the row
    carries the exact ``ΣL`` / ``ΣL²`` / count and the derived
    ``sharpness = round(ΣL²/n − (ΣL/n)², 6)`` so the float step is one
    fixed expression both the engine and any oracle can replay
    bit-for-bit.  Images with no interior (w or h < 3) emit n_int=0
    and sharpness 0."""
    luma = np.array([299, 587, 114], dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("image_id", "lap_sum", "lap_sq",
                                    "n_int", "sharpness")}
            for r in b.itertuples(index=False):
                w, h = int(r.w), int(r.h)
                img = K_codec.decode_image(bytes(r.bytes), w, h, r.fmt)
                g = (img.astype(np.int64) @ luma) // 1000
                if w < 3 or h < 3:
                    ls, lq, n = 0, 0, 0
                else:
                    c = g[1:-1, 1:-1]
                    lap = (4 * c - g[:-2, 1:-1] - g[2:, 1:-1]
                           - g[1:-1, :-2] - g[1:-1, 2:])
                    ls = int(lap.sum())
                    lq = int((lap * lap).sum())
                    n = (w - 2) * (h - 2)
                sharp = (round(lq / n - (ls / n) ** 2, 6) if n else 0.0)
                rows["image_id"].append(getattr(r, id_col))
                rows["lap_sum"].append(ls)
                rows["lap_sq"].append(lq)
                rows["n_int"].append(n)
                rows["sharpness"].append(sharp)
            yield pd.DataFrame(rows)

    return images.mapInPandas(run, schema=SHARPNESS_SCHEMA)


HIST_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bin", T.IntegerType(), False),
    T.StructField("n_px", T.LongType(), False),
])


def color_histogram(images: DataFrame, bins_per_channel: int = 4,
                    id_col: str = "image_id") -> DataFrame:
    """Exact joint RGB color histogram per image: one row per NON-EMPTY
    bin, ``bin = br·B² + bg·B + bb`` with ``bc = channel · B // 256``
    (equal-width buckets; B a power of two keeps the bucketing exact
    integer shifts).  The standard color-signature feature for image
    curation (near-dup blocking, low-color-diversity filtering) —
    all-integer, so every count is oracle-checkable.

    One ``mapInPandas`` pass; per image the histogram is a single
    ``np.bincount`` over a vectorized index — no per-pixel Python."""
    B = int(bins_per_channel)
    if B < 2 or B > 256 or (B & (B - 1)) != 0:
        raise ValueError("bins_per_channel must be a power of two in [2, 256]")
    shift = 8 - B.bit_length() + 1  # 256/B = 2^shift

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, bins, counts = [], [], []
            for r in b.itertuples(index=False):
                px = K_codec.decode_image(bytes(r.bytes), int(r.w), int(r.h),
                                          r.fmt).astype(np.int64)
                idx = ((px[:, :, 0] >> shift) * B * B
                       + (px[:, :, 1] >> shift) * B + (px[:, :, 2] >> shift))
                hist = np.bincount(idx.ravel(), minlength=B ** 3)
                nz = np.nonzero(hist)[0]
                ids.extend([getattr(r, id_col)] * len(nz))
                bins.extend(int(x) for x in nz)
                counts.extend(int(hist[x]) for x in nz)
            yield pd.DataFrame({"image_id": ids, "bin": bins, "n_px": counts})

    return images.mapInPandas(run, schema=HIST_SCHEMA)


ENTROPY_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("n_bins", T.IntegerType(), False),
    T.StructField("n_px", T.LongType(), False),
    T.StructField("entropy_bits", T.DoubleType(), False),
])


def color_entropy(images: DataFrame, bins_per_channel: int = 4,
                  id_col: str = "image_id") -> DataFrame:
    """Shannon entropy (bits) of the joint RGB histogram per image —
    the standard low-color-diversity curation filter (near-constant
    images, solid banners, blank scans score ≈0; natural photos score
    high).

    ``H = log2(N) − (Σ_bins n·log2(n)) / N`` over the same exact
    ``B³``-bin joint histogram as ``color_histogram``.

    Determinism contract: the Σ is a SEQUENTIAL Python accumulation in
    ascending bin order over the ≤B³ nonzero integer counts (≤64 terms
    at B=4 — negligible next to the decode), and ``math.log2`` of an
    exact integer is the identical libm call the pure-Python oracle
    replays — so the resulting double is bit-exact, no tolerance
    needed.  One ``mapInPandas`` pass, no shuffle; the histogram is a
    vectorized ``np.bincount`` exactly as in ``color_histogram``."""
    import math

    B = int(bins_per_channel)
    if B < 2 or B > 256 or (B & (B - 1)) != 0:
        raise ValueError("bins_per_channel must be a power of two in [2, 256]")
    shift = 8 - B.bit_length() + 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict = {f.name: [] for f in ENTROPY_SCHEMA}
            for r in b.itertuples(index=False):
                px = K_codec.decode_image(bytes(r.bytes), int(r.w), int(r.h),
                                          r.fmt).astype(np.int64)
                idx = ((px[:, :, 0] >> shift) * B * B
                       + (px[:, :, 1] >> shift) * B + (px[:, :, 2] >> shift))
                hist = np.bincount(idx.ravel(), minlength=B ** 3)
                nz = np.nonzero(hist)[0]
                n = int(hist.sum())
                s = 0.0
                for k in nz:
                    c = int(hist[k])
                    s += c * math.log2(c)
                h = math.log2(n) - s / n
                rows["image_id"].append(getattr(r, id_col))
                rows["n_bins"].append(int(len(nz)))
                rows["n_px"].append(n)
                rows["entropy_bits"].append(round(h, 9))
            yield pd.DataFrame(rows)

    return images.mapInPandas(run, schema=ENTROPY_SCHEMA)
