"""Raster tile pyramid: child mosaics → ancestor mosaics, level by level.

The classic map-tile pyramiding stage (what a tile server runs after
rendering its base zoom): four ``deg×deg`` child tiles assemble into a
``2deg×2deg`` parent canvas (quadrant = child (x&1, y&1), missing
children stay black), which box-downsamples 2× back to ``deg×deg``.
Downsampling is integer floor((a+b+c+d)/4) per channel — platform-exact,
so every level's pixels are bit-reproducible and oracle-checkable.

Scale shape: each level is ONE shuffle keyed by the parent cell id
(pure bit arithmetic, functions.native.cell_parent — no geometry), with
≤ 4 rows per group; levels stack lazily into a single plan of
``from_zoom - to_zoom`` exchanges (log-depth in tile count).  At
10^12-image scale the base level is the output of ``tile_mosaic``
(bounded by distinct-cell count, not image count), so the pyramid's
total bytes are ≤ 4/3 × the base level.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native
from xutil_spark.kernels import codec as K_codec
from xutil_spark.kernels import tiles as K_tiles
from xutil_spark.raster.images import MOSAIC_SCHEMA


def downsample2x(canvas: np.ndarray) -> np.ndarray:
    """(2d, 2d, 3) uint8 → (d, d, 3) uint8 box mean, floor((Σ4)/4)."""
    h, w, _ = canvas.shape
    s = canvas.astype(np.uint16).reshape(h // 2, 2, w // 2, 2, 3)
    return (s.sum(axis=(1, 3), dtype=np.uint16) // 4).astype(np.uint8)


def _level_up(mosaics: DataFrame, child_zoom: int, deg: int,
              out_fmt: str) -> DataFrame:
    parent = mosaics.withColumn(
        "_pcell", native.cell_parent(F.col("cell"), child_zoom, child_zoom - 1)
    )

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pcell = int(key[0])
        canvas = np.zeros((2 * deg, 2 * deg, 3), dtype=np.uint8)
        n = 0
        for r in pdf.itertuples(index=False):
            x, y, _z = (int(v) for v in K_tiles.cell_decode(np.int64(r.cell)))
            px = K_codec.decode_image(bytes(r.bytes), deg, deg, r.fmt)
            canvas[(y & 1) * deg:(y & 1) * deg + deg,
                   (x & 1) * deg:(x & 1) * deg + deg] = px
            n += int(r.n_images)
        out = downsample2x(canvas)
        return pd.DataFrame({
            "cell": [pcell], "zoom": [child_zoom - 1], "n_images": [n],
            "deg": [deg], "fmt": [out_fmt],
            "bytes": [K_codec.encode_image(out, out_fmt)],
        })

    return parent.groupBy("_pcell").applyInPandas(render, schema=MOSAIC_SCHEMA)


def tile_pyramid(
    mosaics: DataFrame, from_zoom: int, to_zoom: int,
    deg: int = 256, out_fmt: str = "png",
) -> DataFrame:
    """All pyramid levels from ``from_zoom`` (the input mosaics, passed
    through) up to ``to_zoom`` (coarser; to_zoom < from_zoom), unioned.
    Lazy: the whole pyramid is one Catalyst plan with one exchange per
    level; nothing touches the driver."""
    if not to_zoom < from_zoom:
        raise ValueError("to_zoom must be coarser (smaller) than from_zoom")
    levels = [mosaics]
    cur = mosaics
    for z in range(from_zoom, to_zoom, -1):
        cur = _level_up(cur, z, deg, out_fmt)
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
