"""Raster tile pyramid: child mosaics → ancestor mosaics, subtree-chunked.

The classic map-tile pyramiding stage (what a tile server runs after
rendering its base zoom): four ``deg×deg`` child tiles assemble into a
``2deg×2deg`` parent canvas (quadrant = child (x&1, y&1), missing
children stay black), which box-downsamples 2× back to ``deg×deg``.
Downsampling is integer floor((a+b+c+d)/4) per channel — platform-exact,
so every level's pixels are bit-reproducible and oracle-checkable.

Scale shape: levels are rendered in SUBTREE CHUNKS — the input tiles
are grouped by their ancestor cell ``chunk_levels`` zooms up (pure bit
arithmetic, functions.native.cell_parent — no geometry) and the whole
sub-pyramid of one ancestor is rendered inside a single
``applyInPandas`` call, emitting the passthrough children plus every
intermediate level.  One chunk = ONE shuffle for ``chunk_levels``
levels and ZERO recomputation (the naive per-level union re-evaluates
the base-mosaic lineage once per level — O(L·base) work — because each
level's plan nests the previous one's).  Group size is bounded by
4^chunk_levels tiles; ``chunk_levels`` is sized from a per-group byte
budget so a group's pixels stay ≪ executor memory at any ``deg``.

Deep pyramids (more levels than one chunk) chain chunks; each chunk
boundary is persisted MEMORY_AND_DISK because the boundary level feeds
both the result union and the next chunk — the standard iterative-Spark
pattern (at production scale each level batch is materialized to the
tile store anyway, which plays the same role).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native
from xutil_spark.kernels import codec as K_codec
from xutil_spark.kernels import tiles as K_tiles
from xutil_spark.raster.images import MOSAIC_SCHEMA

_MOSAIC_COLS = [f.name for f in MOSAIC_SCHEMA.fields]


def downsample2x(canvas: np.ndarray) -> np.ndarray:
    """(2d, 2d, 3) uint8 → (d, d, 3) uint8 box mean, floor((Σ4)/4)."""
    h, w, _ = canvas.shape
    s = canvas.astype(np.uint16).reshape(h // 2, 2, w // 2, 2, 3)
    return (s.sum(axis=(1, 3), dtype=np.uint16) // 4).astype(np.uint8)


def _render_subtree(pdf: pd.DataFrame, from_zoom: int, to_zoom: int,
                    deg: int, out_fmt: str) -> pd.DataFrame:
    """All levels (from_zoom-1 .. to_zoom) above one ancestor's children,
    plus the children passed through unchanged.  Sparse: memory is
    O(occupied tiles × deg²), never the dense 4^levels canvas."""
    out = [pdf.loc[:, _MOSAIC_COLS]]
    tiles: dict = {}
    for r in pdf.itertuples(index=False):
        x, y, _z = (int(v) for v in K_tiles.cell_decode(np.int64(r.cell)))
        tiles[(x, y)] = (
            K_codec.decode_image(bytes(r.bytes), deg, deg, r.fmt),
            int(r.n_images),
        )
    for z in range(from_zoom, to_zoom, -1):
        parents: dict = {}
        for (x, y), (px, n) in tiles.items():
            slot = parents.setdefault(
                (x >> 1, y >> 1),
                [np.zeros((2 * deg, 2 * deg, 3), dtype=np.uint8), 0],
            )
            slot[0][(y & 1) * deg:(y & 1) * deg + deg,
                    (x & 1) * deg:(x & 1) * deg + deg] = px
            slot[1] += n
        tiles = {xy: (downsample2x(c), n) for xy, (c, n) in parents.items()}
        out.append(pd.DataFrame({
            "cell": [int(K_tiles.cell_pack(x, y, z - 1))
                     for (x, y) in tiles],
            "zoom": z - 1,
            "n_images": [n for (_px, n) in tiles.values()],
            "deg": deg,
            "fmt": out_fmt,
            "bytes": [K_codec.encode_image(px, out_fmt)
                      for (px, _n) in tiles.values()],
        }))
    return pd.concat(out, ignore_index=True)


def _make_render(from_zoom: int, to_zoom: int, deg: int, out_fmt: str):
    """Streaming per-partition renderer for ``mapInPandas``: the input
    is hash-repartitioned AND sorted by the ancestor key, so one
    ancestor's tiles form a contiguous run — each run renders as soon
    as its key closes, holding at most one incomplete run across Arrow
    batch boundaries (memory stays at the group byte budget, never the
    partition).

    Grouping inside Python instead of ``groupBy().applyInPandas``
    because the pyramid's groups are often DEGENERATE (sparse mosaics
    ⇒ ~1 tile per ancestor): Arrow's per-group call overhead (~8 ms)
    dominated a 1,087-group chunk at ~9 s; batch-level grouping cuts
    it to per-partition overhead (measured ~6×)."""

    def render(batches):
        pending: pd.DataFrame | None = None
        for b in batches:
            if pending is not None:
                b = pd.concat([pending, b], ignore_index=True)
                pending = None
            if not len(b):
                continue
            keys = b["_acell"].to_numpy()
            # rows sorted by _acell within the partition: everything
            # before the last key's run is complete
            cut = int(np.searchsorted(keys, keys[-1]))
            done, pending = b.iloc[:cut], b.iloc[cut:]
            for _, g in done.groupby("_acell", sort=False):
                yield _render_subtree(g, from_zoom, to_zoom, deg, out_fmt)
        if pending is not None and len(pending):
            for _, g in pending.groupby("_acell", sort=False):
                yield _render_subtree(g, from_zoom, to_zoom, deg, out_fmt)

    return render


def _chunk_levels(deg: int, group_byte_budget: int) -> int:
    """Levels per chunk so one group's decoded children (4^L tiles of
    deg²×3 bytes) fit the budget; at least 1, at most 8 (4^8 = 65,536
    groups-per-parent is already far past any useful fan-in)."""
    per_tile = deg * deg * 3
    levels = int(math.log(max(group_byte_budget // per_tile, 4), 4))
    return max(1, min(8, levels))


def tile_pyramid(
    mosaics: DataFrame, from_zoom: int, to_zoom: int,
    deg: int = 256, out_fmt: str = "png",
    group_byte_budget: int = 256 << 20,
) -> DataFrame:
    """All pyramid levels from ``from_zoom`` (the input mosaics, passed
    through) up to ``to_zoom`` (coarser; to_zoom < from_zoom), unioned.
    Lazy single plan with one exchange per chunk (≈ one per
    ``chunk_levels`` levels); chunk boundaries persist MEMORY_AND_DISK
    only when more than one chunk is needed."""
    if not to_zoom < from_zoom:
        raise ValueError("to_zoom must be coarser (smaller) than from_zoom")
    step = _chunk_levels(deg, group_byte_budget)
    out: DataFrame | None = None
    cur = mosaics
    z = from_zoom
    while z > to_zoom:
        chunk_to = max(to_zoom, z - step)
        # partition count PINNED (repartition(N, col) is exempt from
        # AQE coalescing): pyramid groups are tiny in bytes but heavy
        # in Python render work, and byte-based coalescing starves the
        # renderer of cores (same fix as tile_mosaic — measured there
        # 3.4s → 1.3s at 32 cores)
        par = cur.sparkSession.sparkContext.defaultParallelism
        keyed = (
            cur.withColumn(
                "_acell", native.cell_parent(F.col("cell"), z, chunk_to))
            .repartition(par, F.col("_acell"))
            .sortWithinPartitions("_acell")
        )
        lvls = keyed.mapInPandas(
            _make_render(z, chunk_to, deg, out_fmt), schema=MOSAIC_SCHEMA)
        if chunk_to > to_zoom:
            # boundary level feeds BOTH the result and the next chunk —
            # persist so the chunk's shuffle+render runs exactly once
            lvls = lvls.persist()
            cur = lvls.filter(F.col("zoom") == chunk_to)
        # later chunks' passthrough (zoom == z) is already in `out`
        new = lvls if out is None else lvls.filter(F.col("zoom") != z)
        out = new if out is None else out.unionByName(new)
        z = chunk_to
    assert out is not None
    return out
