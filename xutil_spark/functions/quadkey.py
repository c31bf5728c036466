"""Bing-Maps quadkey encode/decode as pure JVM column expressions.

The quadkey is the third tile-address scheme alongside the engine's
packed int64 cell (kernels/tiles.py) and geohash (functions/geohash.py):
digit i of the base-4 string interleaves bit ``z-1-i`` of the slippy
tile x and y (x is the low bit, y the high bit), so the string is
simultaneously a tile id AND its full ancestor chain — ``qk[:k]`` is
the zoom-k parent, which makes prefix filters / LIKE 'qk%' scans the
string-keyed twin of the packed cell's bit-shift ``cell_parent``.
The reference's tile kernel (gis.go:262-283) stops at raw (x, y, z);
quadkeys are the engine's addressing extension for string-keyed
storage layouts (object-store prefixes, range-partitioned keys).

Both directions are unrolled fixed-depth bit arithmetic over int64 —
zero Python workers, whole-stage codegen throughout, and the identical
expression transcribes 1:1 into the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xutil_spark.functions.native import _c, cell_x, cell_y


def quadkey_from_xy(x, y, z: int) -> Column:
    """Tile (x, y) at zoom ``z`` → quadkey string of length ``z``.

    digit_i = ((x >> (z-1-i)) & 1) + 2·((y >> (z-1-i)) & 1), i = 0..z-1.
    """
    if z < 1:
        raise ValueError("quadkey needs zoom >= 1")
    xc, yc = _c(x).cast("long"), _c(y).cast("long")
    one = F.lit(1).cast("long")
    digits = []
    for i in range(z):
        s = z - 1 - i
        d = (
            F.shiftright(xc, s).bitwiseAND(one)
            + F.shiftright(yc, s).bitwiseAND(one) * F.lit(2).cast("long")
        )
        digits.append(d.cast("string"))
    return F.concat(*digits)


def quadkey_from_cell(cell_col, z: int) -> Column:
    """Packed cell id at zoom ``z`` → quadkey string (length ``z``)."""
    return quadkey_from_xy(cell_x(cell_col), cell_y(cell_col), z)


def quadkey_to_xy(qk, z: int) -> tuple[Column, Column]:
    """Quadkey string of length ``z`` → (tile x, tile y) longs.

    x = Σ (digit_i & 1) << (z-1-i),  y = Σ (digit_i >> 1) << (z-1-i).
    """
    if z < 1:
        raise ValueError("quadkey needs zoom >= 1")
    q = _c(qk)
    xs, ys = [], []
    for i in range(z):
        d = F.substring(q, i + 1, 1).cast("long")
        w = F.lit(1 << (z - 1 - i)).cast("long")
        xs.append((d % F.lit(2).cast("long")) * w)
        ys.append(F.floor(d / F.lit(2)).cast("long") * w)
    x = xs[0]
    for t in xs[1:]:
        x = x + t
    y = ys[0]
    for t in ys[1:]:
        y = y + t
    return x, y


def quadkey_sql(x_expr: str, y_expr: str, z: int) -> str:
    """The 1:1 ANSI-SQL transcription of :func:`quadkey_from_xy` for
    DuckDB oracles — same unrolled digit arithmetic."""
    # full parenthesization: SQL's & binds LOOSER than + and *
    parts = [
        f"CAST(((({x_expr}) >> {z - 1 - i}) & 1)"
        f" + 2 * ((({y_expr}) >> {z - 1 - i}) & 1) AS VARCHAR)"
        for i in range(z)
    ]
    return "concat(" + ", ".join(parts) + ")"
