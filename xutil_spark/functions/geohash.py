"""Geohash encoding as pure JVM Column expressions (no UDF).

Engine addition beyond the reference (its cell schemes are slippy
tiles, gis.go:238-283, and the round-3 S2 kernel): geohash is the
third prefix-partitionable spatial key, and the only one whose cell
token is a plain string — handy for range scans and human-readable
bucketing at 100 TB (sort/partition by geohash prefix ≡ spatial
locality).

Construction (public algorithm): quantize lon/lat to 30 bits each,
bit-interleave (lon first — Morton/Z-order spread via the classic
magic-mask shifts), take the top ``5·precision`` bits, emit base32
digits ("0123456789bcdefghjkmnpqrstuvwxyz").  Everything is builtin
shift/mask/substring expressions — whole-stage codegen, zero Python.

The truncation identity makes parents free: geohash(p) is a string
PREFIX of geohash(p') for p < p' (same reason s2_parent is a bit
mask) — rollups to coarser cells are a substring, not a re-encode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# classic 32→64 even-bit spread (x0 → bit 0, x1 → bit 2, …)
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _lit64(v: int) -> Column:
    return F.lit(v).cast("long")


def _spread_bits(c: Column) -> Column:
    x = c.bitwiseAND(_lit64(0xFFFFFFFF))
    for sh, m in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(_lit64(m))
    return x


def _quant(c: Column, lo: float, span: float) -> Column:
    """floor((v - lo) / span · 2³⁰), clamped to [0, 2³⁰−1].

    This exact float expression is MIRRORED by the scalar oracle
    (entry_queries6._geohash_py): sharing the quantization arithmetic
    keeps boundary points bit-identical on both sides; the
    interleave/base32 stages stay independently implemented."""
    q = F.floor(((c - F.lit(lo)) / F.lit(span)) * F.lit(float(1 << 30))).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(q, _lit64((1 << 30) - 1)))


def geohash_bits(lon, lat, precision: int = 12) -> Column:
    """The 5·precision-bit geohash integer (lon bit first / MSB).
    Useful directly as a partitioning key: numeric ranges of this
    value are spatial cells."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    x = _spread_bits(_quant(lon, -180.0, 360.0))
    y = _spread_bits(_quant(lat, -90.0, 180.0))
    code60 = F.shiftleft(x, 1).bitwiseOR(y)
    return F.shiftrightunsigned(code60, 60 - 5 * precision)


def geohash(lon, lat, precision: int = 12) -> Column:
    """Base32 geohash string of length ``precision``."""
    code = geohash_bits(lon, lat, precision)
    alphabet = F.array(*[F.lit(ch) for ch in _B32])
    chars = []
    for i in range(precision):
        digit = F.shiftrightunsigned(code, 5 * (precision - 1 - i)).bitwiseAND(
            _lit64(31)
        )
        chars.append(F.element_at(alphabet, (digit + 1).cast("int")))
    return F.concat(*chars)
