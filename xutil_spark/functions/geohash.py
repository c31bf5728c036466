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


# inverse of _SPREAD: gather the even bits of a 60-bit interleave back
# into one 30-bit integer (classic Morton compaction masks)
_COMPACT = (
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000FFFFFFFF),
)


def _compact_bits(c: Column) -> Column:
    x = c.bitwiseAND(_lit64(0x5555555555555555))
    for sh, m in _COMPACT:
        x = x.bitwiseOR(F.shiftrightunsigned(x, sh)).bitwiseAND(_lit64(m))
    return x


def geohash_decode(gh, precision: int) -> dict[str, Column]:
    """Decode a length-``precision`` geohash string back to its cell:
    center lon/lat plus the half-cell errors.  Pure JVM expressions —
    per-char ``locate`` into the alphabet literal rebuilds the 5p-bit
    code, Morton compaction masks de-interleave it.

    ``precision`` must be a literal (it fixes the bit widths); decode
    of mixed-length hashes should group by length first.  Returns a
    dict of named Columns: lon, lat, lon_err, lat_err.

    Composition caveat: decoding a geohash COMPUTED IN THE SAME
    PROJECTION (e.g. ``geohash_decode(geohash(lon, lat, p), p)``)
    inlines the whole encode tree into every per-char term of the
    decode — Catalyst's projection collapse turns that into a
    quadratic-size plan that can take minutes to optimize.  Encode and
    decode stages over real pipelines are separated by a shuffle or
    sink anyway; in a single-process chain, materialize between them
    (``df.localCheckpoint()`` or write/read)."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    gh = F.col(gh) if isinstance(gh, str) else gh
    alphabet = F.array(*[F.lit(ch) for ch in _B32])
    code = _lit64(0)
    for i in range(precision):
        digit = F.array_position(alphabet, F.substring(gh, i + 1, 1)) - 1
        code = F.shiftleft(code, 5).bitwiseOR(digit.cast("long"))
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    code60 = F.shiftleft(code, 60 - nbits)
    x = _compact_bits(F.shiftrightunsigned(code60, 1))
    y = _compact_bits(code60)
    # quantized cell index at full 30-bit resolution; the cell spans
    # 2^(30-bits) quanta, its center sits half a span in
    xq = F.shiftrightunsigned(x, 30 - lon_bits)
    yq = F.shiftrightunsigned(y, 30 - lat_bits)
    lon_span = 360.0 / float(1 << lon_bits)
    lat_span = 180.0 / float(1 << lat_bits)
    return {
        "lon": (xq.cast("double") + 0.5) * F.lit(lon_span) - 180.0,
        "lat": (yq.cast("double") + 0.5) * F.lit(lat_span) - 90.0,
        "lon_err": F.lit(lon_span / 2.0),
        "lat_err": F.lit(lat_span / 2.0),
    }
