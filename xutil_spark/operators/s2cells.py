"""S2 cell encoding as a DataFrame operator.

Engine addition beyond the reference (whose cells are slippy-map tiles,
gis.go:238-283): a space-filling-curve cell id whose PREFIX property
makes it the right partition key at 10^12-image scale — `s2_cell %
buckets` (or a byte-prefix range) co-locates spatially adjacent images,
coarse parents come from a bit-mask (no re-encode, no shuffle), and
dense-city skew is salted by appending low bits of the leaf id to the
coarse key.  Encoding runs as one vectorized pandas UDF (Arrow batch
in, numpy out; no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from xutil_spark.kernels import s2


def s2_cell(lon: Column | str, lat: Column | str, level: int = 30) -> Column:
    """Column expression: S2 cell id (int64) at ``level``."""

    def enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(s2.cell_id_np(lo.to_numpy(), la.to_numpy(), level))

    enc.__annotations__ = {"lo": pd.Series, "la": pd.Series, "return": pd.Series}
    return pandas_udf(enc, "long")(F.col(lon) if isinstance(lon, str) else lon,
                                   F.col(lat) if isinstance(lat, str) else lat)


def s2_parent(cell: Column | str, level: int) -> Column:
    """Parent cell id at a coarser level — pure bit arithmetic, stays
    JVM-side (whole-stage codegen), no UDF: the id layout guarantees
    parent = (id & ~(2*lsb-1)) | lsb with lsb = 1 << 2*(30-level)."""
    c = F.col(cell) if isinstance(cell, str) else cell
    lsb = 1 << (2 * (30 - level))
    return (c.bitwiseAND(~(2 * lsb - 1))).bitwiseOR(F.lit(lsb))


def s2_token(cell: Column | str) -> Column:
    """Canonical hex token (16 digits, trailing zeros stripped) — JVM
    expressions only (hex + lower + regexp trim)."""
    c = F.col(cell) if isinstance(cell, str) else cell
    # Spark hex() strips leading zeros; the canonical token is the
    # 16-digit form with only TRAILING zeros stripped — re-pad first.
    tok = F.regexp_replace(F.lpad(F.lower(F.hex(c)), 16, "0"), "0+$", "")
    return F.when(tok == "", F.lit("X")).otherwise(tok)


def repartition_by_s2(
    df: DataFrame, cell_col: str = "s2_cell", level: int = 8,
    salt_bits: int = 0, num_partitions: int | None = None,
) -> DataFrame:
    """Skew-aware spatial repartition (north rule: "salted
    repartitioning on [cell] prefix").

    Shuffles on the coarse S2 parent of ``cell_col`` so spatially
    adjacent rows co-locate; with ``salt_bits`` > 0 a dense urban cell
    is additionally split across ``2**salt_bits`` sub-keys taken from
    the leaf id's FINEST Hilbert bits (the bits just above the lsb
    marker) — deterministic, no rand(), and each sub-key is itself a
    spatially coherent quarter-tree of the hot cell rather than a
    random shard.  Everything is JVM bit arithmetic; no UDF."""
    coarse = s2_parent(cell_col, level)
    cols = [coarse]
    if salt_bits > 0:
        c = F.col(cell_col)
        salt = F.shiftright(c, 1).bitwiseAND(F.lit((1 << salt_bits) - 1))
        cols.append(salt)
    return (df.repartition(num_partitions, *cols) if num_partitions
            else df.repartition(*cols))


def cell_encode_s2(
    df: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
    level: int = 30, out_col: str = "s2_cell",
) -> DataFrame:
    """Append an S2 cell-id column at ``level``.

    Scale shape: the UDF is the only Python crossing; parents/rollups
    from the returned leaf are bit-mask expressions (`s2_parent`), so a
    multi-resolution rollup encodes ONCE at the finest level and
    derives every coarser key JVM-side."""
    return df.withColumn(out_col, s2_cell(lon_col, lat_col, level))
