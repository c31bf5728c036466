"""Relational parity operators (SURVEY §2.6-2.8): the reference's string
slice / math / time / id-card utilities re-expressed as DataFrame and
column compositions — built-in functions only (JVM codegen), no UDFs
except the id-card checksum (vectorized numpy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ------------------------------------------------------------- set operators
# The reference's "relations" are string slices (strings.go:47-124).


def strings_minus(left: DataFrame, right: DataFrame, on: str) -> DataFrame:
    """s1 − s2 keeping s1 duplicates (strings.go:47-60) ≙ left_anti join."""
    return left.join(right.select(on).distinct(), on=on, how="left_anti")


def strings_intersect(left: DataFrame, right: DataFrame, on: str) -> DataFrame:
    """s1 ∩ s2 keeping s1 duplicates/order (strings.go:63-76) ≙ left_semi."""
    return left.join(right.select(on).distinct(), on=on, how="left_semi")


def strings_union(left: DataFrame, right: DataFrame, on: str) -> DataFrame:
    """s1 ∪ s2 deduped (strings.go:79-95) ≙ UNION + distinct."""
    return left.select(on).union(right.select(on)).distinct()


def strings_uniq(df: DataFrame, on: str, order_col: str | None = None) -> DataFrame:
    """Stable dedup, first occurrence wins (strings.go:114-124).

    Spark has no implicit row order; callers pass ``order_col`` (or we
    require one) to define "first"."""
    if order_col is None:
        return df.dropDuplicates([on])
    from pyspark.sql.window import Window

    w = Window.partitionBy(on).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ----------------------------------------------------------- scalar parsers
# "skip" vs "zero-fill" parse semantics (strings.go:143-178, math.go:54-65).


def to_int_zero_fill(col) -> Column:
    """StringsToInt: 0 on parse failure (strings.go:143-153)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.coalesce(c.try_cast("long"), F.lit(0).cast("long"))


def to_double_zero_fill(col) -> Column:
    """StringsToFloat64: 0.0 on failure (strings.go:155-166)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.coalesce(c.try_cast("double"), F.lit(0.0))


def split_doubles_skip(col, sep: str) -> Column:
    """StringToFloat64 (math.go:54-65): split, parse, DROP failures —
    array<double> with nulls filtered, pure higher-order functions."""
    c = col if isinstance(col, Column) else F.col(col)
    parsed = F.transform(F.split(c, sep), lambda x: x.try_cast("double"))
    return F.filter(parsed, lambda x: x.isNotNull())


def col_float64(col, sep: str, oper: str) -> Column:
    """ColFloat64 (math.go:18-37): split-string aggregate.  STDDEV is the
    POPULATION std-dev (math.go:50-52 divides by n).  Returns null on
    empty input where the reference panics (documented divergence;
    math.go:76,94,114)."""
    arr = split_doubles_skip(col, sep)
    n = F.size(arr)
    s = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    oper = oper.upper()
    if oper == "SUM":
        out = s
    elif oper == "MAX":
        out = F.array_max(arr)
    elif oper == "MIN":
        out = F.array_min(arr)
    elif oper in ("AVG", "MEAN"):
        out = s / n
    elif oper == "STDDEV":
        mean = s / n
        dev = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean))
        out = F.sqrt(dev / n)
    else:
        raise ValueError(f"unknown oper {oper}")
    return F.when(n > 0, out)


# ------------------------------------------------------------------ time ops


def time_trunc(col, unit: str) -> Column:
    """TimeTrunc (time.go:9-28).  'week' is SUNDAY-start (time.go:23-24)
    — Spark's date_trunc week is Monday-ISO, so it's rebuilt explicitly."""
    c = col if isinstance(col, Column) else F.col(col)
    unit = unit.lower()
    if unit == "week":
        d = F.to_date(c)
        return F.date_sub(d, F.dayofweek(d) - F.lit(1)).cast("timestamp")
    if unit in ("month", "day", "hour", "minute", "second"):
        return F.date_trunc(unit, c)
    return c


def time_rule(col, unit: str, total: int) -> Column:
    """TimeRule (time.go:30-58): ``total`` points stepping ``unit`` from
    the truncated time; negative = backwards.  Array column out."""
    start = time_trunc(col, unit)
    unit = unit.lower()
    n = abs(total)
    if n == 0:
        return F.array().cast("array<timestamp>")
    sign = 1 if total > 0 else -1
    return _time_rule_expr(start, unit, n, sign)


def _time_rule_expr(start: Column, unit: str, n: int, sign: int) -> Column:
    if unit == "month":
        stop = start + F.expr(f"interval {sign * (n - 1)} month")
        step = F.expr(f"interval {sign} month")
    elif unit in ("day", "week"):
        days = {"day": 1, "week": 7}[unit]
        stop = start + F.expr(f"interval {sign * (n - 1) * days} day")
        step = F.expr(f"interval {sign * days} day")
    else:
        secs = {"hour": 3600, "minute": 60, "second": 1}[unit]
        stop = start + F.expr(f"interval {sign * (n - 1) * secs} second")
        step = F.expr(f"interval {sign * secs} second")
    return F.sequence(start, stop, step)


def time_parse(col) -> Column:
    """TimeParse (time.go:84-125): multi-format ladder chosen by shape.
    coalesce(try_to_timestamp ladder) reproduces the length/dash/T
    dispatch without branches."""
    c = col if isinstance(col, Column) else F.col(col)
    fmts = [
        "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm",
        "yyyy-MM-dd'T'HH:mm", "yyyy-MM-dd HH", "yyyy-MM-dd'T'HH", "yyyy-MM-dd",
        "yyyyMMddHHmmss", "yyyyMMdd.HHmmss", "yyyyMMdd.HHmm",
        "yyyyMMddHHmm", "yyyyMMddHH", "yyyyMMdd",
    ]
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in fmts])


def day_last_range(as_of, f: str) -> Column:
    """DayLastRange (time.go:61-82): yyyymmdd list for the previous
    Sunday-started week / previous month / yesterday, half-open.
    The reference uses wall-clock now; ours takes ``as_of`` (a date
    column) for determinism."""
    d = as_of if isinstance(as_of, Column) else F.col(as_of)
    d = F.to_date(d)
    if f == "week":
        e = F.date_sub(d, F.dayofweek(d) - 1)  # Go Weekday(): Sunday=0
        b = F.date_sub(e, 7)
    elif f == "month":
        e = F.trunc(d, "month")
        b = F.add_months(e, -1)
    elif f == "day":
        e = d
        b = F.date_sub(d, 1)
    else:
        raise ValueError(f"unknown range {f!r}")
    seq = F.sequence(b, F.date_sub(e, 1), F.expr("interval 1 day"))
    return F.transform(seq, lambda x: F.date_format(x, "yyyyMMdd"))


def time_split(begin, end, step_seconds: int) -> Column:
    """TimeSplit (time.go:134-139): half-open [b, e) stepping d.
    Spark's sequence is closed, so the endpoint is trimmed."""
    b = begin if isinstance(begin, Column) else F.col(begin)
    e = end if isinstance(end, Column) else F.col(end)
    seq = F.sequence(b, e, F.expr(f"interval {step_seconds} second"))
    return F.filter(seq, lambda t: t < e)


def time_extend(t, s: int, step_seconds: int) -> Column:
    """TimeExtend (time.go:141-148): truncate ``t`` to the step, then
    the half-open run of ``|s|`` steps — forward for s > 0, backward
    (ending at the truncated instant, exclusive) for s < 0."""
    c = t if isinstance(t, Column) else F.col(t)
    trunc = F.timestamp_seconds(
        (F.unix_timestamp(c) / step_seconds).cast("long") * step_seconds
    )
    delta = F.expr(f"interval {s * step_seconds} second")
    b = trunc if s >= 0 else trunc + delta
    e = trunc + delta if s >= 0 else trunc
    return time_split(b, e, step_seconds)


def as_of_join(
    left: DataFrame, right: DataFrame, on: str, ts: str = "ts",
) -> DataFrame:
    """As-of join: each left row takes the payload of the LATEST right
    row with ``r.ts <= l.ts`` for the same key (pandas ``merge_asof`` /
    DuckDB ``ASOF JOIN`` backward semantics; no match → nulls).

    Spark has no native as-of join; the classic scalable plan is used:
    tag and UNION both sides, ONE window pass per key ordered by
    (ts, side) carrying the last non-null right payload forward, keep
    the left rows.  Exactly one shuffle on the key — no range-condition
    join (which Spark would execute as a broadcast-nested-loop) and no
    candidate explosion; skewed keys split fine under AQE because the
    window is per-key sequential anyway.

    Right rows sort BEFORE left rows at equal ts, so a same-instant
    update is visible (the inclusive <= of ASOF).  Right payload
    columns must not collide with left column names.

    The payload is carried as ONE struct per right row (null struct on
    left rows): ``last(ignorenulls)`` then selects the whole latest
    matching row, so a right row whose payload VALUE is NULL surfaces
    that NULL — matching DuckDB ASOF / pandas ``merge_asof`` — instead
    of skipping back to an older non-null value."""
    rcols = [c for c in right.columns if c not in (on, ts)]
    lcols = list(left.columns)
    if not rcols:  # no payload columns: nothing to carry
        return left
    rtypes = dict(right.dtypes)
    struct_t = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in rcols) + ">"
    l2 = left.select(
        *lcols,
        F.lit(None).cast(struct_t).alias("_r"),
        F.lit(1).alias("_side"),
    )
    r2 = right.select(
        F.col(on),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c not in (on, ts)],
        F.col(ts),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
        F.lit(0).alias("_side"),
    ).select(*lcols, "_r", "_side")
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_r"),
        "_side",
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_r.{c}").alias(c) for c in rcols]
    )


def strings_index(col, value) -> Column:
    """StringsIndex / IntsIndex (strings.go:9-26): 0-based index of the
    first occurrence of ``value`` in the array column, -1 if absent
    (``array_position`` is 1-based with 0 = missing)."""
    c = col if isinstance(col, Column) else F.col(col)
    v = value if isinstance(value, Column) else F.lit(value)
    return (F.array_position(c, v) - 1).cast("int")


# ------------------------------------------------------------------- base-n

_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    ":;<=>?@[]^_{|}"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)  # math.go:122 tenToAny — indices 0..75


def decimal_to_any(col, base: int) -> Column:
    """DecimalToAny (math.go:125-140) for 2 ≤ base ≤ 76.

    bases ≤ 36 use the builtin ``conv`` (lowercased to match the
    reference alphabet); larger bases use a vectorized numpy UDF."""
    c = col if isinstance(col, Column) else F.col(col)
    if base <= 36:
        return F.lower(F.conv(c.cast("string"), 10, base))
    return _base_n_udf(base)(c)


def _base_n_udf(base: int):
    from pyspark.sql.functions import pandas_udf

    def enc(v: pd.Series) -> pd.Series:
        out = []
        for num in v.to_numpy(np.int64):
            num = int(num)
            if num == 0:
                out.append("")  # reference returns "" for 0 (loop never runs)
                continue
            s = ""
            while num != 0:
                s = _ALPHABET[num % base] + s
                num //= base
            out.append(s)
        return pd.Series(out)

    enc.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(enc, "string")


def any_to_decimal(col, base: int) -> Column:
    """AnyToDecimal (math.go:154-168)."""
    c = col if isinstance(col, Column) else F.col(col)
    if base <= 36:
        return F.conv(F.upper(c), base, 10).cast("long")
    from pyspark.sql.functions import pandas_udf

    def dec(v: pd.Series) -> pd.Series:
        idx = {ch: i for i, ch in enumerate(_ALPHABET)}
        out = []
        for s in v:
            acc = 0
            for ch in s or "":
                if ch not in idx:
                    break
                acc = acc * base + idx[ch]
            out.append(acc)
        return pd.Series(out, dtype=np.int64)

    dec.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(dec, "long")(c)


# ----------------------------------------------------------------- id cards

_WI = np.array([7, 9, 10, 5, 8, 4, 2, 1, 6, 3, 7, 9, 10, 5, 8, 4, 2])
_Y = np.array(list("10X98765432"))
ID_PATTERN = r"^[1-9]\d{5}[1-9]\d{3}((0\d)|(1[0-2]))(([0|1|2]\d)|3[0-1])\d{3}([\d|x|X]{1})$"  # idcard.go:86


def _id_check_digit(ids: pd.Series) -> pd.Series:
    """IDsumY (idcard.go:56-67): weighted mod-11 over the first 17 digits
    — vectorized as a digit-matrix dot product."""
    mat = np.array([[int(ch) for ch in s[:17]] for s in ids], dtype=np.int64)
    res = mat @ _WI % 11
    return pd.Series(_Y[res])


def id_checksum_udf():
    from pyspark.sql.functions import pandas_udf

    def f(ids: pd.Series) -> pd.Series:
        return _id_check_digit(ids)

    f.__annotations__ = {"ids": pd.Series, "return": pd.Series}
    return pandas_udf(f, "string")


def id_15_to_18(col) -> Column:
    """ID15to18 (idcard.go:70-73): insert '19', append check digit."""
    c = col if isinstance(col, Column) else F.col(col)
    c17 = F.concat(F.substring(c, 1, 6), F.lit("19"), F.substring(c, 7, 9))
    return F.concat(c17, id_checksum_udf()(c17))


def id_is_valid(col) -> Column:
    """IDisValid (idcard.go:76-82)."""
    c = col if isinstance(col, Column) else F.col(col)
    up = F.upper(c)
    return id_checksum_udf()(up) == F.substring(up, 18, 1)


def id_is_pattern(col) -> Column:
    """IDisPattern (idcard.go:85-89) — same regex."""
    c = col if isinstance(col, Column) else F.col(col)
    return c.rlike(ID_PATTERN)


def load_region_dim(spark: SparkSession, path: str) -> DataFrame:
    """Load the admin-region code table (code → name) as a broadcastable
    dim.  The canonical source is the PRC statistical-bureau table; the
    reference ships it as ChinaAddr.json (idcard.go:40-53)."""
    import json

    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    pdf = pd.DataFrame(
        {"code": list(data.keys()), "name": list(data.values())}
    )
    return spark.createDataFrame(pdf)


def id_card_pipeline(
    ids: DataFrame, region_dim: DataFrame, id_col: str = "id",
    as_of: str = "2026-01-01", check_col: str | None = None,
) -> DataFrame:
    """NewIDCard (idcard.go:92-134) as a column pipeline + 3 broadcast
    joins on the region dim (6/4/2-digit prefixes, idcard.go:110-116).
    Age uses a fixed ``as_of`` date for determinism (the reference uses
    wall-clock now — non-reproducible; divergence documented).

    ``check_col``: a column already holding the IDsumY check digit of
    the id's first 17 characters — validation then compares against it
    instead of re-running the checksum pandas UDF (halves the Python
    crossings when the producer computed it anyway)."""
    c = F.col(id_col)
    ok_check = (
        F.col(check_col) == F.substring(F.upper(c), 18, 1)
        if check_col else id_is_valid(c)
    )
    df = (
        ids.withColumn(
            id_col, F.when(F.length(c) == 15, id_15_to_18(c)).otherwise(c)
        )
        .withColumn("_ok_pattern", id_is_pattern(c))
        .withColumn("_ok_check", F.when(F.col("_ok_pattern"), ok_check))
        .withColumn("birthdate", F.try_to_date(F.substring(c, 7, 8), "yyyyMMdd"))
        .withColumn(
            "gender",
            F.when(F.substring(c, 17, 1).cast("int") % 2 == 0, "F").otherwise("M"),
        )
        .withColumn(
            "age",
            (
                F.year(F.lit(as_of).cast("date")) - F.year("birthdate")
                - F.when(
                    (F.month("birthdate") > F.month(F.lit(as_of).cast("date")))
                    | (
                        (F.month("birthdate") == F.month(F.lit(as_of).cast("date")))
                        & (F.dayofmonth("birthdate") > F.dayofmonth(F.lit(as_of).cast("date")))
                    ),
                    1,
                ).otherwise(0)
            ).cast("int"),
        )
        .withColumn("_c6", F.substring(c, 1, 6))
        .withColumn("_c4", F.concat(F.substring(c, 1, 4), F.lit("00")))
        .withColumn("_c2", F.concat(F.substring(c, 1, 2), F.lit("0000")))
    )
    dim = F.broadcast(region_dim)
    return (
        df.join(dim.withColumnRenamed("name", "district"),
                df["_c6"] == dim["code"], "left").drop("code")
        .join(dim.withColumnRenamed("name", "city"),
              F.col("_c4") == dim["code"], "left").drop("code")
        .join(dim.withColumnRenamed("name", "province"),
              F.col("_c2") == dim["code"], "left").drop("code")
        .drop("_c6", "_c4", "_c2")
    )


# --------------------------------------------------------------- percentiles


def group_percentiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ps: list[float],
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Grouped percentiles of ``value_col`` at each probability in
    ``ps`` — the distribution-summary stage of a pricing/quality audit
    (an engine addition; the reference stops at min/max/avg/stddev,
    math.go:67-119).

    ``exact=True`` uses Spark's exact ``percentile`` aggregate: linear
    interpolation at rank ``(n-1)·p`` between the two nearest order
    statistics (lowerValue·(ceil−pos) + higherValue·(pos−floor)).
    Exact percentiles hold a per-group map of distinct values on one
    reducer — fine for dim-cardinality groups (here: 6 returnflag ×
    linestatus cells), NOT for 10^12-row single-group sweeps.  For the
    100-TB path pass ``exact=False``: ``approx_percentile`` (the
    Greenwald-Khanna sketch) folds map-side into bounded state and
    merges, one narrow shuffle at group cardinality, error ≤ 1/accuracy.

    Output: keys + n_items + one ``p<int(100p)>`` double per p, rounded
    to 4 dp.
    """
    v = F.col(value_col).cast("double")
    parr = F.array(*[F.lit(float(p)) for p in ps])
    agg = (
        F.percentile(v, parr) if exact
        else F.percentile_approx(v, parr, F.lit(accuracy))
    )
    out = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_items"), agg.alias("_pct"))
    )
    cols = [F.col(k) for k in keys] + [F.col("n_items")] + [
        F.round(F.element_at("_pct", i + 1), 4).alias(f"p{int(round(p * 100))}")
        for i, p in enumerate(ps)
    ]
    return out.select(*cols)
