"""Geocode enrichment: the reference's MapAPI / Poi surface
(map.go:17-29, 44-155) re-expressed Spark-first.

The reference geocodes with worker pools + a sync.Map cache keyed by
address (``AmapGeoCodeALL``, map.go:135-155) so every DISTINCT address
resolves exactly once, then rows look the result up.  The Spark shape
of that idiom: ``distinct(addr) → resolver UDF → broadcast join back``
— one resolver call per distinct address, fact rows never re-resolve.

The HTTP geocoders themselves (Amap/Bdmap REST, map.go:44-127) cannot
run in an offline engine; the resolver is pluggable (any pandas UDF
returning POI_DDL) and ``fake_geocoder`` provides a deterministic
md5-derived stand-in so the plumbing — schema, dedupe, broadcast —
is real and oracle-testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Poi (map.go:17-29) minus the Go-side Info map (schema-less catch-all)
POI_DDL = (
    "struct<status:int,message:string,lng:double,lat:double,addr:string,"
    "province:string,city:string,district:string,city_code:string,level:string>"
)

PROVINCES = ["北京市", "上海市", "广东省", "四川省"]
CITIES = ["北京市", "上海市", "广州市", "成都市"]
DISTRICTS = ["东城区", "黄浦区", "天河区", "锦江区"]


def fake_geocoder(addr: Column) -> Column:
    """Deterministic offline Poi resolver: md5-derived coordinates in
    the China bbox + region names from fixed tables.  Pure builtin
    expressions (conv/substr/md5 — codegen'd, SQL-transcribable)."""
    h = F.md5(addr)
    h1 = F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 7, 6), 16, 10).cast("bigint")
    h3 = F.conv(F.substring(h, 13, 2), 16, 10).cast("bigint")
    idx = (h3 % len(PROVINCES)).cast("int")
    pick = lambda vals: F.element_at(F.array(*[F.lit(v) for v in vals]), idx + 1)
    return F.struct(
        F.lit(1).alias("status"),
        F.lit("ok").alias("message"),
        F.round(F.lit(73.5) + h1 / F.lit(0xFFFFFF) * 61.0, 6).alias("lng"),
        F.round(F.lit(18.2) + h2 / F.lit(0xFFFFFF) * 35.3, 6).alias("lat"),
        addr.alias("addr"),
        pick(PROVINCES).alias("province"),
        pick(CITIES).alias("city"),
        pick(DISTRICTS).alias("district"),
        F.lpad(idx.cast("string"), 4, "0").alias("city_code"),
        F.lit("street").alias("level"),
    )


def geocode_distinct(
    df: DataFrame, addr_col: str, resolver=fake_geocoder,
) -> DataFrame:
    """Distinct-address Poi dim (the sync.Map cache, map.go:135-155):
    each address resolves once regardless of fact-row multiplicity."""
    addrs = df.select(F.col(addr_col).alias("_addr")).distinct()
    return addrs.select("_addr", resolver(F.col("_addr")).alias("poi"))


def live_resolver_udf(fetch, max_retries: int = 5, schema: str = POI_DDL):
    """The UNAVOIDABLE-live-call variant (SURVEY §3.3) of the resolver:
    an Arrow-batched pandas UDF that calls a user-supplied
    ``fetch(addr) -> dict`` (the HTTP geocoder, map.go:44-127) with the
    reference's retry-and-cache idiom (map.go:74-133, 135-155):

    * ≤ ``max_retries`` attempts per address (the reference's ``for i
      < 5`` loop, map.go:117-123), retrying on raised exceptions and
      on ``status != 1`` responses;
    * a per-worker in-process cache keyed by address — combined with
      ``geocode_distinct``'s upstream dedupe this is the sync.Map
      semantics: one resolution per distinct address per executor;
    * persistent failure → a ``status=0`` row carrying the last error
      in ``message`` (the caller filters or dead-letters), never an
      exception that kills the stage.

    Use through ``geocode_distinct(df, col, resolver=live_resolver_udf
    (my_fetch))``; concurrency is bounded by partition count × worker
    pool, the Spark-native replacement for the reference's
    ``GeoCodePOOL`` channel (map.go:129-133).  Tested with injected
    flaky fetchers (tests/test_spatial_joins.py) — no network in this
    environment."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cache: dict = {}
    fields = ["status", "message", "lng", "lat", "addr", "province",
              "city", "district", "city_code", "level"]

    def resolve_one(addr):
        if addr in cache:
            return cache[addr]
        last_err = "no attempt"
        row = None
        for _ in range(max_retries):
            try:
                poi = fetch(addr)
            except Exception as ex:  # noqa: BLE001 — any fetch error retries
                last_err = str(ex)
                continue
            if poi and poi.get("status") == 1:
                row = {f: poi.get(f) for f in fields}
                row["addr"] = addr
                break
            last_err = (poi or {}).get("message", "bad status")
        if row is None:
            row = dict.fromkeys(fields)
            row.update(status=0, message=last_err, addr=addr)
        cache[addr] = row
        return row

    def run(addrs: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([resolve_one(a) for a in addrs])

    run.__annotations__ = {"addrs": pd.Series, "return": pd.DataFrame}
    return pandas_udf(run, schema)


def geocode_enrich(
    df: DataFrame, addr_col: str, resolver=fake_geocoder,
    poi_dim: DataFrame | None = None,
) -> DataFrame:
    """Enrich fact rows with Poi columns via a BROADCAST join on the
    distinct-address dim — the fact side never shuffles.  Pass
    ``poi_dim`` to reuse a pre-resolved (e.g. persisted) dim."""
    dim = poi_dim if poi_dim is not None else geocode_distinct(df, addr_col, resolver)
    out = df.join(
        F.broadcast(dim), df[addr_col] == dim["_addr"], "left"
    ).drop("_addr")
    return out.select(
        "*",
        F.col("poi.lng").alias("geo_lng"),
        F.col("poi.lat").alias("geo_lat"),
        F.col("poi.province").alias("geo_province"),
        F.col("poi.city").alias("geo_city"),
        F.col("poi.district").alias("geo_district"),
    ).drop("poi")
