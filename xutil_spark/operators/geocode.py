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
