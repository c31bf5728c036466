"""Arrow-batched pandas UDFs wrapping the numpy kernels + SQL registration.

Every UDF is Series→Series/DataFrame over whole Arrow batches — zero
per-row Python (north-rule requirement).  UDF objects are built lazily
(``udfs()``) because ``pandas_udf`` type parsing needs a live
SparkContext; ``register_all(spark)`` registers them for ``spark.sql``.

Hot-path note: tile/cell/haversine also exist as *native* column
expressions in ``functions.native`` (JVM codegen, no Python worker) —
pipelines prefer those; the UDF forms exist for SQL users and for the
GCJ/BD polynomial kernels that have no builtin equivalent.
"""

from __future__ import annotations

import functools
import json

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from xutil_spark.kernels import baidu as K_baidu
from xutil_spark.kernels import coords as K_coords
from xutil_spark.kernels import distance as K_dist
from xutil_spark.kernels import geometry as K_geom
from xutil_spark.kernels import rounding as K_round
from xutil_spark.kernels import tiles as K_tiles

_LONLAT = "struct<lon:double,lat:double>"


def _pair(lon, lat) -> pd.DataFrame:
    return pd.DataFrame({"lon": np.asarray(lon, dtype=np.float64),
                         "lat": np.asarray(lat, dtype=np.float64)})


def _coord_pair_fn(kernel):
    def fn(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        return _pair(*kernel(lon.to_numpy(np.float64), lat.to_numpy(np.float64)))
    return fn


def _round_n(x: pd.Series, n: pd.Series) -> pd.Series:
    xv = x.to_numpy(np.float64)
    nv = n.to_numpy(np.int64)
    out = np.empty_like(xv)
    for prec in np.unique(nv):
        m = nv == prec
        out[m] = K_round.round_half_away(xv[m], int(prec))
    return pd.Series(out)


def _dist_fn(kernel):
    def fn(lon1, lat1, lon2, lat2) -> pd.Series:
        return pd.Series(kernel(
            lon1.to_numpy(np.float64), lat1.to_numpy(np.float64),
            lon2.to_numpy(np.float64), lat2.to_numpy(np.float64)))
    return fn


def _pair4_fn(kernel):
    def fn(a, b, c, d) -> pd.DataFrame:
        return _pair(*kernel(
            a.to_numpy(np.float64), b.to_numpy(np.float64),
            c.to_numpy(np.float64), d.to_numpy(np.float64)))
    return fn


def _cell_encode(lon: pd.Series, lat: pd.Series, z: pd.Series) -> pd.Series:
    lonv = lon.to_numpy(np.float64)
    latv = lat.to_numpy(np.float64)
    zv = z.to_numpy(np.int64)
    out = np.empty(len(lonv), dtype=np.int64)
    for zoom in np.unique(zv):
        m = zv == zoom
        out[m] = K_tiles.cell_encode(lonv[m], latv[m], int(zoom))
    return pd.Series(out)


def _cell_decode(cell: pd.Series) -> pd.DataFrame:
    x, y, z = K_tiles.cell_decode(cell.to_numpy(np.int64))
    return pd.DataFrame({"x": x, "y": y, "z": z})


def _cell_parent(cell: pd.Series, parent_z: pd.Series) -> pd.Series:
    cv = cell.to_numpy(np.int64)
    pz = parent_z.to_numpy(np.int64)
    out = np.empty(len(cv), dtype=np.int64)
    for zoom in np.unique(pz):
        m = pz == zoom
        out[m] = K_tiles.cell_parent(cv[m], int(zoom))
    return pd.Series(out)


def _cell_neighbors(cell: pd.Series, ring: pd.Series) -> pd.Series:
    cv = cell.to_numpy(np.int64)
    rv = ring.to_numpy(np.int64)
    out = [None] * len(cv)
    for r in np.unique(rv):
        m = np.nonzero(rv == r)[0]
        mat = K_tiles.cell_neighbors(cv[m], ring=int(r))
        for j, idx in enumerate(m):
            out[idx] = mat[j].tolist()
    return pd.Series(out)


def _tile_pixel(lon, lat, z, deg) -> pd.DataFrame:
    lonv = lon.to_numpy(np.float64)
    latv = lat.to_numpy(np.float64)
    zv = z.to_numpy(np.int64)
    dv = deg.to_numpy(np.int64)
    tx = np.empty(len(lonv), np.int64)
    ty = np.empty(len(lonv), np.int64)
    px = np.empty(len(lonv), np.int64)
    py = np.empty(len(lonv), np.int64)
    for zoom, d in {(int(a), int(b)) for a, b in zip(zv, dv)}:
        m = (zv == zoom) & (dv == d)
        tx[m], ty[m], px[m], py[m] = K_tiles.tile_image(lonv[m], latv[m], zoom, d)
    return pd.DataFrame({"tx": tx, "ty": ty, "px": px, "py": py})


def _tile2wgs(x, y, z) -> pd.DataFrame:
    xv = x.to_numpy(np.int64)
    yv = y.to_numpy(np.int64)
    zv = z.to_numpy(np.int64)
    lat = np.empty(len(xv), np.float64)
    lng = np.empty(len(xv), np.float64)
    for zoom in np.unique(zv):
        m = zv == zoom
        lat[m], lng[m] = K_tiles.tile2wgs(xv[m], yv[m], int(zoom))
    return pd.DataFrame({"lat": lat, "lng": lng})


def _bd09_to_mercator(lng, lat) -> pd.DataFrame:
    x, y = K_baidu.bd09_to_mercator(lng.to_numpy(np.float64), lat.to_numpy(np.float64))
    return pd.DataFrame({"x": x, "y": y})


def _mercator_to_bd09(x, y) -> pd.DataFrame:
    lon, lat = K_baidu.mercator_to_bd09(x.to_numpy(np.float64), y.to_numpy(np.float64))
    return _pair(lon, lat)


def _bd09_tile(lng, lat, zoom) -> pd.DataFrame:
    lngv = lng.to_numpy(np.float64)
    latv = lat.to_numpy(np.float64)
    zv = zoom.to_numpy(np.int64)
    tx = np.empty(len(lngv), np.int64)
    ty = np.empty(len(lngv), np.int64)
    for z in np.unique(zv):
        m = zv == z
        tx[m], ty[m] = K_baidu.bd09_to_tile(lngv[m], latv[m], int(z))
    return pd.DataFrame({"x": tx, "y": ty})


def _bmap_mocator(mocator: pd.Series) -> pd.Series:
    return mocator.map(lambda s: K_baidu.bmap_mocator(s) if s is not None else None)


def _wkt_to_geojson(wkt: pd.Series) -> pd.Series:
    return wkt.map(lambda s: K_geom.to_geojson(K_geom.from_wkt(s)) if s else None)


def _geojson_to_wkt(gj: pd.Series) -> pd.Series:
    return gj.map(lambda s: K_geom.to_wkt(K_geom.from_geojson(s)) if s else None)


def _wkt_box(wkt: pd.Series) -> pd.Series:
    return wkt.map(lambda s: K_geom.geo_box(K_geom.from_wkt(s)) if s else None)


def _wkt_area_m2(wkt: pd.Series) -> pd.Series:
    return wkt.map(
        lambda s: K_geom.geo_area_m2(K_geom.from_wkt(s)) if s else None
    )


def _wkt_covering_cells(wkt: pd.Series, zoom: pd.Series) -> pd.Series:
    zv = zoom.to_numpy(np.int64)
    return pd.Series([
        K_geom.covering_cells(K_geom.from_wkt(s), int(z)) if s else None
        for s, z in zip(wkt, zv)
    ])


_WKT_OPS = {
    "wgs2gcj": K_coords.wgs2gcj, "gcj2wgs": K_coords.gcj2wgs,
    "gcj2bd": K_coords.gcj2bd, "bd2gcj": K_coords.bd2gcj,
    "wgs2bd": K_coords.wgs2bd, "bd2wgs": K_coords.bd2wgs,
    "flip": lambda x, y: (y, x),
    "round6": K_round.point_round6,
    "round7": K_round.point_round7,
    "round8": K_round.point_round8,
}


def _wkt_transform(wkt: pd.Series, op: pd.Series) -> pd.Series:
    def run(s, o):
        if not s:
            return None
        f = _WKT_OPS[o]
        g = K_geom.point_func(
            K_geom.from_wkt(s), lambda x, y: tuple(map(float, f(x, y)))
        )
        return K_geom.to_wkt(g)

    return pd.Series([run(s, o) for s, o in zip(wkt, op)])


def _ring_is_clockwise(coords_json: pd.Series) -> pd.Series:
    return coords_json.map(
        lambda s: K_geom.is_clockwise(json.loads(s)) if s else None
    )


def _hilbert_xy2d(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
    from xutil_spark.kernels import hilbert as K_hilbert

    xv = x.to_numpy(np.int64)
    yv = y.to_numpy(np.int64)
    zv = z.to_numpy(np.int64)
    out = np.empty(len(xv), dtype=np.int64)
    for zoom in np.unique(zv):
        m = zv == zoom
        out[m] = K_hilbert.xy2d(xv[m], yv[m], int(zoom))
    return pd.Series(out)


def _hilbert_d2xy(d: pd.Series, z: pd.Series) -> pd.DataFrame:
    from xutil_spark.kernels import hilbert as K_hilbert

    dv = d.to_numpy(np.int64)
    zv = z.to_numpy(np.int64)
    xo = np.empty(len(dv), dtype=np.int64)
    yo = np.empty(len(dv), dtype=np.int64)
    for zoom in np.unique(zv):
        m = zv == zoom
        xo[m], yo[m] = K_hilbert.d2xy(dv[m], int(zoom))
    return pd.DataFrame({"x": xo, "y": yo})


# name → (python function, return DDL type)
_SPECS = {
    "wgs2gcj": (_coord_pair_fn(K_coords.wgs2gcj), _LONLAT),
    "gcj2wgs": (_coord_pair_fn(K_coords.gcj2wgs), _LONLAT),
    "gcj2bd": (_coord_pair_fn(K_coords.gcj2bd), _LONLAT),
    "bd2gcj": (_coord_pair_fn(K_coords.bd2gcj), _LONLAT),
    "wgs2bd": (_coord_pair_fn(K_coords.wgs2bd), _LONLAT),
    "bd2wgs": (_coord_pair_fn(K_coords.bd2wgs), _LONLAT),
    "round_n": (_round_n, "double"),
    "dist_hav_m": (_dist_fn(K_dist.point_dist_haversine), "double"),
    "dist_cos_m": (_dist_fn(K_dist.point_distance), "double"),
    "azimuth_deg": (_dist_fn(K_dist.azimuth), "double"),
    "point_mid": (_pair4_fn(K_dist.point_mid), _LONLAT),
    "point_at": (_pair4_fn(K_dist.point_at), _LONLAT),
    "cell_encode": (_cell_encode, "long"),
    "cell_decode": (_cell_decode, "struct<x:long,y:long,z:long>"),
    "cell_parent": (_cell_parent, "long"),
    "cell_neighbors": (_cell_neighbors, "array<long>"),
    "tile_pixel": (_tile_pixel, "struct<tx:long,ty:long,px:long,py:long>"),
    "tile2wgs": (_tile2wgs, "struct<lat:double,lng:double>"),
    "bd09_to_mercator": (_bd09_to_mercator, "struct<x:double,y:double>"),
    "mercator_to_bd09": (_mercator_to_bd09, _LONLAT),
    "bd09_tile": (_bd09_tile, "struct<x:long,y:long>"),
    "bmap_mocator": (_bmap_mocator, "string"),
    "wkt_to_geojson": (_wkt_to_geojson, "string"),
    "geojson_to_wkt": (_geojson_to_wkt, "string"),
    "wkt_box": (_wkt_box, "array<double>"),
    "wkt_area_m2": (_wkt_area_m2, "double"),
    "wkt_covering_cells": (_wkt_covering_cells, "array<long>"),
    "wkt_transform": (_wkt_transform, "string"),
    "ring_is_clockwise": (_ring_is_clockwise, "boolean"),
    "hilbert_xy2d": (_hilbert_xy2d, "long"),
    "hilbert_d2xy": (_hilbert_d2xy, "struct<x:long,y:long>"),
}


def _annotate(fn, ddl: str):
    """pandas_udf requires type hints on every parameter; factory-built
    functions get them here (all inputs are pd.Series; the return is a
    DataFrame for struct DDLs, a Series otherwise)."""
    import inspect

    params = list(inspect.signature(fn).parameters)
    fn.__annotations__ = {p: pd.Series for p in params}
    fn.__annotations__["return"] = (
        pd.DataFrame if ddl.strip().startswith("struct") else pd.Series
    )
    return fn


@functools.lru_cache(maxsize=1)
def udfs() -> dict:
    """Build (once) the pandas_udf objects — requires a live SparkContext."""
    from pyspark.sql.functions import pandas_udf

    return {
        name: pandas_udf(_annotate(fn, ddl), ddl)
        for name, (fn, ddl) in _SPECS.items()
    }


def register_all(spark: SparkSession) -> None:
    """Register every UDF for spark.sql use (idempotent)."""
    for name, udf in udfs().items():
        spark.udf.register(name, udf)


def __getattr__(name: str):
    """Module attribute access: ``geo_udfs.wgs2gcj`` → the built UDF."""
    if name in _SPECS:
        return udfs()[name]
    raise AttributeError(name)
