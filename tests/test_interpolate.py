"""idw_surface (operators/interpolate.py): fixed-point Shepard IDW
checked against an independent pure-Python replay (scalar tile math,
scalar haversine, integer weights)."""

import math

from xutil_spark.operators.interpolate import idw_surface

_Z = 6
_N = 2 ** _Z
_SCALE = 10 ** 12


def _tile(lon, lat):
    x = int(math.floor((lon + 180.0) / 360.0 * _N))
    la = lat * math.pi / 180.0
    y = int(math.floor(
        (1.0 - math.log(math.tan(la) + 1.0 / math.cos(la)) / math.pi)
        / 2.0 * _N))
    return x, y


def _center(tx, ty):
    clon = (tx + 0.5) / _N * 360.0 - 180.0
    nv = math.pi - 2.0 * math.pi * (ty + 0.5) / _N
    clat = 180.0 / math.pi * math.atan(0.5 * (math.exp(nv) - math.exp(-nv)))
    return clon, clat


def _hav(lon1, lat1, lon2, lat2):
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    a = (math.sin(dlat / 2) ** 2
         + math.sin(dlon / 2) ** 2 * math.cos(lat1 * rad)
         * math.cos(lat2 * rad))
    return 2.0 * 6371000.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))


def _replay(obs, radius=1, power=2):
    acc = {}
    for lon, lat, v in obs:
        v100 = round(v * 100.0)
        x, y = _tile(lon, lat)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                ty = y + dy
                if not (0 <= ty < _N):
                    continue
                tx = (x + dx) % _N
                clon, clat = _center(tx, ty)
                d = _hav(lon, lat, clon, clat)
                dp = d if power == 1 else d * d
                w = math.floor(_SCALE / (1.0 + dp))
                sw, swv, n = acc.get((tx, ty), (0, 0, 0))
                acc[(tx, ty)] = (sw + w, swv + w * v100, n + 1)
    out = {}
    for (tx, ty), (sw, swv, n) in acc.items():
        cell = _Z * (1 << 58) + tx * (1 << 29) + ty
        est = round(swv / sw / 100.0, 6) if sw > 0 else None
        out[cell] = (n, est)
    return out


def _df(spark, obs):
    return spark.createDataFrame(obs, "lon double, lat double, value double")


def test_idw_matches_scalar_replay(spark):
    obs = [(10.0, 20.0, 5.5), (10.2, 20.1, 7.25), (10.4, 19.9, 1.0),
           (-100.0, -30.0, 42.0), (11.5, 21.5, 3.3)]
    got = {r.cell: (r.n_obs, r.est)
           for r in idw_surface(_df(spark, obs), _Z).collect()}
    assert got == _replay(obs)


def test_idw_nearest_dominates(spark):
    # an obs sitting on one cell's center should pull that cell's
    # estimate to (almost exactly) its own value
    clon, clat = _center(*_tile(30.0, 30.0))
    obs = [(clon, clat, 9.0), (clon + 0.9, clat + 0.9, 1.0)]
    got = {r.cell: r.est
           for r in idw_surface(_df(spark, obs), _Z).collect()}
    x, y = _tile(clon, clat)
    cell = _Z * (1 << 58) + x * (1 << 29) + y
    assert abs(got[cell] - 9.0) < 0.05


def test_idw_power_one_and_far_null(spark):
    obs = [(50.0, 50.0, 2.0), (50.1, 50.1, 4.0)]
    got = {r.cell: (r.n_obs, r.est)
           for r in idw_surface(_df(spark, obs), _Z, power=1).collect()}
    assert got == _replay(obs, power=1)
    # a huge-power surface where every weight floors to 0 → est NULL
    tiny = {r.cell: r.est
            for r in idw_surface(_df(spark, obs), _Z, scale=1).collect()}
    assert all(v is None for v in tiny.values())
