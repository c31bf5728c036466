"""Baidu BD-09 ↔ Baidu-Mercator projection + Baidu tile pyramid.

Numpy transcription of gis.go:285-355 with quirks preserved:

* longitude wrapped into Go's loop semantics — ``(-180, 180]`` for inputs
  above range, ``[-180, 180)`` for inputs below (gis.go:310-318);
* latitude clamped to [-74, 74] (gis.go:319-321, 325);
* band selection: first ``i`` with lat >= _LLBAND[i]; for negative lat
  the reverse scan (gis.go:332-339) always lands on band 5 because
  ``lat <= -0`` is true on its first iteration — replicated exactly;
* ``MercatorToBd09`` takes ``abs(x)`` *before* calling ``yr``
  (gis.go:296-305), so the output longitude sign is never restored —
  a reference quirk we replicate (and golden-pin);
* the 6-band polynomial ``yr`` evaluates on |x|, |y|/cE[9] and restores
  signs from its *inputs* (gis.go:343-355).

All functions are array-in/array-out numpy, usable inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# gis.go:53-68 — polynomial banks (public Baidu coordinate tables).
_MCBAND = np.array([12890594.86, 8362377.87, 5591021.0, 3481989.83, 1678043.12, 0.0])
_LLBAND = np.array([75.0, 60.0, 45.0, 30.0, 15.0, 0.0])
_MC2LL = np.array([
    [1.410526172116255e-8, 0.00000898305509648872, -1.9939833816331, 200.9824383106796, -187.2403703815547, 91.6087516669843, -23.38765649603339, 2.57121317296198, -0.03801003308653, 17337981.2],
    [-7.435856389565537e-9, 0.000008983055097726239, -0.78625201886289, 96.32687599759846, -1.85204757529826, -59.36935905485877, 47.40033549296737, -16.50741931063887, 2.28786674699375, 10260144.86],
    [-3.030883460898826e-8, 0.00000898305509983578, 0.30071316287616, 59.74293618442277, 7.357984074871, -25.38371002664745, 13.45380521110908, -3.29883767235584, 0.32710905363475, 6856817.37],
    [-1.981981304930552e-8, 0.000008983055099779535, 0.03278182852591, 40.31678527705744, 0.65659298677277, -4.44255534477492, 0.85341911805263, 0.12923347998204, -0.04625736007561, 4482777.06],
    [3.09191371068437e-9, 0.000008983055096812155, 0.00006995724062, 23.10934304144901, -0.00023663490511, -0.6321817810242, -0.00663494467273, 0.03430082397953, -0.00466043876332, 2555164.4],
    [2.890871144776878e-9, 0.000008983055095805407, -3.068298e-8, 7.47137025468032, -0.00000353937994, -0.02145144861037, -0.00001234426596, 0.00010322952773, -0.00000323890364, 826088.5],
])
_LL2MC = np.array([
    [-0.0015702102444, 111320.7020616939, 1704480524535203.0, -10338987376042340.0, 26112667856603880.0, -35149669176653700.0, 26595700718403920.0, -10725012454188240.0, 1800819912950474.0, 82.5],
    [0.0008277824516172526, 111320.7020463578, 647795574.6671607, -4082003173.641316, 10774905663.51142, -15171875531.51559, 12053065338.62167, -5124939663.577472, 913311935.9512032, 67.5],
    [0.00337398766765, 111320.7020202162, 4481351.045890365, -23393751.19931662, 79682215.47186455, -115964993.2797253, 97236711.15602145, -43661946.33752821, 8477230.501135234, 52.5],
    [0.00220636496208, 111320.7020209128, 51751.86112841131, 3796837.749470245, 992013.7397791013, -1221952.21711287, 1340652.697009075, -620943.6990984312, 144416.9293806241, 37.5],
    [-0.0003441963504368392, 111320.7020576856, 278.2353980772752, 2485758.690035394, 6070.750963243378, 54821.18345352118, 9540.606633304236, -2710.55326746645, 1405.483844121726, 22.5],
    [-0.0003218135878613132, 111320.7020701615, 0.00369383431289, 823725.6402795718, 0.46104986909093, 2351.343141331292, 1.58060784298199, 8.77738589078284, 0.37238884252424, 7.45],
])


def _yr(x, y, ce):
    """Band polynomial evaluator (gis.go:343-355), vectorized over rows.

    ``ce`` has shape (n, 10): the per-row selected coefficient bank.
    Signs of the outputs are restored from the signs of the *inputs*.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x_tmp = ce[:, 0] + ce[:, 1] * np.abs(x)
    cc = np.abs(y) / ce[:, 9]
    # power series cc^0..cc^6 with coefficients ce[:, 2..8].  Powers are
    # explicit square-chained products (cc3 = cc2·cc, cc5 = cc4·cc, …)
    # so the DuckDB oracle SQL can replicate the float64 association
    # bit-for-bit (numpy's ``**`` uses libm pow for exponents ≥ 3, which
    # no SQL product expression reproduces); golden tests pin 6-dp.
    cc2 = cc * cc
    cc3 = cc2 * cc
    cc4 = cc2 * cc2
    cc5 = cc4 * cc
    cc6 = cc4 * cc2
    y_tmp = (
        ce[:, 2] + ce[:, 3] * cc + ce[:, 4] * cc2 + ce[:, 5] * cc3
        + ce[:, 6] * cc4 + ce[:, 7] * cc5 + ce[:, 8] * cc6
    )
    x_tmp = np.where(x < 0, -x_tmp, x_tmp)
    y_tmp = np.where(y < 0, -y_tmp, y_tmp)
    return x_tmp, y_tmp


def _wrap_lng(lng):
    """Go getLoop semantics (gis.go:310-318): subtract/add 360 until in range.

    Inputs > 180 land in (-180, 180]; inputs < -180 land in [-180, 180);
    in-range inputs are untouched.
    """
    lng = np.asarray(lng, dtype=np.float64)
    over = lng > 180.0
    under = lng < -180.0
    k_over = np.ceil((lng - 180.0) / 360.0)
    k_under = np.ceil((-180.0 - lng) / 360.0)
    return np.where(over, lng - 360.0 * k_over, np.where(under, lng + 360.0 * k_under, lng))


def bd09_to_mercator(lng, lat):
    """BD-09 lon/lat → Baidu Mercator meters (gis.go:308-341)."""
    lng = np.atleast_1d(_wrap_lng(lng))
    lat = np.clip(np.atleast_1d(np.asarray(lat, dtype=np.float64)), -74.0, 74.0)
    # band: first i (scanning 0..5) with lat >= _LLBAND[i]; negatives fall
    # through to the reverse scan which always picks band 5 (gis.go:332-339)
    band = np.full(lat.shape, 5, dtype=np.int64)
    for i in range(len(_LLBAND) - 1, -1, -1):
        band = np.where(lat >= _LLBAND[i], i, band)
    ce = _LL2MC[band]
    return _yr(lng, lat, ce)


def mercator_to_bd09(x, y):
    """Baidu Mercator meters → BD-09 (gis.go:294-306).

    Reference quirk: x is abs()'d before ``yr`` (gis.go:297), so the
    returned longitude is always non-negative; y keeps its sign.
    """
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    y_abs = np.abs(y)
    band = np.full(y_abs.shape, len(_MCBAND) - 1, dtype=np.int64)
    for i in range(len(_MCBAND) - 1, -1, -1):
        band = np.where(y_abs >= _MCBAND[i], i, band)
    cf = _MC2LL[band]
    return _yr(np.abs(x), y, cf)


def bmap_mocator(mocator: str) -> str:
    """Baidu map-API encoded polyline → LINESTRING WKT (map.go:265-293).

    Format: ``"4|<bbox>|<segments>"`` — segments are ``;``-separated,
    each ``"<kind>-<x0,y0,x1,y1,...>"``; only kind ``1`` carries the
    polyline (the LAST kind-1 segment wins, as in the reference loop).
    Coordinates are Baidu-Mercator meters, converted per-vertex with
    ``mercator_to_bd09`` (inheriting its abs(x) quirk) and formatted
    with Go ``%g`` shortest-round-trip semantics.

    Empty input → "" (map.go:267-269); non-type-4 or malformed input
    → "" (the reference would emit "LINESTRING (" then panic slicing
    sb; we return the sentinel instead — documented deviation)."""
    from xutil_spark.kernels.geometry import _gofmt

    if not mocator:
        return ""
    geos = mocator.split("|")
    if len(geos) < 3 or geos[0] != "4":
        return ""
    geo = ""
    for seg in geos[2].split(";"):
        path = seg.split("-")
        if path[0] == "1" and len(path) > 1:
            geo = path[1]
    if not geo:
        return ""
    vals = geo.split(",")
    try:
        xs = np.array([float(v) for v in vals[0::2]], dtype=np.float64)
        ys = np.array([float(v) for v in vals[1::2]], dtype=np.float64)
    except ValueError:  # malformed coord (e.g. '-'-split truncation)
        return ""
    if len(xs) != len(ys) or len(xs) == 0:
        return ""
    lng, lat = mercator_to_bd09(xs, ys)
    pts = ",".join(f"{_gofmt(a)} {_gofmt(b)}" for a, b in zip(lng, lat))
    return f"LINESTRING ({pts})"


def bd09_to_tile(lng, lat, zoom):
    """BD-09 lon/lat → Baidu tile number at ``zoom`` (gis.go:287-292).

    Baidu pyramid: cV = 2^(18-zoom) * 256 meters/tile.
    """
    x, y = bd09_to_mercator(lng, lat)
    cv = np.exp2(np.float64(18 - zoom)) * 256.0
    return (
        np.floor(x / cv).astype(np.int64),
        np.floor(y / cv).astype(np.int64),
    )
