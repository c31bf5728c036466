"""Independent scalar reimplementation of MercatorToBd09 + BmapMocator
(gis.go:294-306, map.go:265-293), used ONLY to build the computed-VALUES
driver oracle for `bmap_mocator` (same pattern as kernels/lsh_py and
kernels/s2.cell_id_py).

Pure-python float math in the reference's exact operation order: band
select on |y| against MCBAND, then the `yr` polynomial with explicit
square-chained powers (cc3 = cc2·cc, …) and left-to-right summation —
bit-identical to the vectorized path in kernels/baidu.py by IEEE-754
construction, but sharing no code with it (tables are re-declared from
gis.go:53-60; any transcription drift on either side shows up as a
driver hash mismatch).
"""

from __future__ import annotations

# gis.go:53-54,57-60 (public Baidu coordinate tables), re-transcribed
_MCBAND_S = (12890594.86, 8362377.87, 5591021.0, 3481989.83, 1678043.12, 0.0)
_MC2LL_S = (
    (1.410526172116255e-8, 0.00000898305509648872, -1.9939833816331, 200.9824383106796, -187.2403703815547, 91.6087516669843, -23.38765649603339, 2.57121317296198, -0.03801003308653, 17337981.2),
    (-7.435856389565537e-9, 0.000008983055097726239, -0.78625201886289, 96.32687599759846, -1.85204757529826, -59.36935905485877, 47.40033549296737, -16.50741931063887, 2.28786674699375, 10260144.86),
    (-3.030883460898826e-8, 0.00000898305509983578, 0.30071316287616, 59.74293618442277, 7.357984074871, -25.38371002664745, 13.45380521110908, -3.29883767235584, 0.32710905363475, 6856817.37),
    (-1.981981304930552e-8, 0.000008983055099779535, 0.03278182852591, 40.31678527705744, 0.65659298677277, -4.44255534477492, 0.85341911805263, 0.12923347998204, -0.04625736007561, 4482777.06),
    (3.09191371068437e-9, 0.000008983055096812155, 0.00006995724062, 23.10934304144901, -0.00023663490511, -0.6321817810242, -0.00663494467273, 0.03430082397953, -0.00466043876332, 2555164.4),
    (2.890871144776878e-9, 0.000008983055095805407, -3.068298e-8, 7.47137025468032, -0.00000353937994, -0.02145144861037, -0.00001234426596, 0.00010322952773, -0.00000323890364, 826088.5),
)


def _yr_py(x: float, y: float, ce) -> tuple[float, float]:
    """gis.go:343-355 scalar: |x|,|y| polynomial, signs restored from
    the inputs, square-chained powers, left-to-right summation."""
    x_tmp = ce[0] + ce[1] * abs(x)
    cc = abs(y) / ce[9]
    cc2 = cc * cc
    cc3 = cc2 * cc
    cc4 = cc2 * cc2
    cc5 = cc4 * cc
    cc6 = cc4 * cc2
    y_tmp = (
        ce[2] + ce[3] * cc + ce[4] * cc2 + ce[5] * cc3
        + ce[6] * cc4 + ce[7] * cc5 + ce[8] * cc6
    )
    if x < 0:
        x_tmp = -x_tmp
    if y < 0:
        y_tmp = -y_tmp
    return x_tmp, y_tmp


def mercator_to_bd09_py(x: float, y: float) -> tuple[float, float]:
    """gis.go:294-306 scalar, abs(x)-before-yr quirk preserved."""
    y_abs = abs(y)
    band = len(_MCBAND_S) - 1
    for i in range(len(_MCBAND_S) - 1, -1, -1):
        if y_abs >= _MCBAND_S[i]:
            band = i
    return _yr_py(abs(x), y, _MC2LL_S[band])


def _gfmt_py(x: float) -> str:
    """Go %g / json.Marshal semantics for coordinate-scale values:
    integral → no trailing .0, else shortest round-trip decimal."""
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(float(x))


def bmap_mocator_py(mocator: str) -> str:
    """map.go:265-293 scalar: type-4 mocator → last kind-1 segment →
    per-vertex MercatorToBd09 → LINESTRING WKT."""
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
        nums = [float(v) for v in vals]
    except ValueError:
        return ""
    if len(nums) % 2 or not nums:
        return ""
    pts = []
    for i in range(0, len(nums), 2):
        lng, lat = mercator_to_bd09_py(nums[i], nums[i + 1])
        pts.append(f"{_gfmt_py(lng)} {_gfmt_py(lat)}")
    return "LINESTRING (" + ",".join(pts) + ")"
