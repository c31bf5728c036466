"""Geometry model + WKT/GeoJSON codecs + point-in-polygon kernels.

The geometry value model mirrors the reference's ``Geo`` struct
(geo.go:13-16): a ``type`` tag plus **rank-4 normalized coordinates**
``coords[poly][ring][vertex][xy]``.  Rank normalization on parse follows
FromGeoJSON's unmarshal cascade (geo.go:156-188): Point fills
``coords[0][0][0]``, LineString/MultiPoint ``coords[0][0]``,
Polygon/MultiLineString ``coords[0]``, MultiPolygon all four ranks.

Emission quirks preserved from the reference:

* ``to_wkt`` uses Go ``%g`` float formatting and the exact reference
  spacing: ring = ``( x y, x y)`` (leading space), POINT/LINESTRING join
  ``", "`` inside a ring but MULTIPOINT joins rings' points with ``","``
  (geo.go:218-249);
* ``to_geojson`` slices the rank by type (geo.go:199-212) and formats
  floats Go-style (integral values print without ``.0``);
* ``lines()`` keeps only the FIRST TWO points of each ring — the
  reference's quirk (geo.go:64-72) — the correct consecutive-pair
  decomposition is exposed separately as ``segments()``.

The ray-cast point-in-polygon kernel is new code (the reference has no
PiP); it is vectorized over points and handles holes via even-odd
crossing counting.  Boundary rule: a point exactly on an edge follows the
half-open crossing convention ``(y1 > y) != (y2 > y)`` — deterministic
and consistent between the coarse cell cover and the exact refinement.
"""

from __future__ import annotations

import json
import math
import re

import numpy as np

_TYPE_CANON = {
    "POINT": "Point",
    "LINESTRING": "LineString",
    "MULTILINESTRING": "MultiLineString",
    "POLYGON": "Polygon",
    "MULTIPOLYGON": "MultiPolygon",
    "MULTIPOINT": "MultiPoint",
}

# rank (array nesting depth of the GeoJSON coordinates member) per type
_TYPE_RANK = {
    "Point": 1,
    "LineString": 2,
    "MultiPoint": 2,
    "Polygon": 3,
    "MultiLineString": 3,
    "MultiPolygon": 4,
}


def _gofmt(x: float) -> str:
    """Go ``%g`` / json.Marshal float formatting: shortest round-trip,
    integral values without a trailing ``.0`` (geo.go:227, geo.go:203-209).
    """
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(float(x))


def from_wkt(wkt: str) -> dict:
    """Parse WKT → ``{"type": str, "coords": rank4 list}`` (geo.go:105-141).

    Same strategy as the reference: rewrite parens/commas into JSON
    brackets, wrap bare coordinate pairs into ``[x,y]``, then normalize
    rank like ``from_geojson``.
    """
    head_match = re.match(r"\s*([A-Za-z]+)", wkt)
    if not head_match:
        raise ValueError(f"bad WKT: {wkt!r}")
    gtype = head_match.group(1).upper()
    body = wkt[head_match.end():]
    # tokenize: words, brackets, commas — mirrors the reference's scanner
    tokens = re.findall(r"[^\s(),]+|[(),]", body)
    out = []
    flag = False  # inside an open [x pair awaiting its y
    for w in tokens:
        if w == "(":
            out.append("[")
            flag = False
        elif w == ")":
            out.append("]")
            flag = False
        elif w == ",":
            out.append(",")
            flag = False
        elif flag:
            out.append("," + w + "]")
            flag = True  # reference keeps flag=true (geo.go:117-121)
        else:
            out.append("[" + w)
            flag = True
    coords_json = "".join(out)
    if coords_json == "[]" or coords_json == "":
        raise ValueError(f"{wkt} empty coordinates")
    canon = _TYPE_CANON.get(gtype)
    if canon is None:
        raise ValueError(f"unsupported WKT type {gtype}")
    return from_geojson(
        '{"type":"%s","coordinates":%s}' % (canon, coords_json)
    )


def from_geojson(geojson: str) -> dict:
    """Parse GeoJSON → normalized rank-4 geometry (geo.go:143-190)."""
    gj = json.loads(geojson)
    gtype = _TYPE_CANON.get(str(gj.get("type", "")).upper())
    if gtype is None:
        raise ValueError(f"unsupported type in {geojson[:60]}")
    raw = gj.get("coordinates")
    rank = _rank(raw)
    coords = raw
    for _ in range(4 - rank):
        coords = [coords]
    return {"type": gtype, "coords": coords}


def _rank(v) -> int:
    r = 0
    while isinstance(v, (list, tuple)) and len(v) > 0:
        r += 1
        v = v[0]
    if r == 0 and isinstance(v, (list, tuple)):
        raise ValueError("empty coordinates")
    return r


def to_geojson(geo: dict) -> str:
    """Geometry → GeoJSON string with type-selected rank (geo.go:192-212)."""
    rank = _TYPE_RANK[geo["type"]]
    c = geo["coords"]
    for _ in range(4 - rank):
        c = c[0]
    return '{"type":"%s","coordinates":%s}' % (geo["type"], _json_coords(c))


def _json_coords(c) -> str:
    if isinstance(c, (list, tuple)):
        return "[" + ",".join(_json_coords(v) for v in c) + "]"
    return _gofmt(float(c))


def to_wkt(geo: dict) -> str:
    """Geometry → WKT with the reference's exact formatting (geo.go:218-249)."""
    coords = geo["coords"]
    points: list[str] = []
    polygon: list[str] = []
    multipolygon: list[str] = []
    for a in coords:
        polygon = []
        for b in a:
            points = ["%s %s" % (_gofmt(c[0]), _gofmt(c[1])) for c in b]
            polygon.append("( %s)" % ", ".join(points))
        multipolygon.append("(%s)" % ", ".join(polygon))
    t = geo["type"]
    if t == "Point":
        return "POINT (%s)" % points[0]
    if t == "MultiPoint":
        return "MULTIPOINT (%s)" % ",".join(points)
    if t == "LineString":
        return "LINESTRING (%s)" % ",".join(points)
    if t == "MultiLineString":
        return "MULTILINESTRING (%s)" % ",".join(polygon)
    if t == "Polygon":
        return "POLYGON (%s)" % ",".join(polygon)
    if t == "MultiPolygon":
        return "MULTIPOLYGON (%s)" % ",".join(multipolygon)
    raise ValueError(f"unsupported type {t}")


def geo_points(geo: dict) -> list[tuple[float, float]]:
    """All vertices in order (geo.go:73-83)."""
    return [
        (c[0], c[1]) for a in geo["coords"] for b in a for c in b
    ]


def geo_lines(geo: dict) -> list[tuple[float, float, float, float]]:
    """Reference quirk (geo.go:64-72): FIRST TWO points of each ring only."""
    return [
        (b[0][0], b[0][1], b[1][0], b[1][1])
        for a in geo["coords"]
        for b in a
    ]


def segments(geo: dict) -> list[tuple[float, float, float, float]]:
    """Correct consecutive-pair decomposition (engine addition)."""
    return [
        (b[i][0], b[i][1], b[i + 1][0], b[i + 1][1])
        for a in geo["coords"]
        for b in a
        for i in range(len(b) - 1)
    ]


def point_func(geo: dict, f) -> dict:
    """Apply ``(lon, lat) -> (lon, lat)`` to every vertex (geo.go:251-261).

    Unlike the reference (in-place), returns a new geometry — DataFrames
    are immutable and so are our values.
    """
    return {
        "type": geo["type"],
        "coords": [
            [[list(f(c[0], c[1])) for c in b] for b in a]
            for a in geo["coords"]
        ],
    }


def flip_coordinates(geo: dict) -> dict:
    """Swap lon/lat everywhere (geo.go:263-267)."""
    return point_func(geo, lambda x, y: (y, x))


def geo_box(geo: dict) -> list[float]:
    """Envelope [minx, miny, maxx, maxy] (geo.go:298-321)."""
    pts = geo_points(geo)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return [min(xs), min(ys), max(xs), max(ys)]


def is_clockwise(ring) -> bool:
    """Green's-theorem orientation (geo.go:323-334): iterates vertices
    0..n-2 (does NOT close the ring implicitly); d > 0 ⇒ CCW ⇒ False.
    """
    ring = np.asarray(ring, dtype=np.float64)
    x = ring[:, 0]
    y = ring[:, 1]
    d = np.sum(-0.5 * (x[:-1] + x[1:]) * (y[1:] - y[:-1]))
    return not (d > 0)


def ray_cast(lon, lat, rings) -> np.ndarray:
    """Even-odd point-in-polygon over one polygon's rings, vectorized
    over points.  ``rings`` is a list of (n_i, 2) arrays (outer + holes);
    holes flip parity naturally.  Returns a boolean array.

    Engine addition (no reference counterpart); the boundary convention
    is the half-open crossing rule, matching the coarse tile-cover's
    floor semantics on the west/north edges.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(lon.shape, dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        # ensure closure: if the ring isn't closed, add the closing edge
        if r.shape[0] >= 2 and (r[0, 0] != r[-1, 0] or r[0, 1] != r[-1, 1]):
            x1 = np.append(x1, r[-1, 0])
            y1 = np.append(y1, r[-1, 1])
            x2 = np.append(x2, r[0, 0])
            y2 = np.append(y2, r[0, 1])
        # crossing test: edge straddles the horizontal line at lat, and
        # the intersection is strictly east of the point
        straddle = (y1[None, :] > lat[:, None]) != (y2[None, :] > lat[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = x1[None, :] + (lat[:, None] - y1[None, :]) / (
                y2[None, :] - y1[None, :]
            ) * (x2[None, :] - x1[None, :])
        crosses = straddle & (lon[:, None] < x_int)
        inside ^= (np.sum(crosses, axis=1) % 2).astype(bool)
    return inside


def polygon_rings(geo: dict) -> list[list[np.ndarray]]:
    """Polygon/MultiPolygon → list of polygons, each a list of ring arrays."""
    t = geo["type"]
    if t == "Polygon":
        polys = [geo["coords"][0]]
    elif t == "MultiPolygon":
        polys = geo["coords"]
    else:
        raise ValueError(f"not a polygon: {t}")
    return [[np.asarray(ring, dtype=np.float64) for ring in poly] for poly in polys]


def point_in_geo(lon, lat, geo: dict) -> np.ndarray:
    """Even-odd PiP against a (Multi)Polygon geometry, vectorized over points."""
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    result = np.zeros(lon.shape, dtype=bool)
    for rings in polygon_rings(geo):
        result |= ray_cast(lon, lat, rings)
    return result


def covering_cells(geo: dict, zoom: int) -> list[int]:
    """All zoom-``zoom`` cells intersecting the geometry's bbox — the
    coarse filter side of the filter-refine spatial join (SURVEY §2.3).

    Uses the envelope (geo.go:298-321 semantics) so it over-covers
    concave shapes; the exact ray-cast refinement removes false
    positives.  Clamps the lat to the Web-Mercator domain.
    """
    from xutil_spark.kernels.tiles import wgs2tile, cell_pack

    minx, miny, maxx, maxy = geo_box(geo)
    miny = max(min(miny, 85.05112878), -85.05112878)
    maxy = max(min(maxy, 85.05112878), -85.05112878)
    x1, y1 = wgs2tile(np.float64(minx), np.float64(maxy), zoom)  # NW
    x2, y2 = wgs2tile(np.float64(maxx), np.float64(miny), zoom)  # SE
    n = 1 << zoom
    x1 = int(np.clip(x1, 0, n - 1))
    x2 = int(np.clip(x2, 0, n - 1))
    y1 = int(np.clip(y1, 0, n - 1))
    y2 = int(np.clip(y2, 0, n - 1))
    cells = []
    for x in range(x1, x2 + 1):
        for y in range(y1, y2 + 1):
            cells.append(int(cell_pack(x, y, zoom)))
    return cells


def clip_ring_bbox(ring, w: float, s: float, e: float, n: float) -> np.ndarray:
    """Sutherland-Hodgman clip of one ring against an axis-aligned box.

    Engine addition (the scale path of the filter-refine PiP join —
    operators/spatial_join.clipped_pip_join); the clip region is convex
    (a tile bbox) so plain S-H is exact.  For concave subjects the
    output may contain zero-area boundary-following bridges — harmless
    to even-odd interior tests, which is all the fragments feed.
    Returns an (m, 2) array, m == 0 when nothing survives.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if pts.shape[0] >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]  # S-H works on the open ring

    def clip_half(poly, inside, intersect):
        out: list = []
        m = len(poly)
        for i in range(m):
            cur, prv = poly[i], poly[i - 1]
            ci, pi = inside(cur), inside(prv)
            if ci:
                if not pi:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pi:
                out.append(intersect(prv, cur))
        return out

    def x_cross(lim):
        def f(p, q):
            t = (lim - p[0]) / (q[0] - p[0])
            return (lim, p[1] + t * (q[1] - p[1]))
        return f

    def y_cross(lim):
        def f(p, q):
            t = (lim - p[1]) / (q[1] - p[1])
            return (p[0] + t * (q[0] - p[0]), lim)
        return f

    poly = [tuple(p) for p in pts]
    for inside, intersect in (
        (lambda p: p[0] >= w, x_cross(w)),
        (lambda p: p[0] <= e, x_cross(e)),
        (lambda p: p[1] >= s, y_cross(s)),
        (lambda p: p[1] <= n, y_cross(n)),
    ):
        poly = clip_half(poly, inside, intersect)
        if not poly:
            return np.empty((0, 2), dtype=np.float64)
    return np.asarray(poly, dtype=np.float64)


def clip_geo_bbox(geo: dict, w: float, s: float, e: float, n: float) -> list[np.ndarray]:
    """Clip every ring of a (Multi)Polygon to the box; drops rings that
    degenerate below 3 vertices.  Returns a flat ring list — ring
    identity (outer vs hole) is irrelevant to even-odd parity."""
    out = []
    for rings in polygon_rings(geo):
        for ring in rings:
            c = clip_ring_bbox(ring, w, s, e, n)
            if c.shape[0] >= 3:
                out.append(c)
    return out


def spherical_ring_area_m2(ring, max_step_deg: float = 0.05) -> float:
    """Signed spherical area of one ring in m² on the R=6371000 sphere
    (the haversine radius, kernels/distance.py:17) — the metric twin of
    the planar shoelace (geo.go:324-334 uses deg², meaningless across
    latitudes).  Discrete spherical shoelace −R²/2 · Σ (λ₂−λ₁)·(2 +
    sin φ₁ + sin φ₂) (Chamberlain & Duquette 2007, public JPL report),
    positive for CCW rings; antimeridian-crossing edges wrap.

    Edges follow the plate-carrée path (linear in lon/lat — the WKT
    segment model the whole engine uses, NOT great circles); each edge
    is densified to ≤ ``max_step_deg`` before the O(step²) trapezoid
    sum, so the result is stable under edge subdivision — clipping a
    polygon to tiles (clip_ring_bbox) partitions its area exactly
    (pytest-pinned to 1e-6 relative).  Rings with a vertex AT a pole
    are out of domain.
    """
    r = np.asarray(ring, dtype=np.float64)
    if r.shape[0] >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    if r.shape[0] < 3:
        return 0.0
    lam = np.radians(r[:, 0])
    phi = np.radians(r[:, 1])
    dlam = np.roll(lam, -1) - lam
    # wrap antimeridian-crossing edges into (-pi, pi]
    dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
    dphi = np.roll(phi, -1) - phi
    # densify: split each edge into ceil(max(|dlam|,|dphi|)/step) parts,
    # interpolating linearly in (lon, lat) — fully vectorized
    step = np.radians(max_step_deg)
    nseg = np.maximum(
        1, np.ceil(np.maximum(np.abs(dlam), np.abs(dphi)) / step)
    ).astype(np.int64)
    reps = np.repeat(np.arange(len(lam)), nseg)
    seg0 = np.concatenate(([0], np.cumsum(nseg)))[:-1]
    t0 = (np.arange(int(nseg.sum())) - np.repeat(seg0, nseg)) / np.repeat(
        nseg, nseg
    )
    t1 = t0 + 1.0 / np.repeat(nseg, nseg)
    p0 = phi[reps] + t0 * dphi[reps]
    p1 = phi[reps] + t1 * dphi[reps]
    s = float(np.sum((dlam[reps] / nseg[reps])
                     * (2.0 + np.sin(p0) + np.sin(p1))))
    from xutil_spark.kernels.distance import R_EARTH

    return -s * R_EARTH * R_EARTH / 2.0


def geo_area_m2(geo: dict) -> float:
    """Unsigned geodesic area of a (Multi)Polygon in m²: |outer| minus
    holes per even-odd ring orientation — robust to ring winding by
    taking abs of the outer ring and subtracting abs of the rest (the
    normalized rank-4 geometries keep outer first)."""
    total = 0.0
    for rings in polygon_rings(geo):
        if not rings:
            continue
        total += abs(spherical_ring_area_m2(rings[0]))
        for hole in rings[1:]:
            total -= abs(spherical_ring_area_m2(hole))
    return total
