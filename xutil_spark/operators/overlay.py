"""Polygon × polygon overlay-area join — the vector×vector spatial
primitive that completes the join matrix next to point×polygon
(spatial_join.point_in_polygon_join), point×segment (the snap join) and
segment×segment (intersections.crossing_pairs).

Engine addition (the reference's geometry toolkit stops at single-ring
predicates — geo.go:299-334 gives Box and the shoelace orientation;
this extends both to pairwise intersection AREAS, the areal-
interpolation / zonal-overlay workhorse).

Semantics
---------
For each candidate pair (A, B) of simple single-ring polygons, compute
the exact planar area of A ∩ B by Green's theorem.  The two ubiquitous
degeneracies of real polygon data are handled exactly: ADJACENT
polygons sharing a border overlap with area 0, and IDENTICAL rings
overlap with their full area (see ``_side_sum_q``); other exact-contact
cases (vertex on edge, PARTIAL edge overlap) assume generic position —
hash-jittered data satisfies it.  The sum: the boundary of A ∩ B
consists of the sub-segments of ∂A inside B plus the sub-segments of
∂B inside A, so

    2 · area(A ∩ B) = Σ cross(p, q)  over all such sub-segments (CCW),

where each edge is split at its proper crossings with the other
boundary and a sub-segment's membership is its midpoint's even-odd
ray-cast (kernels.geometry.ray_cast convention).  The formula needs no
case analysis: containment (A ⊂ B), disjointness and multi-component
intersections of concave rings all fall out of the same sum.

Exactness contract (the DTW/bigram quantize-before-reduce idea): every
sub-segment's cross product is rounded HALF-UP to integer
``quant``-units (default 1e12 per deg²) BEFORE summation, so the total
``area_q`` is exact integer arithmetic — order-independent, identical
between the numpy kernel and a pure-Python scalar replay of the same
IEEE expressions, and therefore VALUES-oracle-able.

Scale shape (10^12 rows)
------------------------
1. Per side, one narrow JVM projection: bbox via array_min/max, then
   the zoom-``zoom`` bbox cell cover as a 2-D ``sequence`` explode —
   no Python, no shuffle.  Overlapping polygons share a covering cell
   (both covers contain every cell their bboxes touch), so the cell
   equi-join is COMPLETE for area > 0.
2. One shuffle each: the cell equi-join (AQE handles skewed dense
   cells; a planet-sized polygon should be pre-split by the caller)
   and the ``(a_id, b_id)`` distinct; a bbox-overlap predicate prunes
   corner-touch cell pairs before the distinct.
3. Two dim joins pull the vertex arrays onto the pairs, then one
   ``mapInPandas`` kernel.  Pair rows are skinny but per-row
   O(n·m)-quadratic in compute, so the stream is repartitioned to
   ``defaultParallelism`` first (AQE coalesces by BYTES and would
   serialize the kernel otherwise — the trajsim lesson).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xutil_spark.functions import native

_QUANT = 1e12
_M_PER_DEG = 111194.92664455873  # π/180 × 6371000 — spatial_join._M_PER_DEG
_MERC_LAT = 85.05112878


def _bbox_cells(polys: DataFrame, id_col: str, xs: str, ys: str,
                zoom: int, tag: str) -> DataFrame:
    """(id, cell, w, s, e, n): every zoom-``zoom`` cell intersecting the
    polygon's bbox (kernels.geometry.covering_cells semantics, but as a
    pure JVM sequence-explode so the fact side never leaves codegen)."""
    n_tiles = (1 << zoom) - 1
    clamp = lambda c: F.greatest(F.lit(0).cast("long"),
                                 F.least(F.lit(n_tiles).cast("long"), c))
    d = polys.select(
        F.col(id_col),
        F.array_min(xs).alias(f"{tag}w"), F.array_min(ys).alias(f"{tag}s"),
        F.array_max(xs).alias(f"{tag}e"), F.array_max(ys).alias(f"{tag}n"),
    )
    lo = F.greatest(F.lit(-_MERC_LAT), F.least(F.lit(_MERC_LAT), F.col(f"{tag}s")))
    hi = F.greatest(F.lit(-_MERC_LAT), F.least(F.lit(_MERC_LAT), F.col(f"{tag}n")))
    d = d.withColumns({
        "_x1": clamp(native.tile_x(f"{tag}w", zoom)),
        "_x2": clamp(native.tile_x(f"{tag}e", zoom)),
        "_y1": clamp(native.tile_y(hi, zoom)),   # NW corner: max lat → min y
        "_y2": clamp(native.tile_y(lo, zoom)),
    })
    d = (
        d.withColumn("_tx", F.explode(F.sequence("_x1", "_x2")))
        .withColumn("_ty", F.explode(F.sequence("_y1", "_y2")))
        .withColumn("cell", native.cell_from_xy("_tx", "_ty", zoom))
    )
    return d.drop("_x1", "_x2", "_y1", "_y2", "_tx", "_ty")


def _ccw(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Normalize an open ring to CCW by the closed-ring shoelace sign."""
    s = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    if s < 0.0:
        return x[::-1].copy(), y[::-1].copy()
    return x, y


def _even_odd(mx: np.ndarray, my: np.ndarray,
              qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Even-odd membership of points in the closed ring (qx, qy) —
    ray_cast's half-open crossing rule, specialized to one open ring."""
    x1, y1 = qx, qy
    x2, y2 = np.roll(qx, -1), np.roll(qy, -1)
    straddle = (y1[None, :] > my[:, None]) != (y2[None, :] > my[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1[None, :] + (my[:, None] - y1[None, :]) / (
            y2[None, :] - y1[None, :]
        ) * (x2[None, :] - x1[None, :])
    crosses = straddle & (mx[:, None] < x_int)
    return (np.sum(crosses, axis=1) % 2).astype(bool)


def _on_edge(mx: np.ndarray, my: np.ndarray,
             qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Points lying EXACTLY on an edge of ring Q (collinear and within
    the edge's closed bbox) — the shared-border degeneracy detector."""
    x1, y1 = qx, qy
    x2, y2 = np.roll(qx, -1), np.roll(qy, -1)
    cr = (x2 - x1)[None, :] * (my[:, None] - y1[None, :]) \
        - (y2 - y1)[None, :] * (mx[:, None] - x1[None, :])
    wx = (mx[:, None] >= np.minimum(x1, x2)[None, :]) \
        & (mx[:, None] <= np.maximum(x1, x2)[None, :])
    wy = (my[:, None] >= np.minimum(y1, y2)[None, :]) \
        & (my[:, None] <= np.maximum(y1, y2)[None, :])
    return ((cr == 0.0) & wx & wy).any(axis=1)


def _side_sum_q(px: np.ndarray, py: np.ndarray,
                qx: np.ndarray, qy: np.ndarray, quant: float,
                primary: bool = True) -> int:
    """Σ quantized cross products of P's edge sub-segments whose
    midpoints lie inside Q (both rings open and CCW).

    Boundary-collinear sub-segments (midpoint exactly on a Q edge —
    shared borders, identical rings) are counted ONCE across the two
    passes: only by the ``primary`` (A) side, and only when the two
    interiors locally agree — the midpoint nudged 1e-7·edge-normal into
    P's interior must land inside Q.  Adjacent polygons sharing a
    border therefore overlap with area 0, while identical rings overlap
    with their full area.  (Partial edge overlaps that leave the
    midpoint off the other boundary remain under the generic-position
    contract.)"""
    n, m = len(px), len(qx)
    p2x, p2y = np.roll(px, -1), np.roll(py, -1)
    q2x, q2y = np.roll(qx, -1), np.roll(qy, -1)
    dpx, dpy = p2x - px, p2y - py
    dqx, dqy = q2x - qx, q2y - qy
    # orientation of Q-edge endpoints about each P-edge (n, m) …
    d1 = dpx[:, None] * (qy[None, :] - py[:, None]) \
        - dpy[:, None] * (qx[None, :] - px[:, None])
    d2 = dpx[:, None] * (q2y[None, :] - py[:, None]) \
        - dpy[:, None] * (q2x[None, :] - px[:, None])
    # … and of P-edge endpoints about each Q-edge
    d3 = dqx[None, :] * (py[:, None] - qy[None, :]) \
        - dqy[None, :] * (px[:, None] - qx[None, :])
    d4 = dqx[None, :] * (p2y[:, None] - qy[None, :]) \
        - dqy[None, :] * (p2x[:, None] - qx[None, :])
    proper = (d1 * d2 < 0.0) & (d3 * d4 < 0.0)
    total = 0
    for i in range(n):
        js = np.nonzero(proper[i])[0]
        if js.size:
            ts = np.sort(d3[i, js] / (d3[i, js] - d4[i, js]))
            bounds = np.concatenate(([0.0], ts, [1.0]))
        else:
            bounds = np.array([0.0, 1.0])
        sx = px[i] + bounds * dpx[i]
        sy = py[i] + bounds * dpy[i]
        mx = (sx[:-1] + sx[1:]) * 0.5
        my = (sy[:-1] + sy[1:]) * 0.5
        inside = _even_odd(mx, my, qx, qy)
        onb = _on_edge(mx, my, qx, qy)
        if onb.any():
            if primary:
                # nudge into P's interior (left of the CCW edge) and
                # let the strict test decide whether interiors agree
                h = math.hypot(dpx[i], dpy[i])
                ex, ey = -dpy[i] / h * 1e-7, dpx[i] / h * 1e-7
                agree = _even_odd(mx + ex, my + ey, qx, qy)
                inside = np.where(onb, agree, inside)
            else:
                inside = inside & ~onb
        if inside.any():
            cross = sx[:-1] * sy[1:] - sx[1:] * sy[:-1]
            cq = np.floor(cross * quant + 0.5).astype(np.int64)
            total += int(cq[inside].sum())
    return total


def _ring_area_q(x: np.ndarray, y: np.ndarray, quant: float) -> int:
    """Quantized twice-area of a full open CCW ring (same per-edge
    rounding as the sub-segment sum, so fractions are scale-free)."""
    cross = x * np.roll(y, -1) - np.roll(x, -1) * y
    return int(np.floor(cross * quant + 0.5).astype(np.int64).sum())


def _batch_even_odd(mx: np.ndarray, my: np.ndarray,
                    qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Even-odd test, batched: points (P, K) against per-pair rings
    (P, m).  Same comparisons as ``_even_odd``; zero-length padding
    edges never straddle, so ring padding is inert."""
    x1, y1 = qx, qy
    x2, y2 = np.roll(qx, -1, axis=1), np.roll(qy, -1, axis=1)
    straddle = (y1[:, None, :] > my[:, :, None]) \
        != (y2[:, None, :] > my[:, :, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1[:, None, :] + (my[:, :, None] - y1[:, None, :]) / (
            y2[:, None, :] - y1[:, None, :]
        ) * (x2[:, None, :] - x1[:, None, :])
    crosses = straddle & (mx[:, :, None] < x_int)
    return (np.sum(crosses, axis=2) % 2).astype(bool)


def _batch_on_edge(mx: np.ndarray, my: np.ndarray,
                   qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    x1, y1 = qx, qy
    x2, y2 = np.roll(qx, -1, axis=1), np.roll(qy, -1, axis=1)
    cr = (x2 - x1)[:, None, :] * (my[:, :, None] - y1[:, None, :]) \
        - (y2 - y1)[:, None, :] * (mx[:, :, None] - x1[:, None, :])
    wx = (mx[:, :, None] >= np.minimum(x1, x2)[:, None, :]) \
        & (mx[:, :, None] <= np.maximum(x1, x2)[:, None, :])
    wy = (my[:, :, None] >= np.minimum(y1, y2)[:, None, :]) \
        & (my[:, :, None] <= np.maximum(y1, y2)[:, None, :])
    return ((cr == 0.0) & wx & wy).any(axis=2)


def _batch_side_sum(px: np.ndarray, py: np.ndarray,
                    qx: np.ndarray, qy: np.ndarray, quant: float,
                    primary: bool) -> np.ndarray:
    """Batched ``_side_sum_q``: P pairs at once, rings padded to
    (P, n) / (P, m) by repeating each ring's last vertex.  Padding is
    exact-invariant: zero-length edges make zero cross products (the
    quantized contribution of an empty sub-segment is floor(0.5) = 0)
    and never straddle or cross, and non-proper crossing slots take
    t = 1.0, which only appends empty [1, 1] sub-segments after the
    real ones — so every pair's total equals the scalar sum bit for
    bit.  Returns (P,) int64 totals."""
    P, n = px.shape
    m = qx.shape[1]
    p2x, p2y = np.roll(px, -1, axis=1), np.roll(py, -1, axis=1)
    q2x, q2y = np.roll(qx, -1, axis=1), np.roll(qy, -1, axis=1)
    dpx, dpy = p2x - px, p2y - py
    dqx, dqy = q2x - qx, q2y - qy
    pxe, pye = px[:, :, None], py[:, :, None]
    p2xe, p2ye = p2x[:, :, None], p2y[:, :, None]
    dpxe, dpye = dpx[:, :, None], dpy[:, :, None]
    qxe, qye = qx[:, None, :], qy[:, None, :]
    q2xe, q2ye = q2x[:, None, :], q2y[:, None, :]
    dqxe, dqye = dqx[:, None, :], dqy[:, None, :]
    d1 = dpxe * (qye - pye) - dpye * (qxe - pxe)
    d2 = dpxe * (q2ye - pye) - dpye * (q2xe - pxe)
    d3 = dqxe * (pye - qye) - dqye * (pxe - qxe)
    d4 = dqxe * (p2ye - qye) - dqye * (p2xe - qxe)
    proper = (d1 * d2 < 0.0) & (d3 * d4 < 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        # np.where evaluates both branches: d3 == d4 on non-proper
        # slots divides by zero harmlessly (masked), hence the errstate
        ts = np.where(proper, d3 / (d3 - d4), 1.0)
    ts = np.sort(ts, axis=2)                       # (P, n, m)
    shape = (P, n, 1)
    bounds = np.concatenate(
        [np.zeros(shape), ts, np.ones(shape)], axis=2)  # (P, n, m+2)
    sx = px[:, :, None] + bounds * dpx[:, :, None]
    sy = py[:, :, None] + bounds * dpy[:, :, None]
    mx = (sx[:, :, :-1] + sx[:, :, 1:]) * 0.5      # (P, n, m+1)
    my = (sy[:, :, :-1] + sy[:, :, 1:]) * 0.5
    K = n * (m + 1)
    mxf, myf = mx.reshape(P, K), my.reshape(P, K)
    inside = _batch_even_odd(mxf, myf, qx, qy)
    onb = _batch_on_edge(mxf, myf, qx, qy)
    if onb.any():
        if primary:
            pi, ki = np.nonzero(onb)
            ei = ki // (m + 1)                      # edge index of P
            h = np.hypot(dpx[pi, ei], dpy[pi, ei])
            with np.errstate(divide="ignore", invalid="ignore"):
                ex = -dpy[pi, ei] / h * 1e-7
                ey = dpx[pi, ei] / h * 1e-7
            # zero-length (padding) edges have h == 0 → nan offsets →
            # their contribution is 0 anyway; nudge real edges only
            ok = h > 0.0
            agree = np.zeros(len(pi), dtype=bool)
            if ok.any():
                sub = _batch_even_odd(
                    (mxf[pi, ki] + ex)[:, None][ok],
                    (myf[pi, ki] + ey)[:, None][ok],
                    qx[pi[ok]], qy[pi[ok]])[:, 0]
                agree[ok] = sub
            inside = inside.copy()
            inside[pi, ki] = agree
        else:
            inside = inside & ~onb
    cross = sx[:, :, :-1] * sy[:, :, 1:] - sx[:, :, 1:] * sy[:, :, :-1]
    cq = np.floor(cross * quant + 0.5).astype(np.int64)
    return np.sum(np.where(inside.reshape(P, n, m + 1), cq, 0), axis=(1, 2))


def _pad_rings(rings: list) -> tuple[np.ndarray, np.ndarray]:
    """Open CCW rings → (P, nmax) x/y arrays, last vertex repeated."""
    nmax = max(len(r[0]) for r in rings)
    P = len(rings)
    xs = np.empty((P, nmax), dtype=np.float64)
    ys = np.empty((P, nmax), dtype=np.float64)
    for i, (x, y) in enumerate(rings):
        k = len(x)
        xs[i, :k], ys[i, :k] = x, y
        xs[i, k:], ys[i, k:] = x[-1], y[-1]
    return xs, ys


def pair_area_q(ax, ay, bx, by, quant: float = _QUANT) -> int:
    """Quantized twice-area of A ∩ B for two open rings (any winding)."""
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    bx = np.asarray(bx, dtype=np.float64)
    by = np.asarray(by, dtype=np.float64)
    ax, ay = _ccw(ax, ay)
    bx, by = _ccw(bx, by)
    return _side_sum_q(ax, ay, bx, by, quant, primary=True) \
        + _side_sum_q(bx, by, ax, ay, quant, primary=False)


def overlay_area_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    zoom: int = 6,
    a_id: str = "a_id",
    b_id: str = "b_id",
    xs: str = "xs",
    ys: str = "ys",
    quant: float = _QUANT,
) -> DataFrame:
    """Intersection-area join of two polygon tables.

    Inputs carry one simple ring per row as parallel ``array<double>``
    columns ``xs``/``ys`` (open or closed; any winding).  ``a_id`` and
    ``b_id`` must be distinct column names.  Output, one row per pair
    with positive intersection area:

    - ``area_q``     — exact integer: 2·area·quant (the hash anchor),
    - ``area_deg2``  — area_q / (2·quant),
    - ``frac_a/b``   — area_q / ring_area_q(A or B), the areal-
      interpolation weights, rounded to 9 dp,
    - ``area_m2``    — equirectangular m² at the two bboxes' mean
      latitude, rounded to 3 dp (planar deg² is latitude-distorted;
      this is the metric column, same scale model as the trajectory
      kernels).

    Int64 headroom: individual quantized edge terms reach |lon·lat|·
    quant ≈ 1.5e16, so partial sums stay far under 2^63 for rings up to
    ~10^2 vertices at the default quant; for planet-spanning rings with
    10^4+ vertices, pass a smaller ``quant`` (or pre-shift coordinates
    to a local origin) to keep the same exactness contract.
    """
    if a_id == b_id:
        raise ValueError("a_id and b_id must be distinct column names")
    a_cells = _bbox_cells(polys_a, a_id, xs, ys, zoom, "a")
    b_cells = _bbox_cells(polys_b, b_id, xs, ys, zoom, "b")
    cand = (
        a_cells.join(b_cells, "cell")
        .where((F.col("aw") <= F.col("be")) & (F.col("bw") <= F.col("ae"))
               & (F.col("as") <= F.col("bn")) & (F.col("bs") <= F.col("an")))
        .select(a_id, b_id)
        .distinct()
    )
    averts = polys_a.select(F.col(a_id), F.col(xs).alias("_axs"),
                            F.col(ys).alias("_ays"))
    bverts = polys_b.select(F.col(b_id), F.col(xs).alias("_bxs"),
                            F.col(ys).alias("_bys"))
    pairs = cand.join(averts, a_id).join(bverts, b_id)
    # skinny rows, quadratic per-row compute → size by cores, not bytes
    par = pairs.sparkSession.sparkContext.defaultParallelism
    pairs = pairs.repartition(par)

    a_t = polys_a.schema[a_id].dataType.simpleString()
    b_t = polys_b.schema[b_id].dataType.simpleString()
    schema = (f"{a_id} {a_t}, {b_id} {b_t}, area_q long, area_deg2 double, "
              f"frac_a double, frac_b double, area_m2 double")
    k2 = _M_PER_DEG * _M_PER_DEG

    def _norm(xs, ys):
        x = np.asarray(xs, dtype=np.float64)
        y = np.asarray(ys, dtype=np.float64)
        if len(x) >= 2 and x[0] == x[-1] and y[0] == y[-1]:
            x, y = x[:-1], y[:-1]
        return _ccw(x, y)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {a_id: [], b_id: [], "area_q": [], "area_deg2": [],
                         "frac_a": [], "frac_b": [], "area_m2": []}
            if len(pdf):
                aring = [_norm(x, y) for x, y in zip(pdf["_axs"], pdf["_ays"])]
                bring = [_norm(x, y) for x, y in zip(pdf["_bxs"], pdf["_bys"])]
                axp, ayp = _pad_rings(aring)
                bxp, byp = _pad_rings(bring)
                qs = _batch_side_sum(axp, ayp, bxp, byp, quant, True) \
                    + _batch_side_sum(bxp, byp, axp, ayp, quant, False)
                aids, bids = pdf[a_id].to_numpy(), pdf[b_id].to_numpy()
                for i in np.nonzero(qs > 0)[0]:
                    q = int(qs[i])
                    ax, ay = aring[i]
                    bx, by = bring[i]
                    fa = _ring_area_q(ax, ay, quant)
                    fb = _ring_area_q(bx, by, quant)
                    deg2 = q / (2.0 * quant)
                    clat = ((float(np.min(ay)) + float(np.max(ay))) * 0.5
                            + (float(np.min(by)) + float(np.max(by))) * 0.5) \
                        * 0.5
                    out[a_id].append(aids[i])
                    out[b_id].append(bids[i])
                    out["area_q"].append(q)
                    out["area_deg2"].append(deg2)
                    out["frac_a"].append(round(q / fa, 9))
                    out["frac_b"].append(round(q / fb, 9))
                    out["area_m2"].append(
                        round(deg2 * k2 * math.cos(math.radians(clat)), 3))
            yield pd.DataFrame(out)

    return pairs.mapInPandas(run, schema)
