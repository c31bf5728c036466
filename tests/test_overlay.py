"""Polygon×polygon overlay-area join (operators/overlay.py)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xutil_spark.operators.overlay import overlay_area_join, pair_area_q

Q = 1e12


def _df(spark, idc, polys):
    return spark.createDataFrame(pd.DataFrame({
        idc: [p[0] for p in polys],
        "xs": [list(map(float, p[1])) for p in polys],
        "ys": [list(map(float, p[2])) for p in polys],
    }))


def test_rect_rect_exact_area_and_fracs(spark):
    a = _df(spark, "za", [(1, [0, 4, 4, 0], [0, 0, 3, 3])])
    b = _df(spark, "zb", [(7, [2, 6, 6, 2], [1, 1, 5, 5])])
    [r] = overlay_area_join(a, b, zoom=5, a_id="za", b_id="zb").collect()
    assert r.area_q == 8_000_000_000_000  # 2 * 4.0 deg² * 1e12
    assert r.area_deg2 == 4.0
    assert r.frac_a == round(4.0 / 12.0, 9)
    assert r.frac_b == 0.25


def test_containment_gives_full_inner_area(spark):
    tri = _df(spark, "za", [(1, [1, 3, 2], [1, 1, 2.5])])
    sq = _df(spark, "zb", [(9, [0, 8, 8, 0], [0, 0, 8, 8])])
    [r] = overlay_area_join(tri, sq, zoom=5, a_id="za", b_id="zb").collect()
    assert r.area_deg2 == pytest.approx(1.5, abs=1e-9)
    assert r.frac_a == pytest.approx(1.0, abs=1e-9)
    # and the symmetric orientation: big square ∩ small triangle
    [r2] = overlay_area_join(sq.withColumnRenamed("zb", "za"),
                             tri.withColumnRenamed("za", "zb"),
                             zoom=5, a_id="za", b_id="zb").collect()
    assert r2.area_q == r.area_q


def test_disjoint_and_touching_emit_nothing(spark):
    a = _df(spark, "za", [(1, [0, 1, 1, 0], [0, 0, 1, 1])])
    b = _df(spark, "zb", [(2, [5, 6, 6, 5], [0, 0, 1, 1]),
                          (3, [1, 2, 2, 1], [0, 0, 1, 1])])  # edge-touch
    out = overlay_area_join(a, b, zoom=5, a_id="za", b_id="zb").collect()
    assert out == []


def test_identical_rings_overlap_fully(spark):
    a = _df(spark, "za", [(1, [0, 4, 4, 0], [0, 0, 3, 3])])
    b = _df(spark, "zb", [(2, [0, 4, 4, 0], [0, 0, 3, 3])])
    [r] = overlay_area_join(a, b, zoom=5, a_id="za", b_id="zb").collect()
    assert r.area_deg2 == 12.0
    assert r.frac_a == 1.0 and r.frac_b == 1.0


def test_concave_two_component_intersection(spark):
    # U-shape crossed by a thin bar: two 0.5 deg² components
    u = _df(spark, "za", [(3, [0, 5, 5, 4, 4, 1, 1, 0],
                           [0, 0, 3, 3, 1, 1, 3, 3])])
    bar = _df(spark, "zb", [(8, [-1, 6, 6, -1], [2, 2, 2.5, 2.5])])
    [r] = overlay_area_join(u, bar, zoom=5, a_id="za", b_id="zb").collect()
    assert r.area_deg2 == pytest.approx(1.0, abs=1e-9)


def test_winding_and_closure_insensitive(spark):
    ccw = _df(spark, "za", [(1, [0, 4, 4, 0], [0, 0, 3, 3])])
    cw = _df(spark, "za", [(1, [0, 0, 4, 4], [0, 3, 3, 0])])
    closed = _df(spark, "za", [(1, [0, 4, 4, 0, 0], [0, 0, 3, 3, 0])])
    b = _df(spark, "zb", [(7, [2, 6, 6, 2], [1, 1, 5, 5])])
    outs = [overlay_area_join(v, b, zoom=5, a_id="za", b_id="zb")
            .collect()[0].area_q for v in (ccw, cw, closed)]
    assert outs[0] == outs[1] == outs[2] == 8_000_000_000_000


def test_cell_blocking_complete_across_zooms(spark):
    rng = np.random.default_rng(7)
    pa, pb = [], []
    for i in range(12):
        cx, cy = rng.uniform(70, 130), rng.uniform(-20, 50)
        ang = rng.uniform(0, 2 * math.pi)
        r = rng.uniform(2, 9)
        pa.append((i, [cx + r * math.cos(ang + k * math.pi / 3) for k in range(6)],
                   [cy + r * math.sin(ang + k * math.pi / 3) for k in range(6)]))
    for i in range(8):
        cx, cy = rng.uniform(70, 130), rng.uniform(-20, 50)
        r = rng.uniform(3, 12)
        pb.append((100 + i, [cx + r * math.cos(k * math.pi / 4 + 0.3) for k in range(8)],
                   [cy + r * math.sin(k * math.pi / 4 + 0.3) for k in range(8)]))
    a, b = _df(spark, "za", pa), _df(spark, "zb", pb)
    res = {}
    for z in (2, 4, 7):
        rows = overlay_area_join(a, b, zoom=z, a_id="za", b_id="zb").collect()
        res[z] = sorted((r.za, r.zb, r.area_q) for r in rows)
    assert res[2] == res[4] == res[7]
    assert len(res[4]) > 0


def _sh_clip_area(subject, clip):
    """Independent check: Sutherland-Hodgman area for CONVEX clip."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

    def isect(p, q, a, b):
        dx, dy = q[0] - p[0], q[1] - p[1]
        ex, ey = b[0] - a[0], b[1] - a[1]
        den = dx * ey - dy * ex
        t = ((a[0] - p[0]) * ey - (a[1] - p[1]) * ex) / den
        return (p[0] + t * dx, p[1] + t * dy)

    poly = list(subject)
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        out = []
        for j in range(len(poly)):
            p, q = poly[j - 1], poly[j]
            if inside(q, a, b):
                if not inside(p, a, b):
                    out.append(isect(p, q, a, b))
                out.append(q)
            elif inside(p, a, b):
                out.append(isect(p, q, a, b))
        poly = out
        if not poly:
            return 0.0
    s = 0.0
    for j in range(len(poly)):
        p, q = poly[j - 1], poly[j]
        s += p[0] * q[1] - q[0] * p[1]
    return abs(s) * 0.5


def test_kernel_matches_independent_convex_clip():
    rng = np.random.default_rng(11)
    for _ in range(40):
        ca = rng.uniform(-50, 50, 2)
        cb = ca + rng.uniform(-6, 6, 2)
        ra, rb = rng.uniform(1, 6), rng.uniform(1, 6)
        fa, fb = rng.uniform(0, 2), rng.uniform(0, 2)
        ax = [ca[0] + ra * math.cos(fa + k * math.pi / 3) for k in range(6)]
        ay = [ca[1] + ra * math.sin(fa + k * math.pi / 3) for k in range(6)]
        bx = [cb[0] + rb * math.cos(fb + k * 2 * math.pi / 5) for k in range(5)]
        by = [cb[1] + rb * math.sin(fb + k * 2 * math.pi / 5) for k in range(5)]
        got = pair_area_q(ax, ay, bx, by) / (2.0 * Q)
        want = _sh_clip_area(list(zip(ax, ay)), list(zip(bx, by)))
        assert got == pytest.approx(want, abs=1e-6), (ax, ay, bx, by)


def test_batched_kernel_matches_scalar_mixed_sizes(spark):
    """The padded batch kernel must equal the scalar reference bit for
    bit, including mixed ring sizes in one batch (padding inertness)."""
    import numpy as np

    rng = np.random.default_rng(23)
    pa, pb = [], []
    for i in range(30):
        cx, cy = rng.uniform(0, 40), rng.uniform(0, 40)
        k = [3, 5, 6, 8][i % 4]
        ang = rng.uniform(0, 2 * math.pi)
        r = rng.uniform(2, 8)
        pa.append((i, [cx + r * math.cos(ang + j * 2 * math.pi / k)
                       for j in range(k)],
                   [cy + r * math.sin(ang + j * 2 * math.pi / k)
                    for j in range(k)]))
    for i in range(10):
        cx, cy = rng.uniform(0, 40), rng.uniform(0, 40)
        k = [4, 7][i % 2]
        r = rng.uniform(3, 10)
        pb.append((100 + i, [cx + r * math.cos(0.2 + j * 2 * math.pi / k)
                             for j in range(k)],
                   [cy + r * math.sin(0.2 + j * 2 * math.pi / k)
                    for j in range(k)]))
    a, b = _df(spark, "za", pa), _df(spark, "zb", pb)
    got = {(r.za, r.zb): r.area_q for r in
           overlay_area_join(a, b, zoom=4, a_id="za", b_id="zb").collect()}
    ring_a = {p[0]: (p[1], p[2]) for p in pa}
    ring_b = {p[0]: (p[1], p[2]) for p in pb}
    for ia, (axs, ays) in ring_a.items():
        for ib, (bxs, bys) in ring_b.items():
            want = pair_area_q(axs, ays, bxs, bys)
            if want > 0:
                assert got.get((ia, ib)) == want, (ia, ib)
            else:
                assert (ia, ib) not in got
    assert len(got) > 10


def test_id_name_collision_rejected(spark):
    a = _df(spark, "pid", [(1, [0, 1, 1], [0, 0, 1])])
    with pytest.raises(ValueError):
        overlay_area_join(a, a, a_id="pid", b_id="pid")
