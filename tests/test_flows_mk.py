"""od_flows (operators/flows.py) and mann_kendall_cells
(operators/hotspot.py): hand-built trails and time series, checked
against independent pure-Python replays."""

import datetime as dt
import itertools
import math

import pytest

from pyspark.sql import functions as F

from xutil_spark.kernels.tiles import wgs2tile
from xutil_spark.operators.flows import od_flows
from xutil_spark.operators.hotspot import mann_kendall_cells

# four z5-distinct locations (cell centers far apart)
_LOCS = {
    "A": (10.0, 10.0),
    "B": (40.0, 10.0),
    "C": (40.0, 40.0),
    "D": (-100.0, -20.0),
}


def _trail(spark, moves):
    """moves: list of (user, [loc letters]) → events df with 1-minute
    spacing per user."""
    rows = []
    eid = 0
    for user, letters in moves:
        for i, L in enumerate(letters):
            lon, lat = _LOCS[L]
            rows.append((eid, user,
                         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                         lon, lat))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, lon double, lat double")


def _cell(letter, z=5):
    lon, lat = _LOCS[letter]
    x, y = wgs2tile(lon, lat, z)
    return z * (1 << 58) + x * (1 << 29) + y


def test_od_flows_counts_and_self_loop_drop(spark):
    ev = _trail(spark, [
        (1, ["A", "B", "B", "C"]),   # A→B, B→B (dropped), B→C
        (2, ["A", "B"]),             # A→B
        (3, ["C", "A"]),             # C→A
    ])
    out = {(r.from_cell, r.to_cell): (r.n_moves, r.n_entities)
           for r in od_flows(ev, 5, tiebreak="event_id").collect()}
    assert out == {
        (_cell("A"), _cell("B")): (2, 2),
        (_cell("B"), _cell("C")): (1, 1),
        (_cell("C"), _cell("A")): (1, 1),
    }


def test_od_flows_self_loops_and_min_count(spark):
    ev = _trail(spark, [(1, ["A", "A", "B"]), (2, ["A", "B"])])
    with_loops = {(r.from_cell, r.to_cell): r.n_moves
                  for r in od_flows(ev, 5, self_loops=True,
                                    tiebreak="event_id").collect()}
    assert with_loops[(_cell("A"), _cell("A"))] == 1
    pruned = od_flows(ev, 5, tiebreak="event_id", min_count=2).collect()
    assert {(r.from_cell, r.to_cell) for r in pruned} == {
        (_cell("A"), _cell("B"))}


def test_od_flows_tiebreak_orders_equal_timestamps(spark):
    # two events at the SAME ts: event_id must decide the order
    t = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(2, 1, t, *_LOCS["B"]), (1, 1, t, *_LOCS["A"]),
         (3, 1, t + dt.timedelta(minutes=1), *_LOCS["C"])],
        "event_id long, user_id long, ts timestamp, lon double, lat double")
    out = {(r.from_cell, r.to_cell) for r in
           od_flows(ev, 5, tiebreak="event_id").collect()}
    assert out == {(_cell("A"), _cell("B")), (_cell("B"), _cell("C"))}


# ------------------------------------------------------- Mann-Kendall

def _mk_expected(counts):
    """Pure-Python MK replay over one cell's dense bin counts."""
    n = len(counts)
    s = sum(
        (cj > ci) - (cj < ci)
        for (ci, cj) in itertools.combinations(counts, 2)
    )
    ties = {}
    for c in counts:
        ties[c] = ties.get(c, 0) + 1
    tsum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tsum
    if var18 <= 0:
        z = None
    elif s == 0:
        z = 0.0
    else:
        z = round((s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0), 6)
    return s, var18, z


def _mk_events(spark, per_bin, lon=10.0, lat=10.0, eid0=0):
    """One event row per count unit; bin i occupies second i of a
    len(per_bin)-second frame (n_bins == len(per_bin) ⇒ bin i == i)."""
    rows = []
    eid = eid0
    for i, c in enumerate(per_bin):
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1, 0, 0, i), lon, lat))
            eid += 1
    return rows


def test_mann_kendall_monotone_and_tied(spark):
    inc = [1, 2, 3, 4, 5]          # strictly increasing: S = C(5,2) = 10
    flat = [3, 3, 3, 3, 3]         # all tied: var18 = 0 → z NULL
    rows = _mk_events(spark, inc, lon=10.0) + \
        _mk_events(spark, flat, lon=40.0, eid0=1000)
    # pad both frames' ends so the global frame is exactly 5 seconds
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, lon double, lat double")
    out = {r.cell: (r.cnt, r.s, r.var18, r.z)
           for r in mann_kendall_cells(ev, 5, n_bins=5).collect()}
    assert len(out) == 2
    (ci, ei), (cf, ef) = (( _cellf(10.0), _mk_expected(inc)),
                          (_cellf(40.0), _mk_expected(flat)))
    assert out[ci] == (sum(inc), ei[0], ei[1], ei[2])
    assert out[cf][1:] == (ef[0], ef[1], None)


def _cellf(lon, lat=10.0, z=5):
    x, y = wgs2tile(lon, lat, z)
    return z * (1 << 58) + x * (1 << 29) + y


def test_mann_kendall_zero_fill_and_sign(spark):
    # occupied only in late bins: zeros in early bins are SIGNAL
    late = [0, 0, 0, 2, 5]
    rows = _mk_events(spark, late, lon=10.0)
    # anchor the frame ends with a second cell active in bins 0 and 4
    rows += _mk_events(spark, [1, 0, 0, 0, 1], lon=40.0, eid0=500)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, lon double, lat double")
    out = {r.cell: (r.cnt, r.s, r.var18, r.z)
           for r in mann_kendall_cells(ev, 5, n_bins=5).collect()}
    e = _mk_expected(late)
    assert out[_cellf(10.0)] == (sum(late), e[0], e[1], e[2])
    assert out[_cellf(10.0)][1] > 0  # rising trend
    e2 = _mk_expected([1, 0, 0, 0, 1])
    assert out[_cellf(40.0)] == (2, e2[0], e2[1], e2[2])


def test_mann_kendall_decreasing_matches_replay(spark):
    dec = [7, 5, 5, 2, 1, 0, 0, 1, 0, 0]
    rows = _mk_events(spark, dec, lon=10.0)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, lon double, lat double")
    # frame: ts spans seconds 0..9 because dec has events at 0 and 7;
    # bins 8, 9 are empty ONLY if the frame reaches them — it doesn't
    # (max ts is second 7), so replay over the REALIZED frame instead
    span = max(i for i, c in enumerate(dec) if c) + 1
    width = span  # seconds 0..span-1, width = span
    # recompute the realized bin of each original second under
    # bin = (sec * 10) div width
    realized = [0] * 10
    for i, c in enumerate(dec):
        if c:
            realized[(i * 10) // width] += c
    e = _mk_expected(realized)
    out = {r.cell: (r.cnt, r.s, r.var18, r.z)
           for r in mann_kendall_cells(ev, 5, n_bins=10).collect()}
    assert out[_cellf(10.0)] == (sum(dec), e[0], e[1], e[2])


# ------------------------------------------------------ track resample

def _rs_replay(fixes, dt):
    """fixes: [(e, lon, lat)] sorted. Pure-Python resample replay."""
    t0 = min(e for e, _, _ in fixes)
    out = {}
    for i, (e, lo, la) in enumerate(fixes):
        nxt = fixes[i + 1] if i + 1 < len(fixes) else None
        klo = -((-(e - t0)) // dt)  # ceil for non-negatives
        if nxt is not None:
            khi = (nxt[0] - t0 - 1) // dt
        else:
            khi = klo if (e - t0) % dt == 0 else klo - 1
        for k in range(klo, khi + 1):
            tk = t0 + k * dt
            if nxt is not None and nxt[0] > e:
                fr = (tk - e) / (nxt[0] - e)
            else:
                fr = 0.0
            l2, a2 = (nxt[1], nxt[2]) if nxt else (lo, la)
            out[k] = (tk, round(lo + (l2 - lo) * fr, 6),
                      round(la + (a2 - la) * fr, 6))
    return out


def test_resample_matches_replay_and_grid_rules(spark):
    from xutil_spark.operators.trajectory import resample_tracks

    fixes = [(0, 10.0, 20.0), (100, 11.0, 21.0), (250, 11.0, 25.0),
             (600, 15.0, 25.0)]
    rows = [(1, dt.datetime.fromtimestamp(e, dt.timezone.utc)
             .replace(tzinfo=None), lo, la) for e, lo, la in fixes]
    df = spark.createDataFrame(
        rows, "traj_id long, ts timestamp, lon double, lat double")
    got = {r.k: (r.t_epoch % 10**9, r.lon, r.lat)
           for r in resample_tracks(df, 100, traj_col="traj_id").collect()}
    exp = _rs_replay([(e, lo, la) for e, lo, la in fixes], 100)
    # replay uses raw epochs; engine got absolute epochs — compare mod
    exp = {k: (t % 10**9, lo, la) for k, (t, lo, la) in exp.items()}
    assert got == exp
    # the final fix at 600 is on the 100s grid → k=6 sampled exactly
    assert got[6][1:] == (15.0, 25.0)


def test_resample_off_grid_tail_dropped(spark):
    from xutil_spark.operators.trajectory import resample_tracks

    fixes = [(0, 0.0, 0.0), (150, 3.0, 3.0)]
    rows = [(1, dt.datetime.fromtimestamp(e, dt.timezone.utc)
             .replace(tzinfo=None), lo, la) for e, lo, la in fixes]
    df = spark.createDataFrame(
        rows, "traj_id long, ts timestamp, lon double, lat double")
    ks = sorted(r.k for r in
                resample_tracks(df, 100, traj_col="traj_id").collect())
    # samples at k=0 (t=0) and k=1 (t=100, interpolated); t=200 would
    # extrapolate past the last fix at 150 → absent
    assert ks == [0, 1]


def test_track_speed_stats_replay(spark):
    from xutil_spark.functions.native import haversine_m  # noqa: F401
    from xutil_spark.operators.trajectory import track_speed_stats

    # fixes: (epoch, lon, lat) — includes a duplicate-timestamp pair
    fixes = [(0, 10.0, 20.0), (100, 10.1, 20.0), (100, 10.2, 20.0),
             (400, 10.2, 20.3)]
    rows = [(1, dt.datetime.fromtimestamp(e, dt.timezone.utc)
             .replace(tzinfo=None), lo, la) for e, lo, la in fixes]
    df = spark.createDataFrame(
        rows, "traj_id long, ts timestamp, lon double, lat double")
    r = track_speed_stats(df, traj_col="traj_id").collect()[0]

    def hav(lo1, la1, lo2, la2):
        rad = math.pi / 180.0
        dla, dlo = (la2 - la1) * rad, (lo2 - lo1) * rad
        a = (math.sin(dla / 2) ** 2 + math.sin(dlo / 2) ** 2
             * math.cos(la1 * rad) * math.cos(la2 * rad))
        return 2.0 * 6371000.0 * math.atan2(math.sqrt(a),
                                            math.sqrt(1.0 - a))

    mm = [round(hav(*fixes[i][1:], *fixes[i + 1][1:]) * 1000)
          for i in range(3)]
    dts = [100, 0, 300]
    assert (r.n_fixes, r.n_segs) == (4, 3)
    assert r.dist_m == round(sum(mm) / 1000.0, 3)
    # the zero-duration segment contributes distance but no speed
    moving_mm = mm[0] + mm[2]
    assert r.avg_speed_mps == round((moving_mm / 1000.0) / 400.0, 6)
    assert r.max_speed_mps == round(
        max(mm[0] / 1000.0 / 100.0, mm[2] / 1000.0 / 300.0), 6)


def test_track_speed_single_fix_nulls(spark):
    from xutil_spark.operators.trajectory import track_speed_stats

    df = spark.createDataFrame(
        [(7, dt.datetime(2024, 1, 1), 10.0, 20.0)],
        "traj_id long, ts timestamp, lon double, lat double")
    r = track_speed_stats(df, traj_col="traj_id").collect()[0]
    assert (r.n_fixes, r.n_segs, r.dist_m) == (1, 0, 0.0)
    assert r.max_speed_mps is None and r.avg_speed_mps is None


def _fix_df(spark, fixes):
    """fixes: (traj, epoch, lon, lat) rows → df."""
    rows = [(tr, dt.datetime.fromtimestamp(e, dt.timezone.utc)
             .replace(tzinfo=None), lo, la) for tr, e, lo, la in fixes]
    return spark.createDataFrame(
        rows, "traj_id long, ts timestamp, lon double, lat double")


def test_segment_trips_gap_split(spark):
    from xutil_spark.operators.trajectory import segment_trips

    # track 1: 3 fixes, gap of 5000s between fix 2 and 3 → two trips
    df = _fix_df(spark, [
        (1, 0, 10.0, 20.0), (1, 100, 10.1, 20.0), (1, 5100, 10.2, 20.0),
        (2, 0, 50.0, 0.0),
    ])
    out = {(r.traj_id, r.trip_id): r
           for r in segment_trips(df, max_gap_s=1800).collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    t11, t12, t2 = out[(1, 1)], out[(1, 2)], out[(2, 1)]
    assert (t11.n_fixes, t11.duration_s) == (2, 100)
    assert (t12.n_fixes, t12.duration_s) == (1, 0)
    assert t12.dist_m == 0.0  # boundary gap segment is not counted
    assert (t2.n_fixes, t2.dist_m) == (1, 0.0)

    def hav(lo1, la1, lo2, la2):
        rad = math.pi / 180.0
        a = (math.sin((la2 - la1) * rad / 2) ** 2
             + math.sin((lo2 - lo1) * rad / 2) ** 2
             * math.cos(la1 * rad) * math.cos(la2 * rad))
        return 12742000.0 * math.atan2(math.sqrt(a), math.sqrt(1 - a))

    assert t11.dist_m == round(round(hav(10.0, 20.0, 10.1, 20.0) * 1000)
                               / 1000.0, 3)


def test_detect_stays_runs_and_centroid(spark):
    from xutil_spark.operators.trajectory import detect_stays

    # 3 fixes ~55m apart (0.0005 deg lon at lat 0) dwelling 2000s, then
    # a 1-degree jump, then a single far fix (dwell 0 → filtered)
    df = _fix_df(spark, [
        (1, 0, 10.0, 0.0), (1, 1000, 10.0005, 0.0), (1, 2000, 10.001, 0.0),
        (1, 3000, 11.0, 0.0),
    ])
    rows = detect_stays(df, stay_jump_m=200.0, min_stay_s=900).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_fixes, r.dwell_s) == (3, 2000)
    # centroid: integer micro-degree mean with half-away rounding
    assert r.ctr_lon == ((10000000 + 10000500 + 10001000) * 2 + 3) // 6 / 1e6
    assert r.ctr_lat == 0.0


def test_detect_stays_half_tie_rounding(spark):
    from xutil_spark.operators.trajectory import detect_stays

    # two fixes whose micro-degree sum is odd → mean sits exactly on
    # x.5 micro-degrees; integer half-away rounding must go UP
    df = _fix_df(spark, [(1, 0, 10.000001, 0.0), (1, 1000, 10.000002, 0.0)])
    r = detect_stays(df, stay_jump_m=200.0, min_stay_s=0).collect()[0]
    assert r.ctr_lon == 10.000002  # (20000003*2+2)//4 = 10000002

    # negative lon tie rounds away from zero (down)
    dfn = _fix_df(spark, [(1, 0, -10.000001, 0.0), (1, 1000, -10.000002, 0.0)])
    rn = detect_stays(dfn, stay_jump_m=200.0, min_stay_s=0).collect()[0]
    assert rn.ctr_lon == -10.000002


def test_bearing_east_track(spark):
    from xutil_spark.operators.trajectory import track_bearing_stats

    # due-east along the equator: both bearings exactly 90°
    df = _fix_df(spark, [(1, 0, 10.0, 0.0), (1, 100, 10.1, 0.0),
                         (1, 200, 10.2, 0.0)])
    r = track_bearing_stats(df, traj_col="traj_id").collect()[0]
    assert (r.n_fixes, r.n_segs, r.n_turns) == (3, 2, 1)
    assert r.mean_heading_deg == 90.0
    assert r.resultant_r == 1.0
    assert r.sum_abs_turn_deg == 0.0

    def hav_mm(lo1, la1, lo2, la2):
        rad = math.pi / 180.0
        a = (math.sin((la2 - la1) * rad / 2) ** 2
             + math.sin((lo2 - lo1) * rad / 2) ** 2
             * math.cos(la1 * rad) * math.cos(la2 * rad))
        return round(12742000.0 * math.atan2(math.sqrt(a),
                                             math.sqrt(1 - a)) * 1000)

    path = hav_mm(10.0, 0, 10.1, 0) + hav_mm(10.1, 0, 10.2, 0)
    net = hav_mm(10.0, 0, 10.2, 0)
    assert r.straightness == round(net / path, 6)


def test_bearing_right_angle_turn(spark):
    from xutil_spark.operators.trajectory import track_bearing_stats

    # east then north: bearings 90° and 0°, |turn| = 90°, mean 45°
    df = _fix_df(spark, [(1, 0, 0.0, 0.0), (1, 100, 0.1, 0.0),
                         (1, 200, 0.1, 0.1)])
    r = track_bearing_stats(df, traj_col="traj_id").collect()[0]
    assert r.sum_abs_turn_deg == 90.0
    assert r.mean_heading_deg == 45.0
    assert r.resultant_r == round(math.sqrt(2.0) / 2.0, 6)


def test_bearing_stationary_and_single(spark):
    from xutil_spark.operators.trajectory import track_bearing_stats

    # duplicate fix: no moving segment → circular fields NULL; the
    # zero-length segment must not break a later turn chain
    df = _fix_df(spark, [(1, 0, 10.0, 20.0), (1, 100, 10.0, 20.0),
                         (2, 0, 5.0, 5.0)])
    out = {r.traj_id: r for r in
           track_bearing_stats(df, traj_col="traj_id").collect()}
    r1, r2 = out[1], out[2]
    assert (r1.n_fixes, r1.n_segs) == (2, 0)
    assert r1.mean_heading_deg is None and r1.resultant_r is None
    assert r1.straightness is None
    assert (r2.n_fixes, r2.n_segs) == (1, 0)


def test_bearing_turn_chain_skips_zero_segment(spark):
    from xutil_spark.operators.trajectory import track_bearing_stats

    # east, STATIONARY, north: turn still links the two real bearings
    df = _fix_df(spark, [(1, 0, 0.0, 0.0), (1, 100, 0.1, 0.0),
                         (1, 200, 0.1, 0.0), (1, 300, 0.1, 0.1)])
    r = track_bearing_stats(df, traj_col="traj_id").collect()[0]
    assert (r.n_segs, r.n_turns) == (2, 1)
    assert r.sum_abs_turn_deg == 90.0


def test_dev_ellipse_axis_line(spark):
    from xutil_spark.operators.flows import deviational_ellipse

    # colinear along the x axis: θ = 0 (degenerate-C branch, cxx ≥ cyy),
    # all variance in the rotated-x axis
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 1.0, 0.0), (1, 2.0, 0.0)],
        "user_id long, lon double, lat double")
    r = deviational_ellipse(df, group="user_id").collect()[0]
    assert (r.n, r.ctr_lon, r.ctr_lat, r.angle_deg) == (3, 1.0, 0.0, 0.0)
    cxx = 5e12 - 9e12 / 3.0
    assert r.sigma_x == round(math.sqrt(2.0) * math.sqrt(cxx / 3.0) / 1e6, 6)
    assert r.sigma_y == 0.0


def test_dev_ellipse_45_degree_line(spark):
    from xutil_spark.operators.flows import deviational_ellipse

    # colinear along the 45° diagonal: θ = 45°, the rotated-x variance
    # vanishes and the rotated-y axis carries the spread
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 1.0, 1.0), (1, 2.0, 2.0)],
        "user_id long, lon double, lat double")
    r = deviational_ellipse(df, group="user_id").collect()[0]
    assert r.angle_deg == 45.0
    assert r.sigma_x == 0.0
    sy2 = 4e12 / 3.0
    assert r.sigma_y == round(math.sqrt(2.0) * math.sqrt(sy2) / 1e6, 6)


def test_dev_ellipse_single_point(spark):
    from xutil_spark.operators.flows import deviational_ellipse

    df = spark.createDataFrame([(7, 10.5, -3.25)],
                               "user_id long, lon double, lat double")
    r = deviational_ellipse(df, group="user_id").collect()[0]
    assert (r.n, r.ctr_lon, r.ctr_lat) == (1, 10.5, -3.25)
    assert (r.sigma_x, r.sigma_y) == (0.0, 0.0)


def _py_gravity(pairs, zoom, q_scale=1e6):
    """Independent replay of gravity_flows: dict (f,t) -> n_moves →
    dict (f,t) -> (expected, ratio)."""
    from xutil_spark.kernels.tiles import cell_decode

    def center(cell):
        import numpy as np

        x, y, z = cell_decode(np.int64(cell))
        n = 2.0 ** int(z)
        lon = (float(x) + 0.5) / n * 360.0 - 180.0
        m = math.pi - 2.0 * math.pi * (float(y) + 0.5) / n
        lat = math.degrees(math.atan(0.5 * (math.exp(m) - math.exp(-m))))
        return lon, lat

    def hav_km(p, q):
        (lo1, la1), (lo2, la2) = p, q
        dla = math.radians(la2 - la1)
        dlo = math.radians(lo2 - lo1)
        a = (math.sin(dla / 2) ** 2
             + math.sin(dlo / 2) ** 2 * math.cos(math.radians(la1))
             * math.cos(math.radians(la2)))
        return 2 * 6371000.0 * math.atan2(math.sqrt(a),
                                          math.sqrt(1 - a)) / 1000.0

    out_o, in_d, total = {}, {}, 0
    for (f, t), n in pairs.items():
        out_o[f] = out_o.get(f, 0) + n
        in_d[t] = in_d.get(t, 0) + n
        total += n
    gq = {}
    for (f, t), n in pairs.items():
        d = hav_km(center(f), center(t))
        gq[(f, t)] = round(out_o[f] * in_d[t] / (d * d) * q_scale)
    sg = sum(gq.values())
    out = {}
    for k in pairs:
        exp = total * gq[k] / sg
        out[k] = (exp, pairs[k] / exp if exp > 0 else None)
    return out


def test_gravity_flows_matches_python_replay(spark):
    from xutil_spark.kernels.tiles import cell_pack
    from xutil_spark.operators.flows import gravity_flows

    z = 5
    A = int(cell_pack(10, 10, z))
    B = int(cell_pack(11, 10, z))
    C = int(cell_pack(13, 13, z))
    pairs = {(A, B): 10, (A, C): 5, (B, C): 5, (C, A): 2}
    df = spark.createDataFrame(
        [(f, t, n) for (f, t), n in pairs.items()],
        "from_cell long, to_cell long, n_moves long")
    got = {(r.from_cell, r.to_cell): r
           for r in gravity_flows(df, z).collect()}
    want = _py_gravity(pairs, z)
    assert set(got) == set(pairs)
    # marginals are exact integers
    assert got[(A, B)].out_o == 15 and got[(A, B)].in_d == 10
    assert got[(C, A)].out_o == 2 and got[(C, A)].in_d == 2
    for k, (exp, ratio) in want.items():
        assert got[k].expected == round(exp, 6)
        # a quantization-underflow pair (gq = 0) has NULL ratio
        assert got[k].ratio == (round(ratio, 6) if ratio is not None else None)


def test_gravity_expected_sums_to_total(spark):
    from xutil_spark.kernels.tiles import cell_pack
    from xutil_spark.operators.flows import gravity_flows

    z = 5
    cells = [int(cell_pack(8 + i, 9 + (i * 3) % 5, z)) for i in range(5)]
    pairs = {(cells[i], cells[j]): 3 + i + 2 * j
             for i in range(5) for j in range(5) if i != j}
    df = spark.createDataFrame(
        [(f, t, n) for (f, t), n in pairs.items()],
        "from_cell long, to_cell long, n_moves long")
    rows = gravity_flows(df, z).collect()
    total = sum(pairs.values())
    # the total-flow constraint: Σ expected = T up to quantization
    assert sum(r.expected for r in rows) == pytest.approx(total, rel=1e-6)


def test_gravity_flows_self_loop_yields_null_not_ansi_error(spark):
    """Regression: a from_cell == to_cell flow has d_km = 0; the
    gravity division must produce NULL (try_divide), not a
    DIVIDE_BY_ZERO abort under Spark's default ANSI mode."""
    from xutil_spark.kernels.tiles import cell_pack
    from xutil_spark.operators.flows import gravity_flows

    z = 5
    A = int(cell_pack(10, 10, z))
    B = int(cell_pack(11, 10, z))
    df = spark.createDataFrame(
        [(A, A, 4), (A, B, 6)],
        "from_cell long, to_cell long, n_moves long")
    got = {(r.from_cell, r.to_cell): r for r in gravity_flows(df, z).collect()}
    assert got[(A, A)].expected is None and got[(A, A)].ratio is None
    assert got[(A, B)].expected is not None


def test_resample_duplicate_leading_timestamps_single_k0(spark):
    """A duplicate timestamp at track start spans the empty interval
    [t, t) and must not double-emit k=0 (the `div`-truncation trap)."""
    import pandas as pd

    from xutil_spark.operators.trajectory import resample_tracks

    df = spark.createDataFrame(pd.DataFrame({
        "traj_id": [1, 1, 1],
        "ts": pd.to_datetime([1000, 1000, 1600], unit="s"),
        "lon": [10.0, 10.0, 11.0],
        "lat": [20.0, 20.0, 21.0],
    }))
    rows = resample_tracks(df, interval_s=300).collect()
    ks = sorted(r.k for r in rows)
    assert ks == [0, 1, 2]
