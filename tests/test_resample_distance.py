"""Distance-domain track resampling (operators/trajectory.py
resample_by_distance)."""

import math

import pandas as pd

from xutil_spark.operators.trajectory import resample_by_distance


def _hav_m(lon1, lat1, lon2, lat2):
    """Mirror of functions.native.haversine_m (gis.go:195-206 form)."""
    sdlat = math.sin((lat2 - lat1) * math.pi / 360.0)
    sdlon = math.sin((lon2 - lon1) * math.pi / 360.0)
    a = sdlat * sdlat + sdlon * sdlon * math.cos(lat1 * math.pi / 180.0) \
        * math.cos(lat2 * math.pi / 180.0)
    return 2.0 * 6371000.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))


def _replay(fixes, step_mm):
    """Scalar replay of the documented integer-mm bracket scheme."""
    out = []
    c0 = 0
    for i, (lo, la) in enumerate(fixes):
        nxt = fixes[i + 1] if i + 1 < len(fixes) else None
        dmm = int(round(_hav_m(lo, la, nxt[0], nxt[1]) * 1000.0)) if nxt else 0
        cend = c0 + dmm
        klo = (c0 + step_mm - 1) // step_mm
        if nxt is not None:
            khi = (cend - 1) // step_mm
        else:
            khi = klo if c0 % step_mm == 0 else klo - 1
        for k in range(klo, khi + 1):
            s = k * step_mm
            frac = (s - c0) / (cend - c0) if nxt and cend > c0 else 0.0
            l2 = nxt[0] if nxt else lo
            a2 = nxt[1] if nxt else la
            out.append((k, s, round(lo + (l2 - lo) * frac, 6),
                        round(la + (a2 - la) * frac, 6)))
        c0 = cend
    return out


def _run(spark, fixes, step_m):
    df = spark.createDataFrame(pd.DataFrame({
        "traj_id": [1] * len(fixes),
        "ts": pd.to_datetime(
            [1_700_000_000 + 60 * i for i in range(len(fixes))], unit="s"),
        "lon": [f[0] for f in fixes],
        "lat": [f[1] for f in fixes],
    }))
    rows = (resample_by_distance(df, step_m=step_m)
            .orderBy("k").collect())
    return [(r.k, r.s_mm, r.lon, r.lat) for r in rows]


def test_straight_equator_track_matches_replay(spark):
    fixes = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)]
    got = _run(spark, fixes, 50_000.0)
    assert got == _replay(fixes, 50_000_000)
    # samples are dense in k starting at 0
    ks = [g[0] for g in got]
    assert ks == list(range(len(ks)))
    # first sample sits exactly on the first fix
    assert got[0][2:] == (0.0, 0.0)


def test_duplicate_fixes_emit_no_duplicate_samples(spark):
    fixes = [(10.0, 20.0), (10.0, 20.0), (10.5, 20.0), (10.5, 20.0),
             (11.0, 20.0)]
    got = _run(spark, fixes, 20_000.0)
    assert got == _replay(fixes, 20_000_000)
    assert len({g[0] for g in got}) == len(got)


def test_single_fix_track_emits_origin_sample(spark):
    got = _run(spark, [(100.0, 30.0)], 1_000.0)
    assert got == [(0, 0, 100.0, 30.0)]


def test_multi_track_independence(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "traj_id": [1, 1, 2, 2],
        "ts": pd.to_datetime([0, 60, 0, 60], unit="s"),
        "lon": [0.0, 2.0, 50.0, 52.0],
        "lat": [0.0, 0.0, 10.0, 10.0],
    }))
    rows = resample_by_distance(df, step_m=100_000.0).collect()
    per = {}
    for r in rows:
        per.setdefault(r.traj_id, []).append(r.k)
    assert set(per) == {1, 2}
    for ks in per.values():
        assert sorted(ks) == list(range(len(ks)))


def test_geodesic_bows_poleward_and_agrees_at_fixes(spark):
    import pandas as pd

    from xutil_spark.operators.trajectory import resample_by_distance

    df = spark.createDataFrame(pd.DataFrame({
        "traj_id": [1, 1],
        "ts": pd.to_datetime([0, 600], unit="s"),
        "lon": [0.0, 60.0],
        "lat": [50.0, 50.0],
    }))
    flat = {r.k: r for r in resample_by_distance(df, 500_000.0).collect()}
    gc = {r.k: r for r in resample_by_distance(
        df, 500_000.0, geodesic=True).collect()}
    assert set(flat) == set(gc)
    # both start exactly at the first fix
    assert (flat[0].lon, flat[0].lat) == (0.0, 50.0)
    assert (gc[0].lon, gc[0].lat) == (0.0, 50.0)
    # the great circle between two 50°N points runs NORTH of 50°
    mid = max(gc) // 2
    assert gc[mid].lat > 50.5
    assert flat[mid].lat == 50.0
