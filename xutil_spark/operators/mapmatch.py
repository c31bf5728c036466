"""HMM map matching: snap whole TRACKS to the road network with a
Viterbi decode (Newson & Krumm 2009 shape), not each point greedily.

``snap_to_segments`` (spatial_join.py) is the point-wise primitive —
nearest segment per point.  Sequence-aware matching is the flagship
trajectory operator on top of it: each point gets K CANDIDATE
segments; emission weight favors close candidates, transition weight
favors consecutive snaps whose along-network displacement agrees with
the raw GPS displacement; the per-track Viterbi picks the jointly most
plausible segment sequence (greedy nearest can zig-zag across parallel
roads; the HMM cannot).

Determinism contract (what makes this oracle-checkable): every score
is QUANTIZED before entering the DP —

* candidate ``dist_m``/``t``/``snap_*`` are the rounded (3 dp / 6 dp)
  outputs of the same closed-form clamped equirectangular projection
  as ``snap_to_segments`` (proven JVM↔SQL-identical by the
  `snap_nearest_segment` driver row);
* emission ``= round(−0.5·(dist_m/σ)², 6)``;
* transition ``= round(−|route − direct|/β, 6)`` with route/direct the
  equirectangular meters between the (rounded) snap points / raw
  points;
* ties in the running max break toward the LOWEST candidate index,
  candidates ordered by ``(dist_m, seg_id)``.

With quantized inputs, float summation order is the only freedom left,
and both the engine and any scalar replay add ``score + transition +
emission`` left to right — so the decode is bit-reproducible.

Engine shape: candidate generation is one broadcast supercover
equi-join + a per-point top-K window (fact side: 1 cell encode + ring
explode, 1 shuffle for the rank); the Viterbi is ONE shuffle keyed by
track + a ``mapInPandas`` that packs every track in the partition
into a single padded (tracks, steps, K) tensor and walks the step
axis once with partition-wide elementwise ops — per-partition cost
O(points · K²) numpy with no per-track pandas overhead, no Python in
the candidate hot path.

100-TB story: identical to the snap join's (the candidate stage IS the
snap join minus the final min), plus one shuffle keyed by track id;
track groups are bounded (a device's pings), so no skew beyond what
AQE handles.

Reference scope: engine addition beyond xvill/xutil — extends the
reference's point kernels (gis.go:184-249) the same way knn/snap do
(SURVEY §2.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xutil_spark.operators.spatial_join import (
    _explode_neighbors,
    _M_PER_DEG,
    _ring_guarantee_m,
    _segments_with_cells,
    with_cell,
)

# largest segment count whose exploded supercover is still safely
# broadcastable (~500k segs × ~3 cells × ~60 B ≈ 90 MB)
_BCAST_MAX_SEGS = 500_000

MATCH_SCHEMA = T.StructType([
    T.StructField("track_id", T.LongType(), False),
    T.StructField("point_id", T.LongType(), False),
    T.StructField("seg_id", T.LongType(), False),
    T.StructField("dist_m", T.DoubleType(), False),
    T.StructField("t", T.DoubleType(), False),
    T.StructField("snap_lon", T.DoubleType(), False),
    T.StructField("snap_lat", T.DoubleType(), False),
])


def candidate_segments(
    points: DataFrame,
    segments: DataFrame,
    radius_m: float,
    k: int = 3,
    zoom: int = 8,
    point_id: str = "pid",
    seg_id: str = "seg_id",
    lon: str = "lon",
    lat: str = "lat",
    ax: str = "ax",
    ay: str = "ay",
    bx: str = "bx",
    by: str = "by",
    max_abs_lat: float = 60.0,
    extra_cols: tuple = (),
    broadcast_segs: bool = True,
) -> DataFrame:
    """Top-``k`` segments within ``radius_m`` of each point, scored by
    the snap projection: ``(point_id, [extra_cols...], rank, seg_id,
    dist_m, t, snap_lon, snap_lat)``.  Exact: the ring is sized so the
    static guarantee covers the radius (the snap coarse-pass bound).
    ``extra_cols`` (e.g. track id / timestamp) pass through.

    ``broadcast_segs=False`` switches the supercover join to a shuffle
    join — required when the exploded segment×cell table is not
    dim-sized (e.g. a 10^7-segment road network would blow the
    broadcast limit); same knob and reasoning as
    ``snap_to_segments``."""
    ring = 1
    while _ring_guarantee_m(zoom, ring, max_abs_lat=max_abs_lat) < radius_m * 1.05:
        ring += 1
        if ring > 64:
            raise ValueError("radius too large for this zoom; lower the zoom")

    segs = _segments_with_cells(segments, zoom, seg_id, ax, ay, bx, by)
    pc = with_cell(points, zoom, lon, lat, out="_ccell")
    seg_dim = F.broadcast(segs) if broadcast_segs else segs
    cand = (
        _explode_neighbors(pc, F.col("_ccell"), zoom, ring, out="_cncell")
        .join(seg_dim, F.col("_cncell") == F.col("_scell"), "inner")
    )
    kc = F.lit(_M_PER_DEG)
    kx = kc * F.cos(F.radians(F.col(lat)))
    axm = (F.col("_sax") - F.col(lon)) * kx
    aym = (F.col("_say") - F.col(lat)) * kc
    bxm = (F.col("_sbx") - F.col(lon)) * kx
    bym = (F.col("_sby") - F.col(lat)) * kc
    ux = bxm - axm
    uy = bym - aym
    len2 = ux * ux + uy * uy
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), -(axm * ux + aym * uy) / len2))
    )
    qx = axm + t * ux
    qy = aym + t * uy
    scored = cand.select(
        point_id, *extra_cols, lon, lat,
        F.col("_sid").alias(seg_id),
        F.round(F.sqrt(qx * qx + qy * qy), 3).alias("dist_m"),
        F.round(t, 6).alias("t"),
        F.round(F.col(lon) + qx / kx, 6).alias("snap_lon"),
        F.round(F.col(lat) + qy / kc, 6).alias("snap_lat"),
    ).filter(F.col("dist_m") <= F.lit(float(radius_m)))
    # ONE shuffle does dedup + top-K: the ring join can surface a
    # segment via several neighbor cells, but its scored struct is
    # identical each time, so collect_set dedups exactly; array_sort
    # on the struct orders by (dist_m, seg_id) lexicographically — the
    # deterministic rank key — and slice keeps k.  (A dropDuplicates +
    # row_number window would spend two shuffles on the same result.)
    cand_struct = F.struct(
        F.col("dist_m"), F.col(seg_id), F.col("t"),
        F.col("snap_lon"), F.col("snap_lat"))
    agg = (
        scored.groupBy(point_id, *extra_cols, lon, lat)
        .agg(F.slice(F.array_sort(F.collect_set(cand_struct)), 1, k)
             .alias("_cand"))
    )
    return agg.select(
        point_id, *extra_cols, lon, lat,
        F.posexplode("_cand").alias("_pos", "_c"),
    ).select(
        point_id, *extra_cols, lon, lat,
        F.col(f"_c.{seg_id}").alias(seg_id),
        F.col("_c.dist_m").alias("dist_m"),
        F.col("_c.t").alias("t"),
        F.col("_c.snap_lon").alias("snap_lon"),
        F.col("_c.snap_lat").alias("snap_lat"),
        (F.col("_pos") + 1).alias("rank"),
    )


def candidate_segments_np(
    points: DataFrame,
    segments: DataFrame,
    radius_m: float,
    k: int = 3,
    point_id: str = "pid",
    seg_id: str = "seg_id",
    lon: str = "lon",
    lat: str = "lat",
    ax: str = "ax",
    ay: str = "ay",
    bx: str = "bx",
    by: str = "by",
    extra_cols: tuple = (),
    pair_chunk: int = 524_288,
) -> DataFrame:
    """``candidate_segments`` against a **dim-sized** network with ZERO
    shuffles — the ``snap_to_segments_np`` pattern with a top-K tail.

    Why it exists: the cell path's candidate join multiplies (points ×
    ring cells × segments-per-cell).  A network of LONG segments makes
    segments-per-cell large (every random chord crosses many cells), so
    a dim-scale-but-long-segment network can explode the join stream to
    10⁸ rows while the network itself is a few-MB broadcast.  Here the
    id-sorted segments ship once per worker via ``sc.broadcast`` and
    the points stream through ONE ``mapInPandas``; per point the snap
    projection scores every segment in cache-sized numpy chunks and a
    STABLE argsort on the mm-rounded distance yields exactly the cell
    path's (dist_m, seg_id) candidate order (ties fall back to array
    position = ascending seg_id).  Exhaustive, so no ring guarantee is
    needed; output rows/values are the cell path's bit-for-bit (pinned
    by pytest).

    Scale boundary: brute cost is points × segments — for dim-scale
    networks only; real road networks (10^8 segments) keep the cell
    path.  ``hmm_map_match(strategy="auto")`` gates on segment count.
    """
    import pandas as pd

    from xutil_spark.kernels.rounding import round_half_away

    seg_pd = (segments.select(seg_id, ax, ay, bx, by).toPandas()
              .sort_values(seg_id, kind="stable"))
    segs_np = (seg_pd[seg_id].to_numpy(),
               seg_pd[ax].to_numpy(np.float64),
               seg_pd[ay].to_numpy(np.float64),
               seg_pd[bx].to_numpy(np.float64),
               seg_pd[by].to_numpy(np.float64))
    bc = points.sparkSession.sparkContext.broadcast(segs_np)

    out_schema = T.StructType([
        points.schema[point_id],
        *[points.schema[c] for c in extra_cols],
        points.schema[lon],
        points.schema[lat],
        T.StructField(seg_id, segments.schema[seg_id].dataType, True),
        T.StructField("dist_m", T.DoubleType(), True),
        T.StructField("t", T.DoubleType(), True),
        T.StructField("snap_lon", T.DoubleType(), True),
        T.StructField("snap_lat", T.DoubleType(), True),
        T.StructField("rank", T.IntegerType(), True),
    ])
    kc = _M_PER_DEG
    radius = float(radius_m)
    topk = int(k)

    def run(it):
        sid, sax, say, sbx, sby = bc.value
        ns = len(sid)
        if ns == 0:
            return
        chunk = max(1, pair_chunk // ns)
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            plon = pdf[lon].to_numpy(np.float64)
            plat = pdf[lat].to_numpy(np.float64)
            parts = []
            for s in range(0, n, chunk):
                e = min(n, s + chunk)
                lo = plon[s:e, None]
                la = plat[s:e, None]
                kx = kc * np.cos(np.radians(la))
                axm = (sax[None, :] - lo) * kx
                aym = (say[None, :] - la) * kc
                uxm = (sbx[None, :] - lo) * kx - axm
                uym = (sby[None, :] - la) * kc - aym
                len2 = uxm * uxm + uym * uym
                with np.errstate(invalid="ignore", divide="ignore"):
                    t = np.clip(-(axm * uxm + aym * uym) / len2, 0.0, 1.0)
                t = np.where(len2 == 0.0, 0.0, t)
                qx = axm + t * uxm
                qy = aym + t * uym
                dist_r = round_half_away(np.sqrt(qx * qx + qy * qy), 3)
                # stable sort on the ROUNDED distance = the cell path's
                # (dist_m, seg_id) order, since columns are id-sorted
                order = np.argsort(dist_r, axis=1, kind="stable")[:, :topk]
                rows = np.arange(e - s)[:, None]
                dk = dist_r[rows, order]
                keep = dk <= radius              # (chunk, topk) mask
                if not keep.any():
                    continue
                ri, rj = np.nonzero(keep)        # row, rank index
                jj = order[ri, rj]
                kxk = kx[ri, 0]
                part = pd.DataFrame({
                    point_id: pdf[point_id].to_numpy()[s:e][ri],
                    lon: plon[s:e][ri],
                    lat: plat[s:e][ri],
                    seg_id: sid[jj],
                    "dist_m": dk[ri, rj],
                    "t": round_half_away(t[ri, jj], 6),
                    "snap_lon": round_half_away(
                        plon[s:e][ri] + qx[ri, jj] / kxk, 6),
                    "snap_lat": round_half_away(
                        plat[s:e][ri] + qy[ri, jj] / kc, 6),
                    "rank": (rj + 1).astype(np.int32),
                })
                for c in extra_cols:
                    part[c] = pdf[c].to_numpy()[s:e][ri]
                parts.append(part[[point_id, *extra_cols, lon, lat, seg_id,
                                   "dist_m", "t", "snap_lon", "snap_lat",
                                   "rank"]])
            if parts:
                yield pd.concat(parts, ignore_index=True)

    src = points
    par = points.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(run, out_schema)


def hmm_map_match(
    points: DataFrame,
    segments: DataFrame,
    radius_m: float,
    sigma_m: float = 25_000.0,
    beta_m: float = 10_000.0,
    k: int = 3,
    zoom: int = 8,
    track: str = "track_id",
    point_id: str = "pid",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    seg_id: str = "seg_id",
    ax: str = "ax",
    ay: str = "ay",
    bx: str = "bx",
    by: str = "by",
    max_abs_lat: float = 60.0,
    strategy: str = "auto",
    np_max_segs: int = 16384,
    broadcast_segs: bool | str = "auto",
) -> DataFrame:
    """Viterbi-matched segment per track point: ``(track_id, point_id,
    seg_id, dist_m, t, snap_lon, snap_lat)``.  Points with no candidate
    inside ``radius_m`` drop out and the chain bridges the gap (the
    transition then spans the skipped point — Newson-Krumm's broken-
    track simplification).  Track/point ids must be integral.

    ``strategy``: "auto" routes dim-scale networks (≤ ``np_max_segs``
    segments) to the broadcast-numpy exhaustive candidate pass
    (``candidate_segments_np`` — immune to the cell join's
    long-segment candidate blow-up); larger networks take the cell
    equi-join.  "np"/"cells" force."""
    pts = points.select(
        F.col(track).alias("_trk"),
        F.col(point_id).cast("long").alias("_pid"),
        F.col(ts).cast("long").alias("_ep"),
        F.col(lon).alias(lon), F.col(lat).alias(lat),
    )
    if strategy == "auto":
        strategy = (
            "np"
            if segments.limit(np_max_segs + 1).count() <= np_max_segs
            else "cells")
    if strategy == "np":
        cand = candidate_segments_np(
            pts, segments, radius_m, k=k,
            point_id="_pid", seg_id=seg_id, lon=lon, lat=lat,
            ax=ax, ay=ay, bx=bx, by=by, extra_cols=("_trk", "_ep"),
        )
    else:
        if broadcast_segs == "auto":
            # broadcast only a provably dim-sized supercover: the
            # exploded segment×cell table must fit the driver and every
            # executor — a 10^7-segment network would blow the
            # broadcast limit, so route it to the shuffle join
            broadcast_segs = (
                segments.limit(_BCAST_MAX_SEGS + 1).count()
                <= _BCAST_MAX_SEGS)
        cand = candidate_segments(
            pts, segments, radius_m, k=k, zoom=zoom,
            point_id="_pid", seg_id=seg_id, lon=lon, lat=lat,
            ax=ax, ay=ay, bx=bx, by=by, max_abs_lat=max_abs_lat,
            extra_cols=("_trk", "_ep"),
            broadcast_segs=bool(broadcast_segs),
        )
    sig2 = 2.0 * float(sigma_m) * float(sigma_m)
    beta = float(beta_m)
    kc = _M_PER_DEG

    def _planar_m(lon1, lat1, lon2, lat2):
        kx = kc * np.cos(np.radians((lat1 + lat2) * 0.5))
        dx = (lon2 - lon1) * kx
        dy = (lat2 - lat1) * kc
        return np.hypot(dx, dy)

    kmax = int(k)

    def decode_batch(batches) -> pd.DataFrame:
        """TRACK-BATCHED Viterbi: every track in the partition is
        packed into ONE padded (B, S_max, K) tensor and the DP walks
        the step axis once with B-wide elementwise ops — the same
        pair-batching trick as the Fréchet/DTW kernels (a per-track
        python loop costs ~250 µs/point in pandas overhead; this is
        ~60 numpy ops per step for ALL tracks).  Per-value float ops
        and their order are IDENTICAL to the scalar chain (emission
        round, _planar_m hypot, tot=score+trans then +emit, first-max
        argmax), so the decode stays bit-reproducible vs _scalar_hmm;
        padded candidate slots carry −inf scores (never argmax-won
        while a real candidate exists) and padded steps are ignored
        via each track's own final-step snapshot."""
        chunks = [b for b in batches if len(b)]
        if not chunks:
            yield pd.DataFrame(
                {f.name: pd.Series(dtype="float64") for f in MATCH_SCHEMA})
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["_trk", "_ep", "_pid", "dist_m", seg_id],
                              kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        trk = pdf["_trk"].to_numpy()
        pid = pdf["_pid"].to_numpy()
        new_trk = np.empty(n, dtype=bool)
        new_trk[0] = True
        new_trk[1:] = trk[1:] != trk[:-1]
        new_step = new_trk.copy()
        new_step[1:] |= pid[1:] != pid[:-1]
        gstep = np.cumsum(new_step) - 1            # global step index
        b_of_step = np.cumsum(new_trk[new_step]) - 1
        bidx = b_of_step[gstep]                    # track index per row
        B = int(b_of_step[-1]) + 1
        n_steps = len(b_of_step)
        # b_of_step / gstep are non-decreasing: first occurrences via
        # searchsorted (a zero-init minimum.at would stick at 0)
        first_step_of_trk = np.searchsorted(b_of_step, np.arange(B))
        sidx = gstep - first_step_of_trk[bidx]     # step within track
        first_row_of_step = np.searchsorted(gstep, np.arange(n_steps))
        cidx = np.arange(n) - first_row_of_step[gstep]  # cand within step
        St = np.bincount(b_of_step, minlength=B)   # steps per track
        S = int(St.max())

        def tens(vals, fill=0.0):
            t = np.full((B, S, kmax), fill)
            t[bidx, sidx, cidx] = vals
            return t

        dist = tens(pdf["dist_m"].to_numpy(float))
        slon = tens(pdf["snap_lon"].to_numpy(float))
        slat = tens(pdf["snap_lat"].to_numpy(float))
        flat = np.full((B, S, kmax), -1, dtype=np.int64)
        flat[bidx, sidx, cidx] = np.arange(n)
        valid = flat >= 0
        plon = np.zeros((B, S))
        plat = np.zeros((B, S))
        plon[bidx, sidx] = pdf[lon].to_numpy(float)
        plat[bidx, sidx] = pdf[lat].to_numpy(float)

        emit = np.round(-(dist ** 2) / sig2, 6)
        NEG = -np.inf
        scores = np.where(valid[:, 0, :], emit[:, 0, :], NEG)
        back = np.full((B, S, kmax), -1, dtype=np.int64)
        final = np.where(St[:, None] == 1, scores, NEG)
        for s in range(1, S):
            route = _planar_m(
                slon[:, s - 1, :, None], slat[:, s - 1, :, None],
                slon[:, s, None, :], slat[:, s, None, :],
            )
            direct = _planar_m(plon[:, s - 1], plat[:, s - 1],
                               plon[:, s], plat[:, s])
            trans = np.round(-np.abs(route - direct[:, None, None]) / beta, 6)
            tot = scores[:, :, None] + trans       # (B, prev, cur)
            bk = np.argmax(tot, axis=1)            # first max wins
            sc = (np.take_along_axis(tot, bk[:, None, :], axis=1)[:, 0, :]
                  + emit[:, s, :])
            scores = np.where(valid[:, s, :], sc, NEG)
            back[:, s, :] = bk
            snap = St - 1 == s
            if snap.any():
                final[snap] = scores[snap]
        # backtrack every track from ITS OWN last step (first max on ties)
        picks = np.zeros((B, S), dtype=np.int64)
        j = np.argmax(final, axis=1)
        for s in range(S - 1, -1, -1):
            act = s <= St - 1
            picks[act, s] = j[act]
            j = np.where(act, back[np.arange(B), s, j], j)
        rows = flat[np.repeat(np.arange(B), St),
                    np.concatenate([np.arange(c) for c in St]),
                    picks[np.repeat(np.arange(B), St),
                          np.concatenate([np.arange(c) for c in St])]]
        yield pd.DataFrame({
            "track_id": trk[rows].astype(np.int64),
            "point_id": pid[rows].astype(np.int64),
            "seg_id": pdf[seg_id].to_numpy()[rows].astype(np.int64),
            "dist_m": pdf["dist_m"].to_numpy(float)[rows],
            "t": pdf["t"].to_numpy(float)[rows],
            "snap_lon": pdf["snap_lon"].to_numpy(float)[rows],
            "snap_lat": pdf["snap_lat"].to_numpy(float)[rows],
        })

    par = points.sparkSession.sparkContext.defaultParallelism
    return cand.repartition(par, "_trk").mapInPandas(
        decode_batch, schema=MATCH_SCHEMA)
