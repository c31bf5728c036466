"""Image patchify / sharpness, sequence packing, video scene cuts."""

import hashlib

import numpy as np
import pytest

from xutil_spark.data.synth import images_table, pixels_for
from xutil_spark.data.synth_av import video_scene_frames_for, video_scene_table
from xutil_spark.operators.packing import pack_sequences
from xutil_spark.raster.av import scene_cuts
from xutil_spark.raster.patches import patchify, sharpness_stats

# ------------------------------------------------------------- patchify


def test_patchify_grid_and_exact_stats(spark):
    rows = patchify(images_table(spark, 6), patch=16).collect()
    # size cycle: i%3=0 -> 16x16 (1 patch), =1 -> 32x24 (2x1), =2 -> 64x48 (4x3)
    per_img = {}
    for r in rows:
        per_img.setdefault(r.image_id, []).append(r)
    assert len(per_img["img000000000000"]) == 1
    assert len(per_img["img000000000001"]) == 2
    assert len(per_img["img000000000002"]) == 12
    for r in rows:
        i = int(r.image_id[3:])
        px = pixels_for(i)
        tile = px[r.py * 16:(r.py + 1) * 16, r.px * 16:(r.px + 1) * 16]
        s = tile.astype(np.int64).sum(axis=(0, 1))
        assert r.mean_r == round(float(s[0]) / 256, 6)
        assert r.mean_g == round(float(s[1]) / 256, 6)
        assert r.mean_b == round(float(s[2]) / 256, 6)
        assert r.psum == int(s.sum())
        assert bytes(r.bytes) == np.ascontiguousarray(tile).tobytes()
        assert len(bytes(r.bytes)) == 16 * 16 * 3


def test_patchify_md5_matches_scalar(spark):
    row = (patchify(images_table(spark, 3), patch=16)
           .where("image_id = 'img000000000002' AND py = 2 AND px = 3")
           .collect()[0])
    px = pixels_for(2)
    want = bytearray()
    for y in range(32, 48):
        for x in range(48, 64):
            want += bytes(int(px[y, x, c]) for c in range(3))
    assert hashlib.md5(bytes(want)).hexdigest() == \
        hashlib.md5(bytes(row.bytes)).hexdigest()


def test_patchify_drops_partial_border(spark):
    # 32x24 at patch 16 -> only 2x1 full patches; y=16..23 sliver dropped
    rows = (patchify(images_table(spark, 2), patch=16)
            .where("image_id = 'img000000000001'").collect())
    assert sorted((r.py, r.px) for r in rows) == [(0, 0), (0, 1)]


# ------------------------------------------------------------ sharpness


def _scalar_sharpness(i: int):
    px = pixels_for(i).astype(np.int64)
    g = (px @ np.array([299, 587, 114])) // 1000
    h, w = g.shape
    ls = lq = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            L = int(4 * g[y, x] - g[y - 1, x] - g[y + 1, x]
                    - g[y, x - 1] - g[y, x + 1])
            ls += L
            lq += L * L
    n = (w - 2) * (h - 2)
    return ls, lq, n, round(lq / n - (ls / n) ** 2, 6)


def test_sharpness_matches_scalar(spark):
    rows = {r.image_id: r for r in
            sharpness_stats(images_table(spark, 4)).collect()}
    for i in range(4):
        ls, lq, n, sharp = _scalar_sharpness(i)
        r = rows[f"img{i:012d}"]
        assert (r.lap_sum, r.lap_sq, r.n_int) == (ls, lq, n)
        assert r.sharpness == sharp


def test_sharpness_flat_image_is_zero(spark):
    import pandas as pd
    from xutil_spark.raster.patches import sharpness_stats as ss

    flat = np.full((8, 8, 3), 100, dtype=np.uint8)
    df = spark.createDataFrame(pd.DataFrame({
        "image_id": ["flat"], "bytes": [flat.tobytes()],
        "w": [8], "h": [8], "fmt": ["raw"],
    }))
    r = ss(df).collect()[0]
    assert (r.lap_sum, r.lap_sq, r.sharpness) == (0, 0, 0.0)


# ------------------------------------------------------------- packing


def _scalar_pack(ids, toks, budget):
    out = {}
    seq, fill = 0, 0
    first = True
    for d, t in sorted(zip(ids, toks)):
        if first:
            seq, fill, first = 0, t, False
        elif fill + t > budget:
            seq, fill = seq + 1, t
        else:
            fill += t
        out[d] = (seq, fill - t)
    return out


def test_pack_sequences_matches_scalar_greedy(spark):
    import pandas as pd

    rng = np.random.RandomState(7)
    ids = np.arange(200)
    toks = rng.randint(1, 900, size=200)
    toks[17] = 5000  # over-budget singleton
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids, "n_tokens": toks}))
    got = pack_sequences(df, budget=1024, n_shards=4).collect()
    assert len(got) == 200
    by_shard = {}
    for r in got:
        assert r.shard == r.doc_id % 4
        by_shard.setdefault(r.shard, []).append(r)
    for sh, rows in by_shard.items():
        sids = [r.doc_id for r in rows]
        stok = [int(toks[d]) for d in sids]
        want = _scalar_pack(sids, stok, 1024)
        for r in rows:
            assert (r.seq_id, r.seq_offset) == want[r.doc_id], r
        # budget invariant: each sequence <= budget unless singleton
        per_seq = {}
        for r in rows:
            per_seq.setdefault(r.seq_id, []).append(int(r.n_tokens))
        for ts in per_seq.values():
            assert sum(ts) <= 1024 or len(ts) == 1


def test_pack_sequences_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(None, budget=0)


# ----------------------------------------------------------- scene cuts


def test_scene_cuts_find_exactly_the_boundaries(spark):
    vids = video_scene_table(spark, 5, w=16, h=12, n_frames=24, scene_len=8)
    rows = scene_cuts(vids, threshold=20_000, circular=True).collect()
    assert len(rows) == 5 * 23
    for r in rows:
        assert r.is_cut == (r.frame_idx % 8 == 0), (r.video_id, r.frame_idx)
        # constant-shift content: circular diff is exact per pair type
        want = 192 * (40 + 83 + 128) if r.frame_idx % 8 == 0 \
            else 192 * (7 + 11 + 13)
        assert r.diff_sum == want


def test_scene_cuts_diffs_match_scalar(spark):
    vids = video_scene_table(spark, 1, w=16, h=12, n_frames=24, scene_len=8)
    got = {r.frame_idx: r.diff_sum
           for r in scene_cuts(vids, threshold=20_000, circular=True).collect()}
    fr = video_scene_frames_for(0, 16, 12, 24, 8).astype(np.int64)
    for f in range(1, 24):
        ad = np.abs(fr[f] - fr[f - 1])
        want = int(np.minimum(ad, 256 - ad).sum())
        assert got[f] == want


def test_scene_cuts_plain_abs_default(spark):
    vids = video_scene_table(spark, 1, w=16, h=12, n_frames=6, scene_len=8)
    got = {r.frame_idx: r.diff_sum
           for r in scene_cuts(vids, threshold=10**9).collect()}
    fr = video_scene_frames_for(0, 16, 12, 6, 8).astype(np.int64)
    for f in range(1, 6):
        assert got[f] == int(np.abs(fr[f] - fr[f - 1]).sum())


# ------------------------------------------------------ color histogram


def test_color_histogram_exact(spark):
    from xutil_spark.raster.patches import color_histogram

    rows = color_histogram(images_table(spark, 3), 4).collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, {})[r.bin] = r.n_px
    for i in range(3):
        px = pixels_for(i).astype(np.int64)
        idx = (px[:, :, 0] >> 6) * 16 + (px[:, :, 1] >> 6) * 4 + (px[:, :, 2] >> 6)
        want = {int(k): int(v) for k, v in
                zip(*np.unique(idx.ravel(), return_counts=True))}
        assert per[f"img{i:012d}"] == want
        assert sum(want.values()) == px.shape[0] * px.shape[1]


def test_color_histogram_rejects_bad_bins(spark):
    from xutil_spark.raster.patches import color_histogram

    with pytest.raises(ValueError):
        color_histogram(None, 3)
