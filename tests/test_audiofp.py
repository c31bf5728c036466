"""Audio constellation fingerprints + matching (raster/audiofp.py)."""

import numpy as np
import pandas as pd

from xutil_spark.data.synth_av import melody_samples_for, melody_table, snippet_table
from xutil_spark.raster.audiofp import (
    _band_edges,
    audio_fingerprints,
    audio_match,
    clip_landmarks,
    spec_basis,
)


def test_landmarks_match_independent_scalar_loop():
    C = spec_basis()
    bands = _band_edges(256)
    x = melody_samples_for(3, 2000)[:, 0].astype(np.int64)
    got = sorted(clip_landmarks(x, C, bands, 256, 128, 3))
    # independent per-frame loop
    nf = (len(x) - 256) // 128 + 1
    pk = []
    for t in range(nf):
        s = np.abs(C @ x[t * 128:t * 128 + 256])
        pk.append([int(np.argmax(s[lo - 1:hi - 1])) + lo for lo, hi in bands])
    want = []
    for dt in (1, 2, 3):
        for t in range(nf - dt):
            for b in range(len(bands)):
                want.append((t, (pk[t][b] * 128 + pk[t + dt][b]) * 8 + dt))
    assert got == sorted(want)


def test_snippets_recover_clip_and_offset(spark):
    refs = melody_table(spark, 24)
    snips = snippet_table(spark, 8, 24)
    out = {r.snippet_id: r for r in audio_match(
        audio_fingerprints(snips, id_col="snippet_id"),
        audio_fingerprints(refs)).collect()}
    assert len(out) == 8
    for i in range(8):
        r = out[f"snip{i:06d}"]
        assert r.clip_id == f"clip{(i * 7) % 24:06d}"
        assert r.dt_off == 2 * (i % 8)
        # a full-overlap match: every snippet landmark votes
        assert r.votes == 273


def test_foreign_snippet_scores_far_below_true_match(spark):
    import pandas as pd

    from xutil_spark.raster.av import AUDIO_SCHEMA

    refs = melody_table(spark, 10)
    pcm = melody_samples_for(500, 2048)  # clip NOT among the refs
    foreign = spark.createDataFrame(pd.DataFrame(
        [("snipX", pcm.tobytes(), 8000, 2048, 1, "pcm16", "foreign")],
        columns=[f.name for f in AUDIO_SCHEMA])).withColumnRenamed(
        "clip_id", "snippet_id")
    out = audio_match(audio_fingerprints(foreign, id_col="snippet_id"),
                      audio_fingerprints(refs), min_votes=1).collect()
    assert all(r.votes < 100 for r in out)  # true matches score 273


def test_fan_out_beyond_dt_field_raises():
    import pytest

    C = spec_basis(256)
    bands = _band_edges(256)
    samples = np.arange(4096, dtype=np.int64) % 997
    assert clip_landmarks(samples, C, bands, 256, 128, 7)  # max OK
    with pytest.raises(ValueError, match="3-bit"):
        clip_landmarks(samples, C, bands, 256, 128, 8)
