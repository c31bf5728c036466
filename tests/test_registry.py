"""Contract-registry invariants.

The external driver evaluates only the first 50 entries of
``queries()`` (empirically: CORRECTNESS_r02.json == registry[:50]), so
the registry ORDER is itself part of the contract: every query that
needs a hard-gate row must sit inside that window.
"""

from xutil_spark.entry_queries import _DRIVER_WINDOW, ORACLES, QUERIES

# the 21 oracle-paired round-2 queries that had no driver row in r02,
# plus wgs2bd / streaming_cell_counts (same gap per the round-2 review)
NEVER_VERIFIED = {
    "gcj2wgs", "bd2gcj", "bd2wgs", "wgs2bd", "mercator_to_bd09",
    "tile2wgs", "asof_join", "dup_clusters", "cosine_top5_ivf",
    "streaming_dedup", "streaming_sessions", "streaming_cell_counts",
    "parse_zip_xml", "row_kv_reorder", "value_processor",
    "strings_index", "time_extend", "aes_roundtrip",
    "file_lines_count", "file_list_pattern", "geocode_enrich",
}


def test_driver_window_is_first_50_and_oracle_paired():
    names = list(QUERIES)
    assert names[:50] == _DRIVER_WINDOW
    missing = [n for n in _DRIVER_WINDOW if n not in ORACLES]
    assert not missing, f"window entries without an oracle: {missing}"


def test_never_verified_queries_inside_window():
    assert NEVER_VERIFIED <= set(_DRIVER_WINDOW)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)
