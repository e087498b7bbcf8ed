"""Catalog integrity: the externally-checked surface stays shaped the
way the driver expects — stable head window, one oracle per query
(with documented exceptions), no name drift."""

from __future__ import annotations

from epe_data_wrangling_spark.catalog import PRIORITY_ORDER, all_queries

#: queries that deliberately ship without an oracle (rows-only check);
#: every addition here needs a docstring justifying it
ROWS_ONLY = {"ann_cosine_topk_arrow"}


def test_priority_window_is_exactly_50_and_resolves():
    qs = all_queries()
    assert len(PRIORITY_ORDER) == 50
    assert list(qs)[:50] == PRIORITY_ORDER  # merge order == declared order


def test_every_query_has_oracle_unless_documented():
    qs = all_queries()
    missing = {n for n, q in qs.items() if q.oracle is None}
    assert missing == ROWS_ONLY


def test_priority_window_covers_every_family():
    head = set(PRIORITY_ORDER)
    for probe in (
        "epe_pipeline_demo",      # reference-pipeline port
        "dedup_minhash_lsh",      # dedup
        "ann_cosine_topk",        # similarity
        "text_token_stats",       # text analysis
        "multimodal_bmp_pixel_stats",  # multimodal (real pixel decode)
        "streaming_tumbling_window",  # streaming
        "curate_corpus",          # curation composition
        "pivot_event_type_counts",  # reshape
        "q1_pricing_summary",     # core TPC-H shapes
        "window_running_spend",   # windows
    ):
        assert probe in head, f"{probe} fell out of the driver's check window"


def test_catalog_is_reasonably_large_and_named():
    qs = all_queries()
    assert len(qs) >= 120
    assert all(n == q.name for n, q in qs.items())
    assert all(q.doc for q in qs.values()), "every query needs a docstring"


def test_rotation_window_disjoint_from_r3_except_anchors():
    """The round-3 verdict's rotation contract: ~10 anchors persist,
    every other window slot goes to a query with no prior driver
    CORRECTNESS row. Guard the non-anchor slots against accidentally
    re-certifying already-certified queries (which would waste the
    round's certification breadth)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r03.json")
    r3 = set(json.load(open(path)))
    rotated = set(PRIORITY_ORDER[10:])
    overlap = rotated & r3
    assert not overlap, f"non-anchor window slots repeat r3-certified queries: {overlap}"


def test_rotation_backlog_is_registered_and_disjoint():
    from epe_data_wrangling_spark.catalog import ROTATION_BACKLOG

    qs = all_queries()
    missing = [n for n in ROTATION_BACKLOG if n not in qs]
    assert not missing
    assert not set(ROTATION_BACKLOG) & set(PRIORITY_ORDER)
