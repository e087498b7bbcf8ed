"""Catalog integrity: the externally-checked surface stays shaped the
way the driver expects — stable head window, one oracle per query
(with documented exceptions), no name drift."""

from __future__ import annotations

from epe_data_wrangling_spark.catalog import PRIORITY_ORDER, all_queries

#: queries that deliberately ship without an oracle (rows-only check);
#: every addition here needs a docstring justifying it. Empty since
#: r15: ann_cosine_topk_arrow — rows-only for 14 rounds (numpy
#: summation order) — now certifies at RANK level under a pinned
#: min-adjacent-gap witness (test_similarity.test_arrow_rank_gap_witness).
ROWS_ONLY: set[str] = set()


def test_priority_window_is_exactly_50_and_resolves():
    qs = all_queries()
    assert len(PRIORITY_ORDER) == 50
    assert list(qs)[:50] == PRIORITY_ORDER  # merge order == declared order


def test_every_query_has_oracle_unless_documented():
    qs = all_queries()
    missing = {n for n, q in qs.items() if q.oracle is None}
    assert missing == ROWS_ONLY


def test_priority_window_covers_every_family():
    """r8 restores the full 10-anchor set (the three benched for r7 —
    pivot, running-spend, q1 — return with 6 green rows each); every
    family has a permanent canary in the driver's check window."""
    head = set(PRIORITY_ORDER)
    for probe in (
        "epe_pipeline_demo",      # reference-pipeline port
        "dedup_minhash_lsh",      # dedup
        "ann_cosine_topk",        # similarity
        "text_token_stats",       # text analysis
        "multimodal_bmp_pixel_stats",  # multimodal (real pixel decode)
        "streaming_tumbling_window",  # streaming
        "curate_corpus",          # curation composition
        "pivot_event_type_counts",    # reshape/pivot
        "window_running_spend",       # windows
        "q1_pricing_summary",         # core TPC-H agg shapes
    ):
        assert probe in head, f"{probe} fell out of the driver's check window"


def test_catalog_is_reasonably_large_and_named():
    qs = all_queries()
    assert len(qs) >= 120
    assert all(n == q.name for n, q in qs.items())
    assert all(q.doc for q in qs.values()), "every query needs a docstring"


#: window slots that intentionally repeat a certified query — only a
#: query whose prior driver row was RED (hash_match false) may appear
#: here, to earn a green row after its oracle fix
RECERTIFY: set[str] = {
    # r15: 14 rounds of deliberate `err: no_oracle` rows; the fix is
    # the rank-level oracle + pinned gap witness (see ROWS_ONLY note)
    "ann_cosine_topk_arrow",
    # r15 red: TimeoutError after 300 s in the change-batch LANDING
    # stream on a ~2× noisy driver host (the round's probe readings
    # failed BASELINE.md's own dispersion gate) — machinery identical
    # to streaming_ann_index_retrain, hash-green in r14. The fix is
    # the ambient-aware STREAM_TIMEOUT_SEC default (900 s,
    # streaming/ops.py) replacing every fixed 300 s literal.
    "streaming_ann_index_retrain_spread",
}
#: Historical recerts (kept for the red-row evidence check below):
#: variant_shred_events (r4 canonical-JSON red), xml_source_nations
#: (r5 HUGEINT-final red) — both re-certified green in r6.
HISTORICAL_RECERTIFY = {"variant_shred_events", "xml_source_nations"}


ANCHOR_COUNT = 10  # r8: the three anchors benched for r7 are restored


def test_rotation_window_certifies_everything_uncertified_first():
    """The r8+ rotation contract (certification of the r7-freeze
    catalog completed at 237/237, so the window's job changed): every
    query that has NEVER earned a green driver row — and has an
    oracle — must hold a window slot while slots remain; only after
    all of those are seated may slots go to re-certifications, and a
    re-cert slot may only repeat a query that is already green (a red
    repeat needs an explicit RECERTIFY entry recording the oracle
    fix). Every RECERTIFY entry must actually be red in some round's
    record."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    window = set(PRIORITY_ORDER)
    qs = all_queries()
    green: set[str] = set()
    red: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        for name, row in rows.items():
            if row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            ):
                green.add(name)
            if not (
                row.get("hash_match", True)
                and row.get("rows_match", True)
                and row.get("schema_match", True)
            ) or row.get("err"):
                red.add(name)
    uncertified = {n for n in qs if n not in green and qs[n].oracle is not None}
    stranded = uncertified - window
    assert len(stranded) == 0 or len(window - green) >= 50 - ANCHOR_COUNT, (
        f"never-certified queries left out of a window with spare slots: {stranded}"
    )
    bad_recert = {n for n in window if n in red and n not in green} - RECERTIFY
    # rows-only-by-design queries can never be green; they are allowed
    bad_recert -= ROWS_ONLY
    assert not bad_recert, f"red, unfixed queries re-windowed without RECERTIFY: {bad_recert}"
    not_red = (RECERTIFY | HISTORICAL_RECERTIFY) - red
    assert not not_red, f"RECERTIFY entries were never red: {not_red}"


def test_rotation_backlog_is_registered_and_disjoint():
    from epe_data_wrangling_spark.catalog import ROTATION_BACKLOG

    qs = all_queries()
    missing = [n for n in ROTATION_BACKLOG if n not in qs]
    assert not missing
    assert not set(ROTATION_BACKLOG) & set(PRIORITY_ORDER)
