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
    """r7 trims anchors to 7 for one round so the whole backlog fits;
    the three dropped anchors' families stay covered by in-window
    backlog entries (asserted below)."""
    head = set(PRIORITY_ORDER)
    for probe in (
        "epe_pipeline_demo",      # reference-pipeline port
        "dedup_minhash_lsh",      # dedup
        "ann_cosine_topk",        # similarity
        "text_token_stats",       # text analysis
        "multimodal_bmp_pixel_stats",  # multimodal (real pixel decode)
        "streaming_tumbling_window",  # streaming
        "curate_corpus",          # curation composition
        # family stand-ins for the three anchors dropped this round:
        "categorical_encode_dense",    # reshape/pivot shape
        "supplier_concentration_hhi",  # core TPC-H agg shapes
        "time_weighted_avg_value",     # windows
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
RECERTIFY: set[str] = set()  # r7: no recerts — all r6 window rows green
#: Historical recerts (kept for the red-row evidence check below):
#: variant_shred_events (r4 canonical-JSON red), xml_source_nations
#: (r5 HUGEINT-final red) — both re-certified green in r6.
HISTORICAL_RECERTIFY = {"variant_shred_events", "xml_source_nations"}


ANCHOR_COUNT = 7  # r7: trimmed from 10 for one round (see catalog docstring)


def test_rotation_window_disjoint_from_all_certified_except_anchors():
    """The rotation contract: the anchors persist, every other window
    slot goes to a query with no prior driver CORRECTNESS row — from
    ANY round (the r4 guard only checked r3, so an r1/r2/r4 repeat
    would have slipped through and wasted a certification slot).
    Red rows are exempt via RECERTIFY: a failed check earns a re-run
    once its oracle is fixed, and each such entry must actually be
    red in some round's record.

    Time-consistency (the r5 judge's finding): a record whose row
    names are exactly the CURRENT window is the driver's own
    certification OF this window — counting it would make every green
    slot a "repeat" the moment the round's results land, tripping the
    suite with zero code change. Such records are excluded from the
    repeat check (but still feed the RECERTIFY red-row evidence)."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    window = set(PRIORITY_ORDER)
    certified: set[str] = set()
    red: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        # ≥40-slot overlap (not exact equality, which a partial or
        # superset driver record would defeat): an old round's record
        # can overlap the current window only on anchors + RECERTIFY
        # (≤ ~12 names), so 40 cleanly identifies THIS window's record
        # even if the driver drops crashed rows or adds diagnostics.
        is_current_window_record = len(set(rows) & window) >= 40
        for name, row in rows.items():
            if not is_current_window_record:
                certified.add(name)
            if not (
                row.get("hash_match", True)
                and row.get("rows_match", True)
                and row.get("schema_match", True)
            ) or row.get("err"):
                red.add(name)
    rotated = set(PRIORITY_ORDER[ANCHOR_COUNT:])
    overlap = rotated & certified - RECERTIFY
    assert not overlap, f"non-anchor window slots repeat certified queries: {overlap}"
    not_red = (RECERTIFY | HISTORICAL_RECERTIFY) - red
    assert not not_red, f"RECERTIFY entries were never red: {not_red}"


def test_rotation_backlog_is_registered_and_disjoint():
    from epe_data_wrangling_spark.catalog import ROTATION_BACKLOG

    qs = all_queries()
    missing = [n for n in ROTATION_BACKLOG if n not in qs]
    assert not missing
    assert not set(ROTATION_BACKLOG) & set(PRIORITY_ORDER)
