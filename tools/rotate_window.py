"""Propose the next driver-certification window rotation.

The external driver hash-checks only the first 50 entries of
``catalog.PRIORITY_ORDER``; rounds rotate the non-anchor 40 slots
through queries that have never received a driver CORRECTNESS row.
This tool reads every CORRECTNESS_r*.json in the repo root, computes
which catalog queries remain uncertified, and prints the proposed
next window (anchors + the head of ROTATION_BACKLOG filtered to
still-uncertified, oracle-bearing queries) plus the leftover backlog
— ready to paste into catalog/__init__.py.

Usage: python tools/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

from epe_data_wrangling_spark.catalog import (  # noqa: E402
    PRIORITY_ORDER,
    ROTATION_BACKLOG,
    all_queries,
)

# Per-family canaries kept in EVERY window (one per operator family;
# pinned by tests/test_catalog.py::test_priority_window_covers_every_family).
# Explicit, not positional: the window head also carries each round's
# new queries, so slicing PRIORITY_ORDER would capture those instead.
ANCHORS = [
    "epe_pipeline_demo",           # reference-pipeline port
    "dedup_minhash_lsh",           # dedup
    "ann_cosine_topk",             # similarity
    "text_token_stats",            # text analysis
    "multimodal_bmp_pixel_stats",  # multimodal
    "streaming_tumbling_window",   # streaming
    "curate_corpus",               # curation composition
    "pivot_event_type_counts",     # reshape/pivot
    "window_running_spend",        # windows
    "q1_pricing_summary",          # core TPC-H agg shapes
]


def main() -> int:
    qs = all_queries()
    certified: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        certified |= {
            name
            for name, row in rows.items()
            if row.get("hash_match") or (row.get("rows_match") and row.get("err") is None)
        }
    uncertified = [
        n for n in qs if n not in certified and qs[n].oracle is not None
    ]
    print(f"catalog: {len(qs)}  certified-ever: {len(certified)}  "
          f"uncertified-with-oracle: {len(uncertified)}")

    pool = [n for n in ROTATION_BACKLOG if n in uncertified]
    extra = [n for n in uncertified if n not in pool and n not in ANCHORS]
    pool += extra  # new queries not yet queued
    window = ANCHORS + pool[: 50 - len(ANCHORS)]
    leftover = pool[50 - len(ANCHORS):]

    if len(window) < 50:
        # Certification is (nearly) complete: refill the spare slots
        # with RE-certifications, oldest green row first, so driver
        # evidence stays fresh across the whole catalog instead of
        # pinning the same anchors forever.
        last_green: dict[str, int] = {}
        for path in sorted(glob.glob("CORRECTNESS_r*.json")):
            rnd = int(path.split("_r")[1].split(".")[0])
            for name, row in json.load(open(path)).items():
                if row.get("hash_match") or (
                    row.get("rows_match") and row.get("err") is None
                ):
                    # max, not last-write-wins: glob sort order is only
                    # round order while filenames stay zero-padded
                    last_green[name] = max(last_green.get(name, -1), rnd)
        stale = sorted(
            (n for n in qs if n not in window),
            key=lambda n: (last_green.get(n, -1), n),
        )
        refill = stale[: 50 - len(window)]
        window += refill
        print(f"refill ({len(refill)} re-certification slots, oldest green "
              "row first):", ", ".join(refill[:10]), "...")

    print("\nPRIORITY_ORDER = [  # proposed next window")
    for n in window:
        print(f'    "{n}",')
    print("]\n\nROTATION_BACKLOG = [")
    for n in leftover:
        print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
