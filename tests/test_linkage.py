"""Crafted-data semantics for the linkage/association suite:
skyline dominance rules and the deletion-neighborhood recall
guarantee (every Levenshtein ≤ 1 pair shares a blocking key)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _deletion_keys(name: str) -> set[str]:
    """Python mirror of the blocking-key generator: the name plus
    every single-character deletion."""
    return {name} | {name[:i] + name[i + 1 :] for i in range(len(name))}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_neighborhood_blocking_has_full_recall_at_distance_1():
    """Any two strings within edit distance 1 share at least one
    deletion key — the guarantee that makes the blocked join lossless
    at the verify threshold."""
    names = [
        "Customer#0001",
        "Customer#0002",  # substitution of 1
        "Customer#001",  # deletion
        "Customer#00012",  # insertion
        "Xustomer#0001",  # substitution at position 0
        "totally-different",
    ]
    for a, b in itertools.combinations(names, 2):
        if _lev(a, b) <= 1:
            assert _deletion_keys(a) & _deletion_keys(b), (a, b)


def test_skyline_sweep_matches_naive_dominance(spark):
    """The window-sweep skyline equals the O(n²) dominance definition
    on crafted points, including a revenue tie and an exact-duplicate
    point (one representative kept)."""
    pts = [
        # (suppkey, revenue, bal)
        (1, 100.0, 10.0),  # skyline (max revenue)
        (2, 90.0, 5.0),  # dominated by 1
        (3, 90.0, 20.0),  # skyline (bal beats 1)
        (4, 80.0, 20.0),  # dominated by 3 (same bal, less rev)
        (5, 50.0, 30.0),  # skyline
        (6, 50.0, 30.0),  # exact duplicate of 5 → one representative
        (7, 10.0, 1.0),  # dominated by everything
    ]
    df = spark.createDataFrame(pts, "s_suppkey long, revenue double, s_acctbal double")
    from pyspark.sql import Window

    w = Window.orderBy(
        F.desc("revenue"), F.desc("s_acctbal"), "s_suppkey"
    ).rowsBetween(Window.unboundedPreceding, -1)
    swept = df.withColumn("pm", F.max("s_acctbal").over(w))
    got = {
        r.s_suppkey
        for r in swept.where(F.col("pm").isNull() | (F.col("s_acctbal") > F.col("pm"))).collect()
    }
    # naive strict-dominance skyline, deduped to first representative
    naive = set()
    seen = set()
    for k, r, b in pts:
        if (r, b) in seen:
            continue
        dominated = any(
            (r2 >= r and b2 >= b and (r2 > r or b2 > b)) for _, r2, b2 in pts
        )
        if not dominated:
            naive.add(k)
            seen.add((r, b))
    assert got == naive == {1, 3, 5}
