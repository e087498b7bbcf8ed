"""Vector math over ``array<float>`` embedding columns.

Built entirely on Spark's higher-order array functions
(``zip_with`` / ``aggregate``) — JVM-side, codegen'd, no UDF — which
is the right default for 100 TB: the dot product is a narrow
per-row expression, so similarity scans parallelize perfectly and
the only shuffle in a top-k search is the final per-query merge.
Accumulation is in double (floats are upcast first) so results are
stable and match the DuckDB oracle's double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def centroid_array(cents_cc, *key_cols: str):
    """(``key_cols``…, cid, c, cc) centroid rows → ONE row per key
    (or one global row when no keys) holding the whole candidate set
    as ``_cands`` = array<struct<cid, c, cc>>, cid-sorted.

    This is the broadcast side of `nearest_centroid`: collapsing the
    (small — k ≤ a few hundred) centroid relation to an array lets the
    argmin run as a row-wise expression over the corpus scan instead
    of a k-way row explosion + per-id window, which is what keeps the
    corpus from ever being shuffled by an assignment (guide §2.4) —
    the exchange+sort the window form pays carries k× the corpus."""
    from pyspark.sql import DataFrame  # local: avoid module cycle at import

    assert isinstance(cents_cc, DataFrame)
    agg = F.array_sort(F.collect_list(F.struct("cid", "c", "cc"))).alias(
        "_cands"
    )
    return (
        cents_cc.groupBy(*key_cols).agg(agg) if key_cols else cents_cc.agg(agg)
    )


def nearest_centroid(cands: Column, v: Column, vv: Column) -> Column:
    """argmin over a candidate array (from `centroid_array`) of
    dist² = (vv − 2·v·c) + cc, ties by lowest cid — the SAME operand
    tree and the same (d2, cid) ordering as the window/row_number
    assignment form it replaces, so the winner (and its d2) is
    bit-identical; only the physical shape changes (no explosion, no
    exchange, no sort). Returns struct<d2 double, cid, c>; null only
    for an empty candidate array (callers keep the original
    empty-centroids semantics by filtering nulls)."""
    return F.array_min(
        F.transform(
            cands,
            lambda s: F.struct(
                ((vv - 2 * dot(v, s["c"])) + s["cc"]).alias("d2"),
                s["cid"].alias("cid"),
                s["c"].alias("c"),
            ),
        )
    )
