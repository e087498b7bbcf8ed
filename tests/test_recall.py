"""Recall of the approximate similarity/dedup paths against their
exact twins on the deterministic corpus — the quality half of the
speed/recall trade each approximate operator makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from epe_data_wrangling_spark.operators import dedup as X
from epe_data_wrangling_spark.operators import similarity as S
from epe_data_wrangling_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.a_id, r.b_id) for r in df.select("a_id", "b_id").collect()}


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Every exact-Jaccard ≥ 0.8 pair should be recovered by the
    16-hash 8×2-band LSH (P[candidate] ≈ 0.9997 at j = 0.8), and LSH
    never reports a pair below threshold (exact verify step)."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = _pairs(
        X.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=5, threshold=0.8)
    )
    lsh = _pairs(
        X.minhash_lsh_pairs(
            docs, "text", "doc_id", shingle_n=5, num_hashes=16, bands=8, threshold=0.8
        )
    )
    assert lsh <= exact  # no false positives past the verify
    recall = len(lsh & exact) / len(exact) if exact else 1.0
    assert recall >= 0.95, f"LSH recall {recall:.3f} over {len(exact)} true pairs"


def test_ivf_recall_curve(spark):
    """IVF recall@3 vs the exact top-3 rises monotonically with the
    number of probed cells — the speed/recall dial. On this corpus
    (near-uniform synthetic vectors, untrained centroids — the worst
    case for coarse quantization): ~0.76 at 8/16 probes, ≥0.9 at
    14/16, and exactly 1.0 at 16/16 (covered in test_similarity)."""
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 50)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_topk(q, e, vec_col="embedding", id_col="vec_id", k=3).collect()
    }

    def recall(n_probe: int) -> float:
        approx = {
            (r.query_id, r.neighbor_id)
            for r in S.ivf_topk(
                q, e, vec_col="embedding", id_col="vec_id",
                k=3, n_centroids=16, n_probe=n_probe,
            ).collect()
        }
        return len(approx & exact) / len(exact)

    r8, r14 = recall(8), recall(14)
    assert r8 >= 0.6, f"recall@3 with 8 probes collapsed: {r8:.3f}"
    assert r14 >= 0.9, f"recall@3 with 14 probes too low: {r14:.3f}"
    assert r14 >= r8, "recall must not fall as probes increase"


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation reaches the fixpoint across a long chain
    (diameter > 1 round), a triangle, and a self-contained pair."""
    edges = spark.createDataFrame(
        # chain 1-2-3-4-5-6, triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "a_id long, b_id long",
    )
    got = {
        r.node: r.rep for r in X.connected_components(edges, "a_id", "b_id").collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_connected_components_raises_on_non_convergence(spark):
    """A chain longer than max_iter must raise rather than return
    silently-partial labels (the ADVICE r1 failure mode)."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        X.connected_components(edges, "a_id", "b_id", max_iter=2)


def test_ngram_jaccard_hot_shingle_cap_bounds_candidates(spark):
    """A stop-shingle corpus (60 docs sharing one boilerplate prefix,
    otherwise unrelated) makes the UNCAPPED exploded self-join emit
    C(60,2) = 1770 candidate pairs from the hot shingles alone; the
    document-frequency cap suppresses exactly those, while a genuine
    near-dup pair sharing RARE shingles still surfaces with its
    unbiased full-set Jaccard."""
    boiler = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (i, f"{boiler} unique tail number {i} with words w{i}a w{i}b w{i}c w{i}d")
        for i in range(60)
    ]
    # one real near-dup pair sharing a RARE 9-word overlap (df = 2)
    rare = "rare overlap section alpha beta gamma delta epsilon zeta"
    rows += [
        (100, f"{rare} ending one two three"),
        (101, f"{rare} ending four five six"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    uncapped = X.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_n=5, threshold=0.0,
        max_shingle_freq=10**9,
    )
    assert uncapped.count() >= 1770  # the quadratic boilerplate blowup

    capped = X.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_n=5, threshold=0.0,
        max_shingle_freq=10,
    )
    got = {(r.a_id, r.b_id): r.jaccard for r in capped.collect()}
    assert (100, 101) in got            # rare-shingle pair survives
    assert all(a == 100 for a, _ in got)  # boilerplate-only pairs gone
    # the verify step scores the FULL sets: same jaccard either way
    [unc] = uncapped.filter("a_id = 100 AND b_id = 101").collect()
    assert abs(got[(100, 101)] - unc.jaccard) < 1e-12


def test_ivfpq_recall_vs_exact_l2(spark):
    """IVF×PQ (ann_ivfpq_topk: trained coarse quantizer, residual PQ
    codes, 4/8-cell probe, ADC top-100, exact re-rank) recovers the
    exact L2 top-5 well above the floor. Measured 0.92 at sf0.001 and
    sf0.01 — essentially AT the coarse-probe ceiling (0.94: the
    fraction of true neighbors whose cell is probed at all), i.e. the
    residual-PQ + re-rank stages lose almost nothing; the floor
    leaves slack only for tie-order jitter."""
    from pyspark.sql import Window

    from epe_data_wrangling_spark.catalog.mlprep_q import (
        IVFPQ_K,
        IVFPQ_NQ,
        ann_ivfpq_topk,
    )
    from epe_data_wrangling_spark.functions import vectors as V

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < IVFPQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = (
        V.dot(F.col("qv"), F.col("qv"))
        - 2 * V.dot(F.col("qv"), F.col("v"))
        + V.dot(F.col("v"), F.col("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("vec_id"))
    exact = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVFPQ_K)
    )
    ex = {(r.query_id, r.vec_id) for r in exact.collect()}
    # Probe sweep — the dial a production user actually turns (FAISS
    # nprobe). Recall must not DECREASE with more probed cells: extra
    # cells only add candidates, and the exact re-rank keeps the best
    # — the tiny tolerance covers ADC-candidate-cap crowding (a new
    # cell's vectors can push a true neighbor out of the ADC
    # top-IVFPQ_CAND before re-rank sees it) and tie-order jitter.
    # This also guards codebook regressions the single floor could
    # miss: a broken residual codebook flattens the curve.
    recalls = {}
    for probe in (2, 4, 8):
        ap = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivfpq_topk(spark, SF_DIR, probe=probe).collect()
        }
        recalls[probe] = len(ex & ap) / len(ex)
    assert recalls[4] >= 0.85, f"IVFPQ recall {recalls} over {len(ex)} truths"
    assert recalls[2] <= recalls[4] + 0.02, f"probe curve not monotone: {recalls}"
    assert recalls[4] <= recalls[8] + 0.02, f"probe curve not monotone: {recalls}"


def test_hybrid_ivf_fusion_recall_vs_exact(spark):
    """The IVF-served hybrid (`hybrid_rrf_ivf`) must recover most of
    the exact variant's fused result set: the lexical legs are
    identical, so the only loss channel is the vector leg's probed-
    cell restriction ({HYB_IVF_PROBE}/{KMEANS_K} cells), and RRF's
    rank-space fusion dampens even that (a vector-leg miss only
    drops a doc that ALSO missed the lexical list). Measured overlap
    0.97 (sf0.001) / 0.96 (sf0.01); floor 0.85."""
    from epe_data_wrangling_spark.catalog.similarity_q import (
        hybrid_rrf_ivf,
        hybrid_rrf_retrieval,
    )

    exact = {
        (r.query_id, r.doc_id)
        for r in hybrid_rrf_retrieval(spark, SF_DIR).collect()
    }
    ivf = {
        (r.query_id, r.doc_id)
        for r in hybrid_rrf_ivf(spark, SF_DIR).collect()
    }
    assert len(exact) == len(ivf) == 100
    assert len(exact & ivf) / len(exact) >= 0.85
