"""Similarity kernels agree: the Arrow/numpy top-k must produce the
same (query, neighbor, rank) set as the expression-based exact
kernel (values differ only in final-ulp summation order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from epe_data_wrangling_spark.operators import similarity as S
from epe_data_wrangling_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ranks(df):
    return sorted((r.query_id, r.neighbor_id, r.rank) for r in df.collect())


def test_arrow_topk_matches_expression_topk(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = S.brute_topk(q, e, vec_col="embedding", id_col="vec_id", k=5)
    arrow = S.brute_topk_arrow(q, e, vec_col="embedding", id_col="vec_id", k=5)
    assert _ranks(arrow) == _ranks(exact)


def test_ivf_probes_subset_recall(spark):
    """IVF top-k is drawn from probed cells only; every reported
    neighbor must also appear in the exact scan's candidate scores at
    equal-or-lower cosine rank never *better* than exact."""
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id): r.rank
        for r in S.brute_topk(q, e, vec_col="embedding", id_col="vec_id", k=50).collect()
    }
    ivf = S.ivf_topk(
        q, e, vec_col="embedding", id_col="vec_id", k=3, n_centroids=8, n_probe=8
    ).collect()
    # probing ALL cells == exhaustive: ranks must match exact top-3
    for r in ivf:
        assert exact[(r.query_id, r.neighbor_id)] == r.rank


def test_arrow_rank_gap_witness(spark):
    """The contract that lets `ann_cosine_topk_arrow` certify at RANK
    level: for every query in its set (vec_id < 10), the EXACT cosine
    scores' adjacent gaps at the top-6 boundary (ranks 1→2 … 5→6 —
    rank membership and ordering both live inside these) must exceed
    1e-9 at BOTH the test and the driver scale factor. Summation-order
    noise between numpy's pairwise reduction and the expression tree's
    sequential order is ~1e-15, so a gap floor of 1e-9 proves no rank
    can flip between the two implementations — measured floors are
    ~5.7e-5 (sf0.001) and ~1.9e-5 (sf0.01). The checked scale factors
    are DERIVED, not hardcoded: every sf* dir the driver's testdata
    root contains, plus $SPARK_GRAFT_SF_DIR if set — a new scale
    factor can never silently escape the gap guarantee."""
    import glob
    import os

    from pyspark.sql import Window

    sf_dirs = sorted(
        os.path.dirname(p)
        for p in glob.glob("/root/testdata/sf*/embeddings.parquet")
    )
    env_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if env_dir and os.path.exists(
        os.path.join(env_dir, "embeddings.parquet")
    ) and env_dir.rstrip("/") not in sf_dirs:
        sf_dirs.append(env_dir.rstrip("/"))
    assert SF_DIR in sf_dirs, "test SF missing from the derived witness set"
    for sf_dir in sf_dirs:
        e = load_table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 10)
        scored = S.brute_topk(
            q, e, vec_col="embedding", id_col="vec_id", k=6
        )
        w = Window.partitionBy("query_id").orderBy("rank")
        gaps = (
            scored.withColumn(
                "gap", F.col("cos_sim") - F.lead("cos_sim").over(w)
            )
            .filter(F.col("gap").isNotNull())
            .agg(F.min("gap").alias("min_gap"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        assert gaps["n"] == 50, f"{sf_dir}: expected 10 queries x 5 gaps"
        assert gaps["min_gap"] > 1e-9, (
            f"{sf_dir}: adjacent exact-score gap {gaps['min_gap']} too "
            "small — rank-level certification of the arrow twin unsafe"
        )


def test_retrieval_quality_report_matches_duckdb(spark):
    """The unregistered retrieval-quality operator (MRR + mean binary
    NDCG@k of the trained-IVF serve path vs exact ground truth) must
    match its DuckDB oracle EXACTLY — the same differential the driver
    would run; registration is an r16 window candidate. Exactness
    holds because the position weights are Python-staged BIGINT
    literals on both engines and each metric divides once at the
    end."""
    import duckdb

    from epe_data_wrangling_spark.catalog.similarity_q import (
        _retrieval_quality_oracle,
        retrieval_quality_report,
    )

    got = retrieval_quality_report(spark, SF_DIR).collect()
    assert len(got) == 1
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = con.execute(_retrieval_quality_oracle()).fetchall()
    assert len(want) == 1
    g, w = got[0], want[0]
    assert (
        g.method, g.n_queries, g.n_answered, g.mrr, g.mean_ndcg
    ) == tuple(w)
    assert g.n_answered == g.n_queries  # every query found candidates here
    # sanity: the IVF path finds the true top-1 for most queries
    assert g.mrr > 0.8 and 0.5 < g.mean_ndcg <= 1.0
