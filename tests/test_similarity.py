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
