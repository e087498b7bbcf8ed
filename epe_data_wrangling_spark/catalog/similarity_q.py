"""Similarity-search suite over the embeddings table (north star):
exact brute-force cosine top-k and hyperplane-LSH-bucketed ANN.
Operators in operators.similarity; cosine is bit-identical across
engines so rankings need no rounding fuzz.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog import ducksql as D
from epe_data_wrangling_spark.operators import similarity as S
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)


@query(
    "ann_cosine_topk",
    headline=True,
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {D.cosine('q.v', 'c.v')} AS cos_sim
      FROM e q JOIN e c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10)
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored) t
    WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first 10 query vectors
    (operators.similarity.brute_topk). The window plans block-local
    top-k + per-query merge — the distributed top-k pattern
    (REPOSE-style, PAPERS.md) — so no global sort exists at any
    scale."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_topk(
        e.filter(F.col("vec_id") < 10), e, vec_col="embedding", id_col="vec_id", k=5
    )


@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {D.hyperplane_bucket('v')} AS bucket FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {D.cosine('q.v', 'c.v')} AS cos_sim
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 50)
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored) t
    WHERE rank <= 3
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 within sign-LSH buckets (8 frozen
    hyperplanes; operators.similarity.lsh_topk). The scale path: the
    bucket join replaces the O(queries × corpus) scan with
    O(queries × corpus / 2⁸) expected candidates."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.lsh_topk(
        e.filter(F.col("vec_id") < 50), e, vec_col="embedding", id_col="vec_id", k=3
    )
