"""Similarity search over embedding columns (north star surface).

Two paths, the standard trade:

- ``brute_topk``: exact top-k by cosine — a broadcast-join scan. At
  100 TB the candidate side stays partition-parallel and the only
  shuffle is the per-query top-k merge (block-local top-k then global
  merge, the REPOSE-style distributed pattern — PAPERS.md): Spark's
  Window + row_number plans exactly that (partial sort per partition,
  merge per query key).
- ``hyperplane_bucket`` + ``lsh_topk``: sign-LSH (random hyperplane)
  bucketing. Bucket assignment is a narrow per-row expression over
  frozen literal planes (_planes.py); search then joins within a
  bucket only, turning O(n) scans per query into O(n/2^b) with the
  usual recall trade. The verify step reuses the exact cosine.

Cosine is ``functions.vectors.cosine`` — double-accumulated via
zip_with/aggregate, bit-identical to the DuckDB oracle's
list_dot_product formulation (verified empirically: 0 ulp difference
over 9790 pairs), so thresholds and rankings need no rounding fuzz.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.operators._planes import PLANES
from epe_data_wrangling_spark.functions.vectors import cosine, dot


def brute_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (self excluded).
    Returns (query_id, neighbor_id, rank, cos_sim); rank ties broken
    by neighbor id for a deterministic total order."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def hyperplane_bucket(vec: Column) -> Column:
    """Sign-LSH bucket id: one character per plane ('1' if v·p ≥ 0).
    Narrow, codegen'd, reproducible in SQL from the same literals."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in plane])) >= 0, "1").otherwise("0")
        for plane in PLANES
    ]
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within it. Same output shape as
    ``brute_topk`` (minus cos_sim ties beyond the bucket)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col)).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
