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
    # repartition the STREAMED (query) side: the non-equi join is a
    # BroadcastNestedLoopJoin whose parallelism equals the streamed
    # side's partition count — a 1-partition small-file query scan
    # would run every query×candidate cosine in one task
    n = 2 * queries.sparkSession.sparkContext.defaultParallelism
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).repartition(
        n, "query_id"
    )
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


def hyperplane_bucket(vec: Column, *, n_planes: int | None = None) -> Column:
    """Sign-LSH bucket id: one character per plane ('1' if v·p ≥ 0).
    Narrow, codegen'd, reproducible in SQL from the same literals."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in plane])) >= 0, "1").otherwise("0")
        for plane in PLANES[: n_planes or len(PLANES)]
    ]
    return F.concat(*bits)


def brute_topk_arrow(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Vectorized exact top-k: the small query set is collected and
    broadcast; each candidate partition computes a numpy (batch ×
    queries) cosine matrix and emits its block-local top-k; a final
    per-query window merges blocks — REPOSE-style partial top-k with
    a BLAS kernel instead of per-row expressions.

    Same results as ``brute_topk`` up to float summation order (numpy
    pairwise vs sequential), hence registered rows-only; the
    expression-based twin is the value-checked anchor. This is the
    throughput path: one Arrow pass over the corpus, k·Q rows out of
    each partition, no corpus-sized shuffle anywhere.
    """
    import numpy as np
    import pandas as pd

    q_pdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).toPandas()
    q_ids = q_pdf["query_id"].to_numpy()
    qm = np.stack(q_pdf["qv"].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    sc = candidates.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, qm))

    def fn(batches):
        ids, qmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf["neighbor_id"].to_numpy()
            cm = np.stack(pdf["cv"].to_numpy()).astype("float64")
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qmat.T  # (batch, queries)
            # k+1 block-local: the query's own vector may occupy a
            # slot and is filtered below
            top = min(k + 1, len(cids))
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(ids):
                col = sims[:, j]
                idx = np.argpartition(-col, top - 1)[:top] if top < len(col) else np.arange(len(col))
                for i in idx:
                    if cids[i] != qid:
                        out_q.append(qid)
                        out_n.append(cids[i])
                        out_s.append(col[i])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    scored = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).mapInPandas(fn, "query_id BIGINT, neighbor_id BIGINT, cos_sim DOUBLE")
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Assign every vector to its nearest centroid cell (max cosine,
    ties → lowest centroid id). Centroids are broadcast — assignment
    is one narrow pass over the corpus, the IVF build step."""
    v = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vv"))
    c = centroids.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
    w = Window.partitionBy("vid").orderBy(F.col("cell_sim").desc(), F.col("cell"))
    return (
        v.join(F.broadcast(c))
        .select("vid", "vv", "cell", cosine(F.col("vv"), F.col("cv")).alias("cell_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vid", "vv", "cell")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    centroid cells, then search only each query's ``n_probe`` closest
    cells. The 100 TB shape: centroids broadcast (tiny), the corpus
    is partitioned by cell, and a query touches n_probe/n_centroids
    of the data instead of all of it.

    Centroid choice here is the deterministic stand-in — the
    ``n_centroids`` lowest-id vectors — so the DuckDB oracle can
    reproduce the index bit-for-bit; a production build would train
    them offline (k-means) and broadcast the trained table through
    the identical plan.
    """
    cents = (
        candidates.select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col))
        .orderBy(id_col)
        .limit(n_centroids)
    )
    assigned = ivf_assign(candidates, cents, vec_col=vec_col, id_col=id_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = cents.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
    wp = Window.partitionBy("query_id").orderBy(F.col("cell_sim").desc(), F.col("cell"))
    probes = (
        q.join(F.broadcast(c))
        .select("query_id", "qv", "cell", cosine(F.col("qv"), F.col("cv")).alias("cell_sim"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    wk = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vid"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("vv")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


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
