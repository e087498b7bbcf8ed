"""Distributed k-means (Lloyd) — the IVF coarse-quantizer trainer,
factored out so the batch catalog query (`mlprep_q.kmeans_lloyd_centroids`)
and the streaming index sink (`streaming.ann_index`) train with ONE
implementation that cannot drift (the same discipline as the BPE
train/apply pair's shared `_bpe_fit`).

Shape per iteration (the canonical distributed Lloyd): one argmin
pass of the corpus against the BROADCAST centroids using
dist² = ‖v‖² − 2·v·c + ‖c‖² with per-side norms precomputed, then a
(cluster, dim) partial-aggregated mean whose exchange carries K·dims
rows — the corpus is scanned once per iteration and never shuffled.
Mean components are staged as round(x·1e9) BIGINT so the sums are
integer-exact and order-free (hash-stable cross-engine; the DuckDB
oracle mirrors the staging)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions import vectors as V


def lloyd_means(
    ev: DataFrame, k: int, iters: int, id_col: str = "vec_id"
) -> DataFrame:
    """Train ``iters`` full Lloyd iterations over ``ev`` (columns
    ``id_col``, ``v`` array<double>, ``vv`` = v·v) with deterministic
    init (the ``k`` lowest ids' vectors) and return the trained means
    as (cid, dim, n_vecs, mean_val) rows."""
    cents = (
        ev.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col("v").alias("c"))
    )
    staged = F.round(F.col("x") * F.lit(1e9)).cast("bigint")

    def assign(cents_df: DataFrame) -> DataFrame:
        c = cents_df.withColumn("cc", V.dot(F.col("c"), F.col("c")))
        dist2 = (F.col("vv") - 2 * V.dot(F.col("v"), F.col("c"))) + F.col("cc")
        w = Window.partitionBy(id_col).orderBy(F.col("dist2"), F.col("cid"))
        return (
            ev.crossJoin(F.broadcast(c.select("cid", "c", "cc")))
            .withColumn("dist2", dist2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, "v", "cid")
        )

    def update(assigned: DataFrame) -> DataFrame:
        x = assigned.select("cid", F.posexplode(F.col("v")).alias("dim", "x"))
        return x.groupBy("cid", "dim").agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (
                F.sum(staged).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e9)
            ).alias("mean_val"),
        )

    means = update(assign(cents))
    for _ in range(iters - 1):
        means = update(assign(means_to_centroids(means)))
    return means.select("cid", "dim", "n_vecs", "mean_val")


def means_to_centroids(means: DataFrame) -> DataFrame:
    """(cid, dim, mean_val) rows → (cid, c array<double>) centroid
    vectors, dims ordered."""
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
            lambda s: s["mean_val"],
        ).alias("c")
    )
