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
    ev: DataFrame, k: int, iters: int, id_col: str = "vec_id",
    init: DataFrame | None = None,
) -> DataFrame:
    """Train ``iters`` full Lloyd iterations over ``ev`` (columns
    ``id_col``, ``v`` array<double>, ``vv`` = v·v) with deterministic
    init (the ``k`` lowest ids' vectors, or the caller's ``init``
    centroids (cid, c) — e.g. `farthest_first_seeds` for drifted
    corpora) and return the trained means as
    (cid, dim, n_vecs, mean_val) rows."""
    cents = (
        init
        if init is not None
        else ev.orderBy(id_col)
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


def farthest_first_seeds(
    ev: DataFrame, k: int, id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic FARTHEST-FIRST ("spread") seeding — the init for
    re-training over a DRIFTED corpus, where the default lowest-id
    init fails structurally: the lowest ids are by construction the
    OLDEST rows, so every seed starts inside the original cluster, and
    plain Lloyd cannot migrate a seed across a cluster gap at any
    iteration count (measured in SCALE.md r15: after 6 drifted
    generations, lowest-id retrain leaves skew 2.6 at k=8 and 6.9 at
    k=16 — MORE cells make it worse because all of them seed in the
    old cluster). Farthest-first traversal (Gonzalez 1985) is the
    classic deterministic fix: seed 1 = the lowest id's vector; seed
    i+1 = the point maximizing its min dist² to the chosen seeds
    (ties by lowest id). Every step is exactly mirrorable in SQL
    (the certified retrain-spread oracle unrolls the same chain), so
    determinism — the property the lowest-id init existed for — is
    kept.

    Cost: k−1 corpus scans (each a broadcast-free argmax over the
    accumulated min-dist expression) plus k−1 one-row collects —
    deliberate for a retrain-cadence operation; do not use it on the
    per-batch ingest path. The accumulated expression holds one dot
    product per chosen seed, so keep k modest (≤ ~64) or pre-sample.
    Returns (cid 0..k−1 BIGINT in pick order, c array<double>)."""
    pts = ev.select(id_col, "v", "vv")
    head = pts.orderBy(id_col).limit(1).collect()
    if not head:
        raise ValueError(
            "farthest_first_seeds: the corpus is empty — nothing to seed"
        )
    seeds = [head[0]]
    dexprs = []
    for _ in range(k - 1):
        s = seeds[-1]
        sv = F.array(*[F.lit(float(x)) for x in s["v"]])
        # same operation tree as the serve/assign d²; the seed's norm
        # comes from the engine-computed ``vv`` (collected, not
        # recomputed in Python) so both engines fold identically
        dexprs.append(
            (F.col("vv") - 2 * V.dot(F.col("v"), sv)) + F.lit(float(s["vv"]))
        )
        mind = dexprs[0] if len(dexprs) == 1 else F.least(*dexprs)
        nxt = (
            pts.select(id_col, "v", "vv", mind.alias("_fd"))
            .orderBy(F.col("_fd").desc(), F.col(id_col))
            .limit(1)
            .collect()[0]
        )
        if nxt["_fd"] <= 0.0:
            # every remaining point coincides with a chosen seed
            # (d² is exactly 0 for bit-identical vectors): stop —
            # further picks would be duplicate seeds that can never
            # win an argmin tie-break (lower cid wins), so returning
            # fewer seeds yields the SAME trained means as the SQL
            # mirror, which unrolls all k steps and lets the empty
            # duplicate cells drop in the mean update.
            break
        seeds.append(nxt)
    sc = ev.sparkSession
    return sc.createDataFrame(
        [(i, list(map(float, s["v"]))) for i, s in enumerate(seeds)],
        "cid BIGINT, c ARRAY<DOUBLE>",
    )


def means_to_centroids(means: DataFrame) -> DataFrame:
    """(cid, dim, mean_val) rows → (cid, c array<double>) centroid
    vectors, dims ordered."""
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
            lambda s: s["mean_val"],
        ).alias("c")
    )
