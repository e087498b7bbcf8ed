"""Residual product quantization — the PQ half of the IVF×PQ
composition, factored out of the batch `catalog.mlprep_q.ann_ivfpq_topk`
so the batch query and the streaming index sink
(`streaming.ann_index.ivfpq_index_foreach_batch`) encode with ONE
implementation that cannot drift (the same discipline as
`operators.kmeans.lloyd_means` and the BPE pair's `_bpe_fit`).

All pieces operate on RESIDUALS (v − assigned-cell centroid — far
less variance than raw vectors, which is why FAISS encodes them,
by_residual=true) split into ``m`` subspaces. Codebook training is
one staged-Lloyd round per subspace with deterministic init (the
lowest ids' residuals), all subspaces in one plan — no per-subspace
loop; means are staged as round(x·1e9) BIGINT so they are
integer-exact and order-free cross-engine. At 100 TB the training
shuffles carry (m, cid, dim)-sized rows, the codebooks broadcast, and
encoded vectors are ~PQ_SUB× smaller than floats."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions import vectors as V


def split_residual_subspaces(
    res: DataFrame, m: int, sub: int, keep: list[str]
) -> DataFrame:
    """Residual rows (``keep`` id columns + ``r`` array<double> of
    m·sub dims) → one row per (id, subspace): ``keep`` + (m, rv, rvv).
    """
    return res.select(
        *keep,
        F.posexplode(
            F.array(
                *[F.slice(F.col("r"), mi * sub + 1, sub) for mi in range(m)]
            )
        ).alias("m", "rv"),
    ).withColumn("rvv", V.dot(F.col("rv"), F.col("rv")))


def with_cc(cb: DataFrame) -> DataFrame:
    return cb.withColumn("cc", V.dot(F.col("c"), F.col("c")))


def assign_codes(rsub: DataFrame, cb_cc: DataFrame, id_col: str) -> DataFrame:
    """Nearest-codebook-entry per (id, subspace) — dist² argmin against
    the broadcast codebooks. Returns ``rsub``'s rows + ``cid``.

    Physical shape: per-subspace candidate arrays joined broadcast on
    ``m`` and reduced row-wise (V.nearest_centroid) — same (d2, cid)
    winner as the former per-(id, m) window over the cbk-way join,
    without exploding cbk× rows through an exchange + sort."""
    cands = V.centroid_array(cb_cc.select("m", "cid", "c", "cc"), "m")
    best = V.nearest_centroid(F.col("_cands"), F.col("rv"), F.col("rvv"))
    cols = rsub.columns
    return (
        rsub.join(F.broadcast(cands), "m")
        .withColumn("_best", best)
        .select(*cols, F.col("_best.cid").alias("cid"))
    )


def train_residual_codebooks(
    rsub: DataFrame, cbk: int, id_col: str, init_ids: DataFrame | None = None
) -> DataFrame:
    """One staged-Lloyd round per subspace over the residual rows:
    init = the ``cbk`` lowest ids' residuals per subspace, one assign
    + integer-staged mean update. Returns codebooks (m, cid, c, cc)
    ready to broadcast.

    ``init_ids`` (r17): optional single-column (``id_col``) relation
    that MUST equal ``rsub``'s ``cbk`` lowest distinct ids. A caller
    holding the pre-split corpus passes them from a pruned base scan
    (ids only), skipping the distinct-id TakeOrdered over the
    (id × m) grid — which, when ``rsub`` is an unmaterialized plan,
    re-executes the whole residual derivation (coarse assignment
    included) just to find ``cbk`` ids. Identical codebooks by the
    grid property below."""
    # init = the cbk lowest ids' residuals per subspace. ``rsub`` is a
    # full (id × m) grid (split_residual_subspaces emits every id in
    # every subspace), so the per-m cbk lowest ids ARE the global cbk
    # lowest ids: one narrow TakeOrdered over distinct ids + a
    # broadcast semi-join replaces the former window over
    # partitionBy("m") — which funneled the whole corpus through m
    # partitions and sorted it (the anti-scale shape; guide §2.5).
    low = (
        init_ids.select(id_col)
        if init_ids is not None
        else rsub.select(id_col).distinct().orderBy(id_col).limit(cbk)
    )
    init = rsub.join(F.broadcast(low), id_col).select(
        "m", F.col(id_col).alias("cid"), F.col("rv").alias("c")
    )
    staged = F.round(F.col("x") * F.lit(1e9)).cast("bigint")
    a1 = assign_codes(rsub, with_cc(init), id_col).select(
        id_col, "m", "rv", "cid"
    )
    m1 = (
        a1.select("m", "cid", F.posexplode(F.col("rv")).alias("dim", "x"))
        .groupBy("m", "cid", "dim")
        .agg(
            (
                F.sum(staged).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e9)
            ).alias("mean_val")
        )
    )
    return with_cc(
        m1.groupBy("m", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
                lambda s: s["mean_val"],
            ).alias("c")
        )
    )
