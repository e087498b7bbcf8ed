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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions import vectors as V

#: Default bound on the corpus slice farthest-first seeding actually
#: traverses (`farthest_first_seeds`): the k−1 argmax scans run over
#: the ``SPREAD_SAMPLE_CAP`` rows with the lowest
#: (md5(CAST(id AS string)), id) — a deterministic, stateless,
#: SQL-mirrorable uniform sample (md5 is the one hash both engines
#: share; the certified spread oracles unroll the same ORDER BY …
#: LIMIT). This decouples seeding cost from corpus size: one
#: TakeOrdered pass over the corpus (per-partition top-cap heaps, no
#: full sort) + k−1 scans of ≤ cap rows, instead of k−1 serialized
#: full-corpus scans — the difference between a retrain that seeds in
#: seconds and one that re-reads 100 TB sixty-three times at k=64.
#: Identity when the corpus is smaller than the cap (every row kept),
#: which holds at every certification scale, so the hash-certified
#: spread queries are unchanged by sampling. 4096 points is far more
#: than k ever needs to find every drift cluster a k-cell quantizer
#: could separate (a cluster holding ≥ ~0.1% of the corpus lands
#: ~4 sample points).
SPREAD_SAMPLE_CAP = 4096

#: Documented bound on k for farthest-first seeding: the accumulated
#: min-dist expression is O(k) dot products deep (one per chosen
#: seed), and past ~64 terms the codegen/analysis cost of that
#: expression — not the (sample-bounded) scan — dominates.
#: `ann_index_maintain` falls back to 'lowest' seeding with a warning
#: beyond this rather than hand a production target an expression
#: the planner chokes on.
SPREAD_SEED_MAX_K = 64


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
        # broadcast-array argmin (V.nearest_centroid): same (dist2,
        # cid) pick as the former per-id window over a k-way
        # crossJoin, but as a row-wise expression — the corpus is
        # scanned once and NEVER shuffled by the assignment (the
        # window form exchanged+sorted k× the corpus per iteration)
        c = cents_df.withColumn("cc", V.dot(F.col("c"), F.col("c")))
        cands = V.centroid_array(c.select("cid", "c", "cc"))
        best = V.nearest_centroid(F.col("_cands"), F.col("v"), F.col("vv"))
        return (
            ev.crossJoin(F.broadcast(cands))
            .withColumn("_best", best)
            .filter(F.col("_best").isNotNull())  # empty-centroids parity
            .select(id_col, "v", F.col("_best.cid").alias("cid"))
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
    ev: DataFrame, k: int, id_col: str = "vec_id",
    sample_cap: int | None = SPREAD_SAMPLE_CAP,
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

    Cost: one TakeOrdered pass over the corpus to draw the
    deterministic md5-ranked sample (``sample_cap`` rows — see
    `SPREAD_SAMPLE_CAP`; pass None to traverse the full corpus), then
    k−1 argmax scans over the ≤ cap-row sample plus k−1 one-row
    collects — bounded regardless of corpus size, but still a
    retrain-cadence operation, not a per-batch one. The accumulated
    min-dist expression holds one dot product per chosen seed, so
    keep k modest (≤ `SPREAD_SEED_MAX_K`) — beyond that the
    O(k)-deep codegen expression is the limit, not the scan.
    Returns (cid 0..k−1 BIGINT in pick order, c array<double>)."""
    pts = ev.select(id_col, "v", "vv")
    if sample_cap is not None:
        # the SQL-mirrored sample rule: the cap rows with the lowest
        # (md5(CAST(id AS string)), id). orderBy+limit compiles to
        # TakeOrdered — per-partition top-cap heaps merged on the
        # driver, one corpus pass, never a full sort. Materialize the
        # tiny result so the k−1 argmax scans below never touch the
        # corpus again.
        pts = (
            pts.orderBy(
                F.md5(F.col(id_col).cast("string")), F.col(id_col)
            )
            .limit(sample_cap)
            .localCheckpoint(eager=True)
        )
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
        if any(list(nxt["v"]) == list(s["v"]) for s in seeds):
            # the argmax winner is BIT-EQUAL to a chosen seed: its d²
            # to that seed is exactly 0 (same dot fold both sides), so
            # every point's min-dist is ≤ 0 from here on and adding
            # the duplicate changes no point's min — the SQL mirror,
            # which unrolls all k steps, picks this same point at
            # every remaining step (same ordering over unchanged d²,
            # same id tie-break). All its remaining seeds are thus
            # copies that can never win an argmin tie-break (lower
            # cid wins), so stopping here trains the SAME means as
            # the full-k mirror, whose empty duplicate cells drop in
            # the mean update. Note the test is vector EQUALITY, not
            # d² ≤ 0: catastrophic cancellation in vv − 2·dot + svv
            # can round d² to ≤ 0 for a DISTINCT near-duplicate — the
            # mirror would seed that distinct point, so we must too.
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
