"""Deduplication operators for the training-data pipeline surface
(north star — BASELINE.json; no counterpart in the reference, which
dedups nothing).

Families, each with an explicit shuffle story so the plan survives
100 TB (SURVEY §4.4):

- **Exact** (`exact_dedup`): group by md5(text). The shuffle carries a
  16-byte key + doc id, never the text. Classic hash-groupBy dedup.
- **MinHash + LSH** (`minhash_lsh_pairs`): shingle → ONE md5 per
  shingle reduced to an integer base hash → k frozen universal-hash
  projections folded to the signature in a single aggregate pass →
  banded keys → explode + self-join on the band key. Candidate
  generation is one shuffle on the band key; the O(n²) all-pairs
  compare never happens. k=16, b=8, r=2 ⇒ P(candidate) = 1-(1-j²)⁸
  (≈0.9997 at j=0.8).
- **SimHash** (`simhash_pairs`, `simhash_dedup_groups`): columnar
  32-bit sign sketch (explode tokens → 32 SUM hash-aggregate), then
  multi-block LSH (Hamming ≤ 3 guarantees ≥ 1 identical block of 4
  by pigeonhole) + exact Hamming verify. Pair enumeration is
  quadratic per duplicate cluster — `simhash_dedup_groups` is the
  density-safe shape (identical sketches collapse first, the join
  runs over distinct sketches only; see SCALE.md).
- **Exact n-gram Jaccard** (`ngram_jaccard_pairs`): explode shingles,
  join on shingle equality for candidates, verify set Jaccard. The
  non-sketched baseline; at 100 TB prefer the MinHash path (bounded
  candidate fan-out) — this one's fan-out is data-dependent.
- **Embedding cosine** (`embedding_neardup_pairs`,
  `embedding_neardup_bucketed`): threshold on exact cosine —
  brute-force, and the sign-LSH-bucketed scale path.
- **Clusters** (`connected_components`): pairs → components →
  keep-one-per-cluster, the terminal step of a dedup pipeline.

Every sketch is reproduced exactly by the DuckDB oracle
(functions.hashing + catalog.ducksql share the md5/integer
arithmetic); everything on the data path is JVM-side Catalyst
expressions — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.functions.hashing import (
    lsh_band_keys,
    minhash_signature,
    simhash,
)
from epe_data_wrangling_spark.functions.text import word_shingles
from epe_data_wrangling_spark.functions.vectors import cosine
from epe_data_wrangling_spark.functions.vectors import dot as dot_


def _spread(df: DataFrame, *keys: str) -> DataFrame:
    """Explicit exchange barrier: repartition on ``keys`` with a fixed
    partition count (2× default parallelism).

    Two jobs in one node. (1) *Parallelism*: the small-file scans of
    the test corpus arrive as 1 task; the sketch math after this
    barrier runs on every core. (2) *Materialize-once*: Catalyst's
    projection collapse would otherwise inline the (expensive) sketch
    expressions into every downstream consumer — 8 band keys × 2
    self-join branches recompute a 16-hash signature 16×. A shuffle
    boundary pins the projection below it to exactly one evaluation,
    and identical subtrees above it are unified by ReuseExchange.
    The explicit count keeps AQE from coalescing the tiny exchange
    back to one partition (data is small, compute is not).
    """
    n = 2 * df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one surviving (min) id per distinct
    text plus the duplicate count. Shuffles md5 keys, not text."""
    return (
        df.groupBy(F.md5(text_col).alias("fingerprint"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return _spread(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(word_shingles(text_col, n)).alias("shingles"),
        ),
        "doc_id",
    )


def _jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def _verify_pairs(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sb"))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", _jaccard(F.col("sa"), F.col("sb")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 5,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs (a_id < b_id, exact Jaccard ≥ threshold) with
    MinHash-LSH candidate generation. Returns (a_id, b_id, jaccard)."""
    rows_per_band = num_hashes // bands
    sh = _shingle_sets(df, text_col, id_col, shingle_n)
    # Materialize the k-hash signature behind its own exchange so band
    # keys / both join branches read it instead of recomputing it.
    sig = _spread(
        sh.select("doc_id", minhash_signature(F.col("shingles"), num_hashes).alias("sig")),
        "doc_id",
    )
    banded = sig.select(
        "doc_id",
        F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("bk"),
    )
    a = banded.select(F.col("doc_id").alias("a_id"), "bk")
    b = banded.select(F.col("doc_id").alias("b_id"), "bk")
    cand = (
        a.join(b, "bk")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return _verify_pairs(cand, sh, threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 5,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs via exact shared-shingle candidates + Jaccard
    verify. Returns (a_id, b_id, jaccard).

    Hot-shingle cap (OPT-IN, default None = exact candidates, the
    pre-r11 semantics): a stop-shingle shared by f documents ("the
    quick brown fox …" boilerplate) alone contributes O(f²) candidate
    pairs — the skew-quadratic failure mode of the exploded self-join
    at corpus scale — so when ``max_shingle_freq`` is set, shingles
    whose DOCUMENT FREQUENCY exceeds it are dropped from candidate
    GENERATION only (the same suppression the module's siblings apply:
    LSH banding in `minhash_lsh_pairs`, ``max_gram_freq`` in
    `shared_span_pairs` — both of which also opt in at call sites).
    The verify step still scores Jaccard over FULL shingle sets, so
    surviving pairs' scores are unbiased; a pair loses candidacy only
    when every shingle it shares is hotter than the cap — boilerplate
    by construction at any sane cap. The frequency count rides a
    window partitioned by the shingle, the same key the candidate
    join shuffles on, so the cap adds no extra exchange. Corpus-scale
    callers SHOULD set a cap (the catalog query uses 1000)."""
    sh = _shingle_sets(df, text_col, id_col, shingle_n)
    exploded = sh.select("doc_id", F.explode("shingles").alias("s"))
    if max_shingle_freq is None:
        rare = exploded
    else:
        rare = (
            exploded.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("s"))
            )
            .filter(F.col("_df") <= max_shingle_freq)
            .drop("_df")
        )
    a = rare.select(F.col("doc_id").alias("a_id"), "s")
    b = rare.select(F.col("doc_id").alias("b_id"), "s")
    cand = (
        a.join(b, "s")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return _verify_pairs(cand, sh, threshold)


def simhash_sketches(df: DataFrame, text_col: str, id_col: str, *, num_bits: int = 16) -> DataFrame:
    """Columnar SimHash: explode distinct tokens, reduce each token to
    one 32-bit integer hash (md5 evaluated once per token), then ONE
    hash-aggregate with ``num_bits`` SUM columns — partial+final with
    map-side combine, whole-stage codegen, no per-token array
    allocation. ~5× faster than the higher-order-fold formulation at
    50k docs; bit values identical (bit j = bit j of the md5 hex).

    Docs whose token set is empty keep a row (explode_outer) and get
    the all-zero-tally sketch, matching the fold semantics."""
    from epe_data_wrangling_spark.functions.text import words

    if num_bits > 32:
        raise ValueError("simhash_sketches packs from the first 32 md5 bits")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.array_distinct(words(text_col))).alias("t"),
    )
    h = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("bigint")
    sums = [
        F.coalesce(
            F.sum((F.shiftright(h, 31 - j) % 2) * 2 - 1), F.lit(0)
        ).alias(f"_t{j}")
        for j in range(num_bits)
    ]
    tallies = toks.groupBy("doc_id").agg(*sums)
    packed = F.lit(0).cast("long")
    for j in range(num_bits):
        bit = F.when(F.col(f"_t{j}") >= 0, F.lit(1)).otherwise(F.lit(0))
        packed = packed * 2 + bit.cast("long")
    return tallies.select("doc_id", packed.alias("sh"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_bits: int = 16,
    blocks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, found via
    multi-block LSH (pigeonhole-complete for max_hamming < blocks).
    Returns (a_id, b_id, hamming)."""
    bits_per_block = num_bits // blocks
    mask = (1 << bits_per_block) - 1
    # Barrier: the 16 per-bit aggregates are evaluated once, not once
    # per block expression per join branch (see _spread).
    sk = _spread(simhash_sketches(df, text_col, id_col, num_bits=num_bits), "doc_id")
    blocked = sk.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(i), (F.shiftright("sh", i * bits_per_block) % F.lit(mask + 1))
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("blk"),
    )
    a = blocked.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("ha"), "blk")
    b = blocked.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("hb"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of an undirected pair graph → (node, rep)
    with rep = min node id in the component — the step that turns
    near-dup PAIRS into dedup CLUSTERS (keep rep, drop the rest).

    Iterative min-label propagation: each round every node takes the
    minimum label among itself and its neighbors; converges in
    O(component diameter) rounds (near-dup clusters are shallow).
    Each round is one join + one aggregate, localCheckpointed so the
    plan stays flat; the loop stops early at fixpoint. The fixpoint
    is unique, so results are deterministic regardless of execution
    order — which is what makes this iterative operator
    oracle-checkable (DuckDB recursive CTE computes the same
    min-reachable-id).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("rep", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("rep").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(F.col("rep"), F.coalesce(F.col("nmin"), F.col("rep"))).alias("rep"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Falling through with changed labels means some component has
        # diameter > max_iter and the returned reps would be silently
        # wrong (partial propagation) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not reach fixpoint within {max_iter} "
            "iterations (component diameter exceeds max_iter); raise max_iter"
        )
    return labels


def simhash_dedup_groups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_bits: int = 32,
    blocks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Cluster-level SimHash near-dedup — the shape that survives high
    duplicate density. ``simhash_pairs`` enumerates doc-level pairs,
    which is inherently quadratic in cluster size (10 replicas of a
    doc = 45 pairs; measured: 50k docs with 10× replication → 90M
    pairs). This operator instead:

    1. collapses identical sketches to (sketch, keep_id = min doc,
       n_docs) — the exact-dup groups, one hash aggregate;
    2. Hamming-joins only the DISTINCT sketches (multi-block LSH,
       same pigeonhole guarantee) — candidate volume depends on
       distinct-sketch count, not document count.

    Returns (a_keep_id, b_keep_id, hamming, a_n_docs, b_n_docs):
    one row per near-dup *group pair* plus implicit exact groups.
    Full transitive clustering is an iterative driver loop (or a
    connected-components pass) over this edge list — deliberately not
    folded in here, since one Hamming hop is what the sketch
    guarantees."""
    bits_per_block = num_bits // blocks
    mask = (1 << bits_per_block) - 1
    sk = simhash_sketches(df, text_col, id_col, num_bits=num_bits)
    groups = _spread(
        sk.groupBy("sh").agg(
            F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs")
        ),
        "sh",
    )
    blocked = groups.select(
        "sh",
        "keep_id",
        "n_docs",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(i), (F.shiftright("sh", i * bits_per_block) % F.lit(mask + 1))
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("blk"),
    )
    a = blocked.select(F.col("sh").alias("ha"), F.col("keep_id").alias("a_keep_id"),
                       F.col("n_docs").alias("a_n_docs"), "blk")
    b = blocked.select(F.col("sh").alias("hb"), F.col("keep_id").alias("b_keep_id"),
                       F.col("n_docs").alias("b_n_docs"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("ha") < F.col("hb"))
        .select(
            "a_keep_id", "b_keep_id",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
            "a_n_docs", "b_n_docs",
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.45,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold. Brute-force
    pair join (exact); ``embedding_neardup_bucketed`` is the
    LSH-restricted scale path with the same verify expression."""
    # _spread the STREAMED side: the non-equi pair join is a
    # BroadcastNestedLoopJoin that parallelizes over the streamed
    # side's partitions, and a small-file scan arrives as ONE
    # partition — serializing all n²/2 cosine evaluations in a single
    # task (measured 4.5 s warm at 500×64d; ~0.6 s spread)
    a = _spread(
        df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va")), "a_id"
    )
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_neardup_bucketed(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.45,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding near-dup pairs restricted to sign-LSH buckets (the
    first ``n_planes`` frozen hyperplanes of ``operators.similarity``):
    candidates are the within-bucket pairs only — expected
    O(n²/2^n_planes) — then the exact cosine verify.

    ``n_planes`` is the recall/selectivity dial: a same-bucket pair at
    angle θ has probability (1 − θ/π)^n_planes, so high thresholds
    (0.9+, the usual near-dup bar) tolerate all 8 planes, while low
    thresholds need fewer planes (or multiple tables) to keep
    recall."""
    from epe_data_wrangling_spark.operators.similarity import hyperplane_bucket

    withb = _spread(
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            hyperplane_bucket(F.col(vec_col), n_planes=n_planes).alias("bucket"),
        ),
        "vid",
    )
    a = withb.select(F.col("vid").alias("a_id"), F.col("v").alias("va"), "bucket")
    b = withb.select(F.col("vid").alias("b_id"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def shared_span_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 8,
    min_run: int = 12,
    max_gram_freq: int = 10,
) -> DataFrame:
    """Maximal shared word-runs between document pairs — the
    relational approximation of exact-substring training-data dedup
    (suffix-array spans à la "Deduplicating Training Data Makes
    Language Models Better"; PAPERS.md): find every pair of documents
    sharing a run of ≥ ``min_run`` consecutive identical words and
    report the run's position in both.

    Shape: (1) seed matches = positional ``n``-gram md5 join (grams
    occurring in > ``max_gram_freq`` positions corpus-wide are
    suppressed first — boilerplate shingles are what makes naive
    substring joins quadratic); (2) seeds on the same pair and
    DIAGONAL (i − j constant) with consecutive i form one run —
    classic gaps-and-islands (island = i − row_number); (3) a run of
    k seeds spans k + n − 1 words. The shuffles carry md5 keys,
    positions, and pair ids — never text. Returns
    (doc_a, doc_b, a_start, b_start, len_words), 1-based starts.
    """
    from epe_data_wrangling_spark.functions.expr import bind
    from epe_data_wrangling_spark.functions.text import words

    grams_arr = bind(
        words(text_col),
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    # unhex: the 32-char md5 hex only ever gates
                    # EQUALITY (seed join + frequency count — never
                    # output), and hex↔bytes is a bijection, so the
                    # 16-byte binary form has identical equality
                    # classes while halving every gram-keyed shuffle
                    # row (guide §2.3 "narrower types")
                    F.unhex(
                        F.md5(F.concat_ws(" ", F.slice(w, i, n)).cast("binary"))
                    ).alias("g"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,g:binary>>")),
    )
    grams = (
        df.select(F.col(id_col).alias("_id"), F.explode(grams_arr).alias("s"))
        .select("_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    )
    # exchange barrier on g (see _spread): the shingle explode+md5 is
    # referenced by the frequency count AND both self-join sides —
    # without the barrier Catalyst inlines it into every branch
    # (~4 evaluations); with it, one evaluation + ReuseExchange, and
    # the count/join/self-join are all partition-aligned on g
    grams = _spread(grams, "g")
    rare = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_c")).filter(
        F.col("_c") <= max_gram_freq
    )
    g2 = grams.join(rare.select("g"), "g")
    a, b = g2.alias("a"), g2.alias("b")
    seeds = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a._id") < F.col("b._id"))
    ).select(
        F.col("a._id").alias("doc_a"),
        F.col("b._id").alias("doc_b"),
        F.col("a.pos").alias("i"),
        F.col("b.pos").alias("j"),
    )
    win = Window.partitionBy("doc_a", "doc_b", "d").orderBy("i")
    runs = (
        seeds.withColumn("d", F.col("i") - F.col("j"))
        .withColumn("isl", F.col("i") - F.row_number().over(win))
        .groupBy("doc_a", "doc_b", "d", "isl")
        .agg(
            F.min("i").alias("a_start"),
            F.min("j").alias("b_start"),
            (F.count(F.lit(1)) + F.lit(n - 1)).cast("int").alias("len_words"),
        )
    )
    return runs.filter(F.col("len_words") >= min_run).select(
        "doc_a", "doc_b", "a_start", "b_start", "len_words"
    )


def semantic_dedup_summary(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 8,
    threshold: float = 0.45,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then search for semantic duplicates WITHIN each
    cluster only — the observation that near-duplicates land in the
    same k-means cell turns the all-pairs O(n²) cosine search into
    O(Σ n_c²), the same density argument as the LSH buckets but with
    data-adaptive cells.

    Clustering here is the assignment step against K deterministic
    seed centroids (the K lowest ids — swap in kmeans_lloyd-trained
    centroids for the paper's full recipe; assignment is the part
    that touches the corpus and the part that must scale). Within
    each cell, pairs at cosine ≥ threshold are duplicates and every
    member with a lower-id partner is DROPPED (the paper keeps one
    exemplar per duplicate group; lowest id is the deterministic
    choice).

    Returns one row per cluster: (cid, n_members, n_pairs,
    n_dropped). 100 TB shape: centroids broadcast (K rows), one
    corpus scan for assignment, and the pair join shuffles on cid so
    each cell's quadratic work is partition-local; cell-size skew is
    the known SemDeDup hazard — cap cluster radius by raising K."""
    ev = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vv", dot_(F.col("v"), F.col("v")))
    cents = (
        ev.orderBy("vid").limit(k).select(F.col("vid").alias("cid"), F.col("v").alias("c"))
    ).withColumn("cc", dot_(F.col("c"), F.col("c")))
    dist2 = (F.col("vv") - 2 * dot_(F.col("v"), F.col("c"))) + F.col("cc")
    w = Window.partitionBy("vid").orderBy(F.col("dist2"), F.col("cid"))
    assigned = (
        ev.crossJoin(F.broadcast(cents))
        .withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cid", "vid", "v")
    )
    a = assigned.select("cid", F.col("vid").alias("a_id"), F.col("v").alias("va"))
    b = assigned.select("cid", F.col("vid").alias("b_id"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, "cid")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("cid", "a_id", "b_id")
    )
    members = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    pair_stats = pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("b_id").alias("n_dropped"),
    )
    return (
        members.join(pair_stats, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
    )
