"""Deduplication suite over documents/embeddings (north star):
exact hash dedup, MinHash-LSH, exact n-gram Jaccard, SimHash,
embedding-cosine near-dup. Operators in operators.dedup; oracles
mirror them expression-by-expression via catalog.ducksql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog import ducksql as D
from epe_data_wrangling_spark.operators import dedup as X
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

_W = D.words("text")
_SH5 = f"list_distinct({D.shingles('words', 5)})"
_JACCARD = (
    "len(list_intersect(sa.shingles, sb.shingles)) / "
    "len(list_distinct(list_concat(sa.shingles, sb.shingles)))"
)


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT md5(text) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as hash-groupBy: shuffle carries 16-byte md5 keys,
    never document bodies — the 100 TB-safe exact pass."""
    return X.exact_dedup(load_table(spark, sf_dir, "documents"), "text", "doc_id")


def _minhash_sql(num_hashes: int = 16, bands: int = 8, threshold: float = 0.8) -> str:
    r = num_hashes // bands
    sig = ", ".join(D.minhash_sig_exprs("hs", num_hashes))
    bexprs = ", ".join(D.band_exprs(bands, r))
    return f"""
    WITH w AS (SELECT doc_id, {_W} AS words FROM documents),
    sh AS (SELECT doc_id, {_SH5} AS shingles FROM w),
    hsh AS (SELECT doc_id, {D.base_hash_list('shingles')} AS hs FROM sh),
    sig AS (SELECT doc_id, {sig} FROM hsh),
    bands AS (SELECT doc_id, unnest([{bexprs}]) AS bk FROM sig),
    cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
             FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
    SELECT c.a_id, c.b_id, {_JACCARD} AS jaccard
    FROM cand c JOIN sh sa ON sa.doc_id = c.a_id
                JOIN sh sb ON sb.doc_id = c.b_id
    WHERE {_JACCARD} >= {threshold}
    """


@query("dedup_minhash_lsh", oracle=_minhash_sql(), headline=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 8×2 banded LSH candidates + exact-Jaccard verify
    at 0.8 (operators.dedup.minhash_lsh_pairs). One shuffle on band
    keys; no all-pairs compare."""
    return X.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        shingle_n=5, num_hashes=16, bands=8, threshold=0.8,
    )


#: Document-frequency cap on candidate-generating shingles (mirrored
#: EXACTLY in the oracle below — the cap is part of the operator's
#: semantics, not an approximation the oracle ignores).
NGRAM_MAX_DF = 1000


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_W} AS words FROM documents),
    sh AS (SELECT doc_id, {_SH5} AS shingles FROM w),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    rare AS (SELECT doc_id, s FROM (
               SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df
               FROM ex) t
             WHERE df <= {NGRAM_MAX_DF}),
    cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
             FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
    SELECT c.a_id, c.b_id, {_JACCARD} AS jaccard
    FROM cand c JOIN sh sa ON sa.doc_id = c.a_id
                JOIN sh sb ON sb.doc_id = c.b_id
    WHERE {_JACCARD} >= 0.25
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-shingle candidates (document frequency ≤
    {NGRAM_MAX_DF} — the hot-shingle cap that bounds the self-join's
    skew-quadratic boilerplate blowup) + Jaccard ≥ 0.25
    (operators.dedup.ngram_jaccard_pairs) — the unsketched baseline
    the MinHash path approximates. The oracle applies the identical
    cap, so the hash certifies the capped semantics."""
    return X.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        shingle_n=5, threshold=0.25, max_shingle_freq=NGRAM_MAX_DF,
    )


def _simhash_sql(num_bits: int = 32, blocks: int = 4, max_hamming: int = 3) -> str:
    bpb = num_bits // blocks
    bits = ", ".join(D.simhash_bit_exprs("wd", num_bits))
    pack = D.simhash_pack(num_bits)
    blk = ", ".join(
        f"CAST({i} AS VARCHAR) || ':' || CAST((sh >> {i * bpb}) % {2 ** bpb} AS VARCHAR)"
        for i in range(blocks)
    )
    return f"""
    WITH w AS (SELECT doc_id, list_distinct({_W}) AS wd FROM documents),
    bits AS (SELECT doc_id, {bits} FROM w),
    sk AS (SELECT doc_id, {pack} AS sh FROM bits),
    blocked AS (SELECT doc_id, sh, unnest([{blk}]) AS blk FROM sk)
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


@query("dedup_simhash", oracle=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-32 near-dup pairs (Hamming ≤ 3) via 4-block LSH
    (8-bit blocks — 256 values each, so candidate buckets stay small;
    pigeonhole-complete for Hamming < 4) + exact verify
    (operators.dedup.simhash_pairs)."""
    pairs = X.simhash_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        num_bits=32, blocks=4, max_hamming=3,
    )
    return pairs.select("a_id", "b_id", F.col("hamming").cast("int").alias("hamming"))


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 {D.cosine('a.v', 'b.v')} AS cos_sim
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT a_id, b_id, cos_sim FROM p WHERE cos_sim >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at cosine ≥ 0.45 (operators.dedup.
    embedding_neardup_pairs). Brute-force at test scale; bucket with
    the hyperplane LSH first at corpus scale."""
    return X.embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), "embedding", "vec_id", threshold=0.45
    )


def _simhash_groups_sql(num_bits: int = 32, blocks: int = 4, max_hamming: int = 3) -> str:
    bpb = num_bits // blocks
    bits = ", ".join(D.simhash_bit_exprs("wd", num_bits))
    pack = D.simhash_pack(num_bits)
    blk = ", ".join(
        f"CAST({i} AS VARCHAR) || ':' || CAST((sh >> {i * bpb}) % {2 ** bpb} AS VARCHAR)"
        for i in range(blocks)
    )
    return f"""
    WITH w AS (SELECT doc_id, list_distinct({_W}) AS wd FROM documents),
    bits AS (SELECT doc_id, {bits} FROM w),
    sk AS (SELECT doc_id, {pack} AS sh FROM bits),
    g AS (SELECT sh, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs FROM sk GROUP BY sh),
    blocked AS (SELECT sh, keep_id, n_docs, unnest([{blk}]) AS blk FROM g)
    SELECT DISTINCT a.keep_id AS a_keep_id, b.keep_id AS b_keep_id,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming,
           a.n_docs AS a_n_docs, b.n_docs AS b_n_docs
    FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.sh < b.sh
    WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
    """


@query("dedup_simhash_groups", oracle=_simhash_groups_sql())
def dedup_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level SimHash dedup (operators.dedup.
    simhash_dedup_groups): identical sketches collapse to exact
    groups first, then the Hamming-LSH join runs over DISTINCT
    sketches only — candidate volume scales with distinct-sketch
    count, not documents, which is what holds at high duplicate
    density (the doc-level pair enumeration is quadratic per
    cluster)."""
    g = X.simhash_dedup_groups(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        num_bits=32, blocks=4, max_hamming=3,
    )
    return g.select(
        "a_keep_id", "b_keep_id",
        F.col("hamming").cast("int").alias("hamming"),
        "a_n_docs", "b_n_docs",
    )


@query(
    "dedup_embedding_bucketed",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {D.hyperplane_bucket('v', 3)} AS bucket FROM e)
    SELECT a.vec_id AS a_id, c.vec_id AS b_id,
           {D.cosine('a.v', 'c.v')} AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE {D.cosine('a.v', 'c.v')} >= 0.45
    """,
)
def dedup_embedding_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH-bucketed embedding near-dup (operators.dedup.
    embedding_neardup_bucketed) — the scale path for
    dedup_embedding_cosine: within-bucket candidates only, exact-
    cosine verify. 3 planes here because the demo threshold (0.45)
    sits at ~63°, where 8-plane collision probability is ~3%; at the
    usual 0.9+ near-dup bar all 8 planes keep recall high."""
    return X.embedding_neardup_bucketed(
        load_table(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        threshold=0.45, n_planes=3,
    )


@query(
    "dedup_minhash_clusters",
    oracle=f"""
    WITH pairs AS ({_minhash_sql()}),
    edges AS (SELECT a_id AS u, b_id AS v FROM pairs
              UNION SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT u AS node FROM edges)
    SELECT node, MIN(r) AS rep FROM (
      WITH RECURSIVE reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.u, rc.r FROM reach rc JOIN edges e ON e.v = rc.node
      )
      SELECT node, r FROM reach) t
    GROUP BY node
    """,
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-LSH pairs → connected components
    (operators.dedup.connected_components, iterative min-label
    propagation) → (node, rep) with rep = min doc in the component.
    The keep-one-per-cluster step of a real dedup pipeline; the
    oracle computes the same fixpoint with a recursive CTE."""
    pairs = X.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        shingle_n=5, num_hashes=16, bands=8, threshold=0.8,
    )
    return X.connected_components(pairs, "a_id", "b_id")


SPAN_N = 8
SPAN_MIN_RUN = 12
SPAN_MAX_FREQ = 10

_W_SPAN = D.words("text")


@query(
    "dedup_shared_spans",
    headline=True,
    oracle=f"""
    WITH w AS (SELECT doc_id, {_W_SPAN} AS ws FROM documents),
    gt AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
                  md5(array_to_string(ws[u.i:u.i+{SPAN_N - 1}], ' ')) AS g
           FROM w, LATERAL unnest(generate_series(1,
                  greatest(len(ws) - {SPAN_N - 1}, 0))) u(i)),
    rare AS (SELECT g FROM (SELECT g, COUNT(*) AS c FROM gt GROUP BY g) t
             WHERE c <= {SPAN_MAX_FREQ}),
    s AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS i, b.pos AS j
          FROM gt a JOIN gt b USING (g) JOIN rare USING (g)
          WHERE a.doc_id < b.doc_id),
    r AS (SELECT doc_a, doc_b, i - j AS d, i, j,
                 i - row_number() OVER (PARTITION BY doc_a, doc_b, i - j
                                        ORDER BY i) AS isl
          FROM s)
    SELECT doc_a, doc_b,
           CAST(MIN(i) AS INTEGER) AS a_start,
           CAST(MIN(j) AS INTEGER) AS b_start,
           CAST(COUNT(*) + {SPAN_N - 1} AS INTEGER) AS len_words
    FROM r GROUP BY doc_a, doc_b, d, isl
    HAVING COUNT(*) + {SPAN_N - 1} >= {SPAN_MIN_RUN}
    """,
)
def dedup_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal shared word-runs (≥ {SPAN_MIN_RUN} words) between
    document pairs — the relational form of exact-substring dedup
    (operators.dedup.shared_span_pairs): positional {SPAN_N}-gram
    seeds with corpus-frequency suppression, diagonal gaps-and-islands
    merge, span = seeds + {SPAN_N} − 1. Unlike MinHash (whole-doc
    similarity) this localizes WHERE the overlap is — the operator
    behind surgical span removal instead of whole-doc dropping."""
    d = load_table(spark, sf_dir, "documents")
    return X.shared_span_pairs(
        d, "text", "doc_id", n=SPAN_N, min_run=SPAN_MIN_RUN,
        max_gram_freq=SPAN_MAX_FREQ,
    )


#: Incremental-ingest split: the "new batch" sources vs the standing corpus.
INCOMING_SOURCES = ("src15", "src16", "src17", "src18", "src19")


@query(
    "dedup_incremental_new_docs",
    oracle=f"""
    WITH inc AS (SELECT doc_id, source, md5(text) AS h FROM documents
                 WHERE source IN {INCOMING_SOURCES!r}),
    ex AS (SELECT DISTINCT md5(text) AS h FROM documents
           WHERE source NOT IN {INCOMING_SOURCES!r}),
    tagged AS (
      SELECT inc.doc_id, inc.source, inc.h,
             EXISTS (SELECT 1 FROM ex WHERE ex.h = inc.h) AS dup_existing
      FROM inc),
    fresh AS (
      SELECT doc_id, source, h,
             row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM tagged WHERE NOT dup_existing)
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(SUM(CASE WHEN t.dup_existing THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_vs_existing,
           CAST(SUM(CASE WHEN f.rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_within,
           CAST(SUM(CASE WHEN f.rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_accepted
    FROM tagged t LEFT JOIN fresh f ON t.doc_id = f.doc_id
    GROUP BY t.source
    """,
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup accounting — the nightly-ingest shape: a new
    batch (sources {INCOMING_SOURCES}) is deduplicated AGAINST the
    standing corpus (16-byte hash semi-join; bodies never shuffle)
    and then WITHIN itself (first-doc_id-wins per fingerprint), and
    each source reports incoming / dup-vs-corpus / dup-within /
    accepted counts. At 100 TB the existing-corpus side is a
    fingerprint index you keep materialized, so each increment costs
    one hash join against fingerprints, not a corpus rescan."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    is_inc = F.col("source").isin(*INCOMING_SOURCES)
    inc = d.where(is_inc).select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("h")
    )
    ex = (
        d.where(~is_inc)
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
    )
    exm = ex.withColumn("dup_existing", F.lit(True))
    tagged = inc.join(exm, "h", "left").withColumn(
        "dup_existing", F.coalesce(F.col("dup_existing"), F.lit(False))
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    fresh = (
        tagged.where(~F.col("dup_existing"))
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "rn")
    )
    acc = tagged.join(fresh, "doc_id", "left")
    return acc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(F.when(F.col("dup_existing"), 1).otherwise(0)).alias("n_dup_vs_existing"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dup_within"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_accepted"),
    )




@query(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ev AS (SELECT vec_id, v, list_dot_product(v, v) AS vv FROM e),
    c0 AS (SELECT vec_id AS cid, v AS c, list_dot_product(v, v) AS cc
           FROM e ORDER BY vec_id LIMIT 8),
    a AS (SELECT cid, vec_id, v FROM (
        SELECT c.cid, ev.vec_id, ev.v,
               row_number() OVER (PARTITION BY ev.vec_id
                 ORDER BY (ev.vv - 2 * list_dot_product(ev.v, c.c)) + c.cc,
                          c.cid) AS rn
        FROM ev CROSS JOIN c0 c) t WHERE rn = 1),
    p AS (SELECT x.cid, x.vec_id AS a_id, y.vec_id AS b_id
          FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
          WHERE {D.cosine('x.v', 'y.v')} >= 0.45),
    m AS (SELECT cid, COUNT(*) AS n_members FROM a GROUP BY cid),
    ps AS (SELECT cid, COUNT(*) AS n_pairs,
                  COUNT(DISTINCT b_id) AS n_dropped
           FROM p GROUP BY cid)
    SELECT m.cid, m.n_members,
           COALESCE(ps.n_pairs, 0) AS n_pairs,
           COALESCE(ps.n_dropped, 0) AS n_dropped
    FROM m LEFT JOIN ps ON m.cid = ps.cid
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators.dedup.semantic_dedup_summary): embedding-
    space clustering (assignment against 8 broadcast seed centroids —
    the k-means E-step) restricts the cosine duplicate search to
    WITHIN-cluster pairs, the data-adaptive counterpart of the sign-
    LSH buckets (dedup_embedding_bucketed): O(Σ n_c²) instead of
    O(n²), one exemplar kept per duplicate pair group. Per-cluster
    accounting row: members, duplicate pairs, dropped count."""
    return X.semantic_dedup_summary(
        load_table(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        k=8, threshold=0.45,
    )


def _leakage_sql() -> str:
    from epe_data_wrangling_spark.catalog.mlprep_q import KFOLD

    fa = D.hex_int("md5('fold|' || CAST(a_id AS VARCHAR))", 1, 8)
    fb = D.hex_int("md5('fold|' || CAST(b_id AS VARCHAR))", 1, 8)
    return f"""
    SELECT a_id, b_id, fold_a, fold_b, jaccard
    FROM (SELECT a_id, b_id, jaccard,
                 {fa} % {KFOLD} AS fold_a,
                 {fb} % {KFOLD} AS fold_b
          FROM ({_minhash_sql()}) pairs) q
    WHERE fold_a != fold_b
    """


@query("split_leakage_near_dups", oracle=_leakage_sql)
def split_leakage_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval SPLIT LEAKAGE check — the audit every LLM data
    pipeline needs between dedup and split: near-duplicate document
    pairs (the certified MinHash-LSH path, Jaccard ≥ 0.8) whose
    endpoints hash into DIFFERENT k-folds under the
    ``split_kfold_assignment`` rule. Any row here means a test fold
    contains a near-copy of a training document — metric inflation
    that per-fold dedup cannot see because the duplicates live in
    different folds by construction of hash splitting. Composes two
    certified components (LSH pairs × stateless md5 fold rule), so
    the fold of each endpoint is recomputed from its id alone — no
    assignment join. Scale: exactly the LSH pair cost (one band-key
    shuffle, no all-pairs) plus a pair-sized projection; the fix it
    drives is cluster-level splitting (assign the dedup CLUSTER id,
    ``dedup_minhash_clusters``, to a fold — not the doc id)."""
    from epe_data_wrangling_spark.catalog.mlprep_q import KFOLD
    from epe_data_wrangling_spark.functions.hashing import hash_u32

    pairs = X.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        shingle_n=5, num_hashes=16, bands=8, threshold=0.8,
    )
    return pairs.select(
        "a_id",
        "b_id",
        (hash_u32("a_id", "fold") % KFOLD).alias("fold_a"),
        (hash_u32("b_id", "fold") % KFOLD).alias("fold_b"),
        "jaccard",
    ).filter(F.col("fold_a") != F.col("fold_b"))


def _cluster_split_sql() -> str:
    from epe_data_wrangling_spark.catalog.mlprep_q import KFOLD

    def fold_of(c: str) -> str:
        h = D.hex_int("md5('fold|' || CAST(" + c + " AS VARCHAR))", 1, 8)
        return f"{h} % {KFOLD}"
    return f"""
    WITH pairs AS ({_minhash_sql()}),
    edges AS (SELECT a_id AS u, b_id AS v FROM pairs
              UNION SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    comp AS (
      SELECT node, MIN(r) AS rep FROM (
        WITH RECURSIVE reach(node, r) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.u, rc.r FROM reach rc JOIN edges e ON e.v = rc.node
        )
        SELECT node, r FROM reach) t
      GROUP BY node),
    assign AS (
      SELECT d.doc_id,
             {fold_of('COALESCE(c.rep, d.doc_id)')} AS fold,
             c.rep IS NOT NULL AS clustered
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
    leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_leaking_pairs
      FROM pairs p
      JOIN assign a ON p.a_id = a.doc_id
      JOIN assign b ON p.b_id = b.doc_id
      WHERE a.fold != b.fold)
    SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clustered,
           leak.n_leaking_pairs
    FROM assign CROSS JOIN leak
    GROUP BY fold, leak.n_leaking_pairs
    """


@query("split_by_dedup_cluster", oracle=_cluster_split_sql)
def split_by_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware k-fold split — the FIX for
    ``split_leakage_near_dups``: every document is assigned the fold
    of its near-dup CLUSTER representative (connected-component min
    doc; singletons hash their own id), so near-duplicates land in
    the SAME fold by construction. The per-fold report carries
    ``n_leaking_pairs`` — LSH pairs whose endpoints differ in fold —
    which this assignment drives to ZERO structurally (every pair is
    an edge of some component, and a component has one rep, hence one
    fold); the column certifies the property rather than asserting
    it. Scale: LSH pair cost + the component fixpoint (both certified
    paths) + a stateless fold hash on the rep id; the standing-corpus
    form memoizes (doc → rep) and only re-clusters components touched
    by new arrivals (``dedup_incremental_new_docs``)."""
    from epe_data_wrangling_spark.catalog.mlprep_q import KFOLD
    from epe_data_wrangling_spark.functions.hashing import hash_u32

    d = load_table(spark, sf_dir, "documents")
    pairs = X.minhash_lsh_pairs(
        d, "text", "doc_id",
        shingle_n=5, num_hashes=16, bands=8, threshold=0.8,
    ).localCheckpoint(eager=True)  # barrier: clusters AND leak check reuse
    comp = X.connected_components(pairs, "a_id", "b_id")
    assign = (
        d.select("doc_id")
        .join(comp, d.doc_id == comp.node, "left")
        .select(
            "doc_id",
            (hash_u32(F.coalesce(F.col("rep"), F.col("doc_id")), "fold") % KFOLD).alias(
                "fold"
            ),
            F.col("rep").isNotNull().alias("clustered"),
        )
        .localCheckpoint(eager=True)  # reused by the leak self-join
    )
    a = assign.select(F.col("doc_id").alias("a_id"), F.col("fold").alias("fold_a"))
    b = assign.select(F.col("doc_id").alias("b_id"), F.col("fold").alias("fold_b"))
    leak = (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .filter(F.col("fold_a") != F.col("fold_b"))
        .agg(F.count(F.lit(1)).alias("n_leaking_pairs"))
    )
    return (
        assign.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("clustered"), 1).otherwise(0)).alias("n_clustered"),
        )
        .crossJoin(F.broadcast(leak))
    )
