"""Similarity-search suite over the embeddings table (north star):
exact brute-force cosine top-k and hyperplane-LSH-bucketed ANN.
Operators in operators.similarity; cosine is bit-identical across
engines so rankings need no rounding fuzz.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "ann_cosine_topk_arrow",
    headline=True,
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {D.cosine('q.v', 'c.v')} AS cos_sim
      FROM e q JOIN e c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored) t
    WHERE rank <= 5
    """,
)
def ann_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized twin of ann_cosine_topk (operators.similarity.
    brute_topk_arrow): numpy matmul per Arrow batch, block-local
    top-k, window merge. Certified at RANK level: numpy's pairwise
    float summation differs from the expression tree's sequential
    order in the last ulp, so raw scores cannot hash-match — but the
    RANKING provably can: the fixture corpus's minimum adjacent
    exact-score gap at the top-6 boundary is ~2e-5 (pytest-pinned
    witness `test_arrow_rank_gap_witness`, floor 1e-9), ten orders of
    magnitude above the ~1e-15 summation-order noise, so no rank can
    flip between the two summation orders. The query therefore
    projects (query_id, neighbor_id, rank) and hash-matches the
    exact-cosine rank oracle; ann_cosine_topk remains the
    score-valued anchor."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.brute_topk_arrow(
        e.filter(F.col("vec_id") < 10), e, vec_col="embedding", id_col="vec_id", k=5
    ).select("query_id", "neighbor_id", "rank")


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cell, v AS cv FROM e ORDER BY vec_id LIMIT 16),
    assigned AS (
      SELECT vid, vv, cell FROM (
        SELECT e.vec_id AS vid, e.v AS vv, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {D.cosine('e.v', 'c.cv')} DESC, c.cell) AS rn
        FROM e CROSS JOIN cents c) t
      WHERE rn = 1),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {D.cosine('q.v', 'c.cv')} DESC, c.cell) AS rn
        FROM e q CROSS JOIN cents c
        WHERE q.vec_id < 20) t
      WHERE rn <= 4)
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT p.query_id, a.vid AS neighbor_id,
             {D.cosine('p.qv', 'a.vv')} AS cos_sim,
             CAST(row_number() OVER (PARTITION BY p.query_id
               ORDER BY {D.cosine('p.qv', 'a.vv')} DESC, a.vid) AS INTEGER) AS rank
      FROM probes p JOIN assigned a USING (cell)
      WHERE p.query_id <> a.vid) t
    WHERE rank <= 3
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (operators.similarity.ivf_topk): 16 deterministic
    coarse centroids, corpus quantized to cells, each of the first 20
    query vectors probes its 4 nearest cells — top-3 within the
    probed ~quarter of the corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        e.filter(F.col("vec_id") < 20), e,
        vec_col="embedding", id_col="vec_id",
        k=3, n_centroids=16, n_probe=4,
    )


@query(
    "embedding_label_centroids",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    ex AS (SELECT label, CAST(u.i - 1 AS INTEGER) AS dim, v[u.i] AS x
           FROM e, LATERAL unnest(generate_series(1, len(v))) u(i))
    SELECT label, dim, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(round(x * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 1000000000.0 AS mean_val
    FROM ex GROUP BY label, dim
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, one row per
    (label, dim) — the class-prototype aggregation of an ML pipeline
    (k-means update step, nearest-class-mean classifiers). Exact and
    order-free across engines: each component is staged as a
    round(x·1e9) BIGINT (both engines round half away from zero), so
    the group sum is integer-exact and the mean is one double
    division chain. Scale: posexplode fans out dims×rows but the
    partial (map-side) aggregate collapses to (label, dim) pairs
    before the shuffle — the exchange carries |labels|·|dims| rows
    regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    staged = F.round(F.col("x") * F.lit(1e9)).cast("bigint")
    return (
        ex.groupBy("label", "dim")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum(staged).alias("_s"))
        .select(
            "label",
            "dim",
            "n_vecs",
            (
                F.col("_s").cast("double") / F.col("n_vecs").cast("double") / F.lit(1e9)
            ).alias("mean_val"),
        )
    )


@query(
    "array_higher_order_stats",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           CAST(len(v) AS INTEGER) AS n_dims,
           sqrt(list_dot_product(v, v)) AS l2,
           CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_positive,
           list_max(v) AS max_val
    FROM e
    """,
)
def array_higher_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface (SURVEY §2.10 extension
    note): transform/filter/aggregate/zip_with over the embedding
    arrays — all JVM-side codegen'd expressions, the zero-UDF path
    for array columns at scale."""
    from epe_data_wrangling_spark.functions.vectors import norm

    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(v).alias("n_dims"),
        norm(v).alias("l2"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.array_max(v).cast("double").alias("max_val"),
    )


RECALL_NQ = 50
RECALL_K = 3
RECALL_IVF_CENTS = 16
RECALL_IVF_PROBE = 8


def _recall_oracle() -> str:
    exact = f"""
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {D.cosine('q.v', 'c.v')} DESC, c.vec_id) AS rn
        FROM e q JOIN e c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {RECALL_NQ}) t
      WHERE rn <= {RECALL_K})"""
    lsh = f"""
    b AS (SELECT vec_id, v, {D.hyperplane_bucket('v')} AS bucket FROM e),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {D.cosine('q.v', 'c.v')} DESC, c.vec_id) AS rn
        FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < {RECALL_NQ}) t
      WHERE rn <= {RECALL_K})"""
    ivf = f"""
    cents AS (SELECT vec_id AS cell, v AS cv FROM e
              ORDER BY vec_id LIMIT {RECALL_IVF_CENTS}),
    assigned AS (
      SELECT vid, vv, cell FROM (
        SELECT e.vec_id AS vid, e.v AS vv, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {D.cosine('e.v', 'c.cv')} DESC, c.cell) AS rn
        FROM e CROSS JOIN cents c) t
      WHERE rn = 1),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {D.cosine('q.v', 'c.cv')} DESC, c.cell) AS rn
        FROM e q CROSS JOIN cents c
        WHERE q.vec_id < {RECALL_NQ}) t
      WHERE rn <= {RECALL_IVF_PROBE}),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.vid AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                 ORDER BY {D.cosine('p.qv', 'a.vv')} DESC, a.vid) AS rn
        FROM probes p JOIN assigned a USING (cell)
        WHERE p.query_id <> a.vid) t
      WHERE rn <= {RECALL_K})"""

    def summary(idx: str) -> str:
        return f"""
      SELECT '{idx}' AS index_name,
             CAST(COUNT(*) AS BIGINT) AS n_queries,
             CAST(SUM(n_hit) AS BIGINT) AS total_hits,
             CAST(SUM(n_hit) AS DOUBLE) / ({RECALL_K} * COUNT(*)) AS mean_recall,
             CAST(COUNT(*) FILTER (WHERE n_hit = {RECALL_K}) AS BIGINT)
               AS n_perfect,
             CAST(COUNT(*) FILTER (WHERE n_hit = 0) AS BIGINT) AS n_zero
      FROM (SELECT ex.query_id, COUNT(ap.neighbor_id) AS n_hit
            FROM exact ex LEFT JOIN {idx} ap
              ON ex.query_id = ap.query_id
             AND ex.neighbor_id = ap.neighbor_id
            GROUP BY ex.query_id) h"""

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {exact},
    {lsh},
    {ivf}
    {summary('lsh')}
    UNION ALL
    {summary('ivf')}
    """


@query("ann_recall_report", oracle=_recall_oracle())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval-evaluation harness AS a hash-checked query:
    recall@{RECALL_K} against the exact cosine top-{RECALL_K} for two
    index designs side by side — sign-LSH (8 frozen planes) and IVF
    ({RECALL_IVF_PROBE}/{RECALL_IVF_CENTS} probed cells). Every
    quantity is an integer intersection count, so the measurement is
    oracle-exact. On this near-uniform corpus it correctly ranks the
    designs: bucket-sparse sign-LSH collapses (the known failure mode
    the report exists to catch) while IVF holds usable recall — the
    post-rebuild certification a retrieval pipeline runs."""
    from epe_data_wrangling_spark.operators import similarity as S

    e = load_table(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < RECALL_NQ)
    exact = S.brute_topk(
        queries_df, e, vec_col="embedding", id_col="vec_id", k=RECALL_K
    ).select("query_id", "neighbor_id").localCheckpoint(eager=True)

    def summary(approx: DataFrame, name: str) -> DataFrame:
        ap = approx.select(
            F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
        )
        hits = (
            exact.join(
                ap,
                (exact.query_id == F.col("aq")) & (exact.neighbor_id == F.col("an")),
                "left",
            )
            .groupBy("query_id")
            .agg(F.count("an").alias("n_hit"))
        )
        return hits.agg(
            F.lit(name).alias("index_name"),
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("n_hit").alias("total_hits"),
            (
                F.sum("n_hit").cast("double") / (F.lit(RECALL_K) * F.count(F.lit(1)))
            ).alias("mean_recall"),
            F.count(F.when(F.col("n_hit") == RECALL_K, 1)).alias("n_perfect"),
            F.count(F.when(F.col("n_hit") == 0, 1)).alias("n_zero"),
        )

    lsh = S.lsh_topk(queries_df, e, vec_col="embedding", id_col="vec_id", k=RECALL_K)
    ivf = S.ivf_topk(
        queries_df, e, vec_col="embedding", id_col="vec_id",
        k=RECALL_K, n_centroids=RECALL_IVF_CENTS, n_probe=RECALL_IVF_PROBE,
    )
    return summary(lsh, "lsh").unionByName(summary(ivf, "ivf"))


MMR_K = 4  #: picks
MMR_LAMBDA = 0.7  #: relevance weight; 1-λ penalizes similarity to picks


def _mmr_oracle() -> str:
    """Unrolled {MMR_K}-step MMR CTE chain mirroring the Spark loop
    pick for pick (same cosine trees, same λ literals)."""
    lam, mu = repr(MMR_LAMBDA), repr(1 - MMR_LAMBDA)
    cos_q = D.cosine("r.v", "s.v")
    parts = [f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    r AS (SELECT vec_id, v, {D.cosine('v', 'qv')} AS rel
          FROM e CROSS JOIN q WHERE vec_id <> 0),
    p1 AS (SELECT vec_id, v, rel, {lam} * rel - {mu} * 0.0 AS score
           FROM r ORDER BY rel DESC, vec_id LIMIT 1),
    sel1 AS (SELECT vec_id, v FROM p1)"""]
    for k in range(2, MMR_K + 1):
        parts.append(f"""
    c{k} AS (SELECT r.vec_id, r.v, r.rel, MAX({cos_q}) AS dv
             FROM r CROSS JOIN sel{k - 1} s
             WHERE r.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
             GROUP BY r.vec_id, r.v, r.rel),
    p{k} AS (SELECT vec_id, v, rel, {lam} * rel - {mu} * dv AS score
             FROM c{k} ORDER BY {lam} * rel - {mu} * dv DESC, vec_id LIMIT 1),
    sel{k} AS (SELECT vec_id, v FROM sel{k - 1}
               UNION ALL SELECT vec_id, v FROM p{k})""")
    finals = " UNION ALL ".join(
        f"SELECT {k} AS pick_rank, vec_id, round(rel, 6) AS relevance, "
        f"round(score, 6) AS mmr_score FROM p{k}"
        for k in range(1, MMR_K + 1)
    )
    return ",".join(parts) + " " + finals


@query("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance selection: pick {MMR_K} vectors that
    are relevant to the query (vec_id 0's embedding, broadcast) but
    mutually diverse — score = λ·cos(q,v) − (1−λ)·max_cos(v, picked),
    λ={MMR_LAMBDA}. The diversity-aware sampler an eval-set or
    few-shot-pool builder needs where plain top-k returns near-
    duplicates. Each of the {MMR_K} greedy steps is one corpus scan:
    relevance re-derived from the shared cosine tree, the diversity
    penalty a broadcast of the ≤{MMR_K}-row picked set and an
    order-free MAX — no pairwise corpus join anywhere, so a step is
    O(corpus·picks) flops with only a TakeOrdered(1) reduction; a
    production run would persist the relevance column once instead of
    rescanning. Ties broken by vec_id; cosines are bit-identical
    sequential folds on both engines, so selection is deterministic
    cross-engine (hash-checked)."""
    from epe_data_wrangling_spark.functions.vectors import cosine

    lam, mu = F.lit(MMR_LAMBDA), F.lit(1 - MMR_LAMBDA)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    r = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "v", cosine(F.col("v"), F.col("qv")).alias("rel"))
    )
    pick = (
        r.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select("vec_id", "v", "rel", (lam * F.col("rel") - mu * F.lit(0.0)).alias("score"))
        .localCheckpoint(eager=True)
    )
    picks = [pick.select(F.lit(1).alias("pick_rank"), "vec_id", "rel", "score")]
    selected = pick.select("vec_id", "v")
    for k in range(2, MMR_K + 1):
        sv = selected.select(F.col("vec_id").alias("sid"), F.col("v").alias("sv"))
        score = lam * F.col("rel") - mu * F.col("dv")
        pick = (
            r.join(selected.select("vec_id"), "vec_id", "left_anti")
            .crossJoin(F.broadcast(sv))
            .groupBy("vec_id", "v", "rel")
            .agg(F.max(cosine(F.col("v"), F.col("sv"))).alias("dv"))
            .orderBy(score.desc(), "vec_id")
            .limit(1)
            .select("vec_id", "v", "rel", score.alias("score"))
            .localCheckpoint(eager=True)
        )
        picks.append(pick.select(F.lit(k).alias("pick_rank"), "vec_id", "rel", "score"))
        selected = selected.unionByName(pick.select("vec_id", "v"))
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        "pick_rank",
        "vec_id",
        F.round("rel", 6).alias("relevance"),
        F.round("score", 6).alias("mmr_score"),
    )


HYB_NQ = 10   #: query documents (doc_id < HYB_NQ; doc_id == vec_id)
HYB_L = 20    #: depth of each per-modality candidate list
HYB_K = 10    #: fused results per query
HYB_RRF = 60  #: the standard RRF dampening constant


def _lex_ctes() -> str:
    """Lexical-leg WITH-body (distinct-token Jaccard via the TERM
    join, top-{HYB_L} per query) — shared by the exact and IVF-served
    hybrid oracles so the leg exists once."""
    return f"""d AS (SELECT doc_id,
                      list_distinct(list_filter(
                        regexp_split_to_array(trim(lower(text)), '\\s+'),
                        x -> x <> '')) AS ts
               FROM documents),
    t AS (SELECT doc_id, unnest(ts) AS term FROM d),
    n AS (SELECT doc_id, len(ts) AS n FROM d),
    inter AS (SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
                     COUNT(*) AS i
              FROM t q JOIN t c USING (term)
              WHERE q.doc_id < {HYB_NQ} AND q.doc_id <> c.doc_id
              GROUP BY q.doc_id, c.doc_id),
    jac AS (SELECT query_id, i.doc_id,
                   CAST(round(CAST(i AS DOUBLE)
                              / (nq.n + nc.n - i) * 1000000000.0)
                        AS BIGINT) AS jacc_r
            FROM inter i
            JOIN n nq ON nq.doc_id = i.query_id
            JOIN n nc ON nc.doc_id = i.doc_id),
    lex AS (SELECT query_id, doc_id, r FROM (
              SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY jacc_r DESC, doc_id) AS r
              FROM jac) x WHERE r <= {HYB_L})"""


def _rrf_tail() -> str:
    """RRF-fusion tail over the ``lex`` and ``vec`` rank lists —
    shared by both hybrid oracles."""
    return f"""fused AS (SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                     COALESCE(l.doc_id, v.doc_id) AS doc_id,
                     COALESCE(1.0 / ({HYB_RRF} + l.r), 0)
                     + COALESCE(1.0 / ({HYB_RRF} + v.r), 0) AS rrf
              FROM lex l
              FULL JOIN vec v
                ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
    SELECT query_id, doc_id, rrf_rank, round(rrf, 6) AS rrf_score
    FROM (SELECT query_id, doc_id, rrf,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY CAST(round(rrf * 1000000000.0) AS BIGINT) DESC,
                            doc_id) AS INTEGER) AS rrf_rank
          FROM fused) x
    WHERE rrf_rank <= {HYB_K}"""


@query(
    "hybrid_rrf_retrieval",
    oracle=f"""
    WITH {_lex_ctes()},
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    vd AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                  {D.cosine('q.v', 'c.v')} AS cos_sim
           FROM e q JOIN e c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < {HYB_NQ}),
    vec AS (SELECT query_id, doc_id, r FROM (
              SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, doc_id) AS r
              FROM vd) x WHERE r <= {HYB_L}),
    {_rrf_tail()}
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the standard RAG serving shape: a LEXICAL
    candidate list (distinct-token Jaccard between the query document
    and every corpus document, computed by a TERM join — shuffles
    carry (term, doc_id) pairs, never all-pairs; at 100 TB hot terms
    get the same suppression treatment as dedup's hot grams) and a
    VECTOR candidate list (exact cosine top-{HYB_L} via the shared
    `operators.similarity.brute_topk`; swap in the IVF serve path for
    the corpus-scale variant) are fused by RECIPROCAL-RANK FUSION
    (Cormack et al.: score = Σ 1/({HYB_RRF}+rank) over the lists a
    document appears in) — rank-space fusion needs no score
    calibration between BM25-like and cosine scales, which is why
    every production hybrid searcher uses it. Top-{HYB_L} per
    modality, fused top-{HYB_K} per query; ties broken by doc_id,
    ranking staged through BIGINT so the order is identical
    cross-engine. documents.doc_id == embeddings.vec_id by the
    testdata contract (both 0..N-1)."""
    e = load_table(spark, sf_dir, "embeddings")
    lex = _lexical_topl(spark, sf_dir)
    vec = S.brute_topk(
        e.filter(F.col("vec_id") < HYB_NQ), e,
        vec_col="embedding", id_col="vec_id", k=HYB_L,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("r_vec"),
    )
    return _rrf_fuse(lex, vec)


def _lexical_topl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid queries' shared LEXICAL candidate list: distinct-
    token Jaccard between each query document (doc_id < {HYB_NQ}) and
    every corpus document via a TERM join — shuffles carry (term,
    doc_id) pairs, never all-pairs — top-{HYB_L} per query. Returns
    (query_id, doc_id, r_lex)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda w: w != "",
                )
            )
        ).alias("term"),
    )
    n = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    q_terms = terms.filter(F.col("doc_id") < HYB_NQ).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    inter = (
        q_terms.join(terms, "term")
        .filter(F.col("query_id") != F.col("doc_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jacc_r = F.round(
        F.col("i").cast("double")
        / (F.col("nq") + F.col("nc") - F.col("i"))
        * F.lit(1e9)
    ).cast("bigint")
    w_l = Window.partitionBy("query_id").orderBy(
        F.col("jacc_r").desc(), F.col("doc_id")
    )
    return (
        inter.join(
            F.broadcast(n.select(F.col("doc_id").alias("query_id"),
                                 F.col("n").alias("nq"))),
            "query_id",
        )
        .join(n.select("doc_id", F.col("n").alias("nc")), "doc_id")
        .withColumn("jacc_r", jacc_r)
        .withColumn("r_lex", F.row_number().over(w_l))
        .filter(F.col("r_lex") <= HYB_L)
        .select("query_id", "doc_id", "r_lex")
    )


def _rrf_fuse(lex: DataFrame, vec: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of the (query_id, doc_id, r_lex) and
    (query_id, doc_id, r_vec) candidate lists — the shared back half
    of both hybrid queries (full-outer rank-space merge, score =
    Σ 1/({HYB_RRF}+rank), BIGINT-staged ordering, top-{HYB_K})."""
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(HYB_RRF) + F.col("r_lex")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(HYB_RRF) + F.col("r_vec")), F.lit(0.0)
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_r").desc(), F.col("doc_id")
    )
    return (
        lex.join(vec, ["query_id", "doc_id"], "full_outer")
        .withColumn("rrf", rrf)
        .withColumn(
            "rrf_r", F.round(F.col("rrf") * F.lit(1e9)).cast("bigint")
        )
        .withColumn("rrf_rank", F.row_number().over(w_f).cast("int"))
        .filter(F.col("rrf_rank") <= HYB_K)
        .select(
            "query_id", "doc_id", "rrf_rank",
            F.round(F.col("rrf"), 6).alias("rrf_score"),
        )
    )

#: the IVF leg's cell count is mlprep_q's trained quantizer (also
#: resolves the {KMEANS_K:d} docstring placeholders below)
from epe_data_wrangling_spark.catalog.mlprep_q import KMEANS_K  # noqa: E402

HYB_IVF_PROBE = 4  #: probed cells of the IVF-served vector leg (of KMEANS_K)


def _hybrid_ivf_oracle() -> str:
    """The IVF-served hybrid oracle: the shared lexical CTEs, the
    shared trained-IVF probe chain (mlprep_q._trained_ivf_ctes — the
    SAME chain ann_ivf_trained_topk certifies), a cosine rank list
    over the probed cells, and the shared RRF tail."""
    from epe_data_wrangling_spark.catalog.mlprep_q import (
        _trained_ivf_ctes,
        _trained_ivf_ranked_sql,
    )

    return f"""
    WITH {_lex_ctes()},
    {_trained_ivf_ctes(HYB_NQ, HYB_IVF_PROBE)},
    vec AS ({_trained_ivf_ranked_sql(HYB_L, id_as="doc_id", rank_as="r")}),
    {_rrf_tail()}
    """


@query("hybrid_rrf_ivf", oracle=_hybrid_ivf_oracle())
def hybrid_rrf_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval served from the TRAINED IVF INDEX — the
    corpus-scale form `hybrid_rrf_retrieval`'s docstring names: the
    same lexical leg (`_lexical_topl`, TERM-join Jaccard), but the
    vector leg probes {HYB_IVF_PROBE}/{KMEANS_K:d} trained cells via
    the shared `mlprep_q.trained_ivf_topk` chain instead of exact
    brute-force — at 100 TB the vector leg reads
    ~{HYB_IVF_PROBE}/{KMEANS_K:d} of the corpus instead of all of it,
    which is the only change a production RAG serving path needs (the
    lexical leg is already candidate-bounded by its term join, and
    the RRF fusion is rank-space, so swapping the list source touches
    nothing downstream). Fused exactly as the exact variant
    (`_rrf_fuse`); fusion recall vs the exact variant is floor-pinned
    in tests/test_recall.py. The oracle composes the SAME three
    shared CTE blocks (lexical, trained-IVF probe chain, RRF tail),
    so neither leg nor the fusion can drift from its certified
    sibling."""
    from epe_data_wrangling_spark.catalog.mlprep_q import trained_ivf_topk

    lex = _lexical_topl(spark, sf_dir)
    vec = trained_ivf_topk(
        spark, sf_dir, nq=HYB_NQ, probe=HYB_IVF_PROBE, k=HYB_L
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("r_vec"),
    )
    return _rrf_fuse(lex, vec)

import math as _math  # noqa: E402


def staged_rank_weights(k: int) -> tuple[list[int], list[int], int]:
    """Position weights for rank metrics, staged to exact BIGINTs
    ONCE in Python and inlined as literals on BOTH engines — log2 is
    libm-dependent in the last ulp, so neither engine computes it at
    query time. Returns (dcg_weights 1e9/log2(rank+1),
    rr_weights 1e9/rank, idcg = sum of dcg weights) for ranks
    1..k. Shared by every quality report (trained chain here, the
    maintained-index twins in streaming_q) so the idiom is
    structural, not copy-maintained."""
    dcg = [round(1e9 / _math.log2(i + 1)) for i in range(1, k + 1)]
    rr = [round(1e9 / i) for i in range(1, k + 1)]
    return dcg, rr, sum(dcg)


RQ_NQ = 20    #: queries evaluated by retrieval_quality_report
RQ_K = 5      #: depth of both the truth and candidate lists
RQ_PROBE = 4  #: probed cells of the evaluated IVF path
RQ_DCG_W, RQ_RR_W, RQ_IDCG = staged_rank_weights(RQ_K)


def _retrieval_quality_oracle() -> str:
    """DuckDB mirror of `retrieval_quality_report`: exact-cosine
    top-{RQ_K} ground truth, the shared trained-IVF probe chain as
    the candidate list, binary relevance, MRR and mean NDCG@{RQ_K}
    aggregated through exact BIGINT sums (one double division each at
    the very end). Registered r16; the pytest
    `test_retrieval_quality_report_matches_duckdb` runs the same
    differential every round."""
    from epe_data_wrangling_spark.catalog.mlprep_q import (
        _trained_ivf_ctes,
        _trained_ivf_ranked_sql,
    )

    dcg_w = ", ".join(str(w) for w in RQ_DCG_W)
    rr_w = ", ".join(str(w) for w in RQ_RR_W)
    return f"""
    WITH {_trained_ivf_ctes(RQ_NQ, RQ_PROBE)},
    approx AS ({_trained_ivf_ranked_sql(RQ_K)}),
    ed AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  {D.cosine('q.v', 'c.v')} AS cos_sim
           FROM e q JOIN e c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < {RQ_NQ}),
    exact AS (SELECT query_id, neighbor_id FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM ed) t WHERE rank <= {RQ_K}),
    scored AS (SELECT a.query_id, a.rank,
                      CASE WHEN x.neighbor_id IS NULL THEN 0 ELSE 1 END AS rel
               FROM approx a LEFT JOIN exact x
                 ON a.query_id = x.query_id
                AND a.neighbor_id = x.neighbor_id),
    per_q AS (SELECT query_id,
                     SUM(rel * list_extract(CAST([{dcg_w}] AS BIGINT[]),
                                            rank)) AS dcg_r,
                     MAX(rel * list_extract(CAST([{rr_w}] AS BIGINT[]),
                                            rank)) AS rr_r
              FROM scored GROUP BY query_id)
    SELECT 'ivf_trained' AS method,
           CAST({RQ_NQ} AS BIGINT) AS n_queries,
           CAST(COUNT(*) AS BIGINT) AS n_answered,
           round(CAST(SUM(rr_r) AS DOUBLE)
                 / ({RQ_NQ} * 1000000000.0), 6) AS mrr,
           round(CAST(SUM(dcg_r) AS DOUBLE)
                 / ({RQ_NQ} * {RQ_IDCG}.0), 6) AS mean_ndcg
    FROM per_q
    """


@query("retrieval_quality_report", oracle=_retrieval_quality_oracle())
def retrieval_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality accounting for the served ANN path — the
    position-aware complement to `ann_recall_report`: MRR and mean
    binary NDCG@{RQ_K} of the trained-IVF serve chain
    (probe {RQ_PROBE}/{KMEANS_K}) against the exact-cosine
    top-{RQ_K} ground truth over the first {RQ_NQ} queries. Both
    metrics aggregate through EXACT integer arithmetic: the position
    weights 1/log2(rank+1) and 1/rank are staged to BIGINT once in
    Python and inlined as the same literals on both engines (log2 is
    libm-dependent in the last ulp), per-query DCG/RR are integer
    sums, and each metric performs exactly one double division at the
    end — so the report is hash-certifiable, not just approximately
    comparable. Scale: the truth leg is the exact top-k (the
    expensive part — run it on an evaluation SAMPLE at 100 TB, which
    is what every production recall dashboard does); the candidate
    leg reads ~{RQ_PROBE}/{KMEANS_K} of the corpus."""
    exact = S.brute_topk(
        load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < RQ_NQ
        ),
        load_table(spark, sf_dir, "embeddings"),
        vec_col="embedding", id_col="vec_id", k=RQ_K,
    ).select("query_id", "neighbor_id")
    from epe_data_wrangling_spark.catalog.mlprep_q import trained_ivf_topk

    approx = trained_ivf_topk(
        spark, sf_dir, nq=RQ_NQ, probe=RQ_PROBE, k=RQ_K
    ).select("query_id", "neighbor_id", "rank")
    dcg_w = F.element_at(
        F.array(*[F.lit(w) for w in RQ_DCG_W]), F.col("rank")
    )
    rr_w = F.element_at(
        F.array(*[F.lit(w) for w in RQ_RR_W]), F.col("rank")
    )
    scored = approx.join(
        exact.withColumn("rel", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    per_q = scored.groupBy("query_id").agg(
        F.sum(F.col("rel") * dcg_w).alias("dcg_r"),
        F.max(F.col("rel") * rr_w).alias("rr_r"),
    )
    # divide by the FULL evaluated query count, not the answered one:
    # a query whose probed cells yield no candidates is a retrieval
    # failure (implicit RR = DCG = 0) and must penalize the mean —
    # n_answered < n_queries is the visible tell
    return per_q.agg(
        F.lit("ivf_trained").alias("method"),
        F.lit(RQ_NQ).cast("bigint").alias("n_queries"),
        F.count(F.lit(1)).alias("n_answered"),
        F.round(
            F.sum("rr_r").cast("double") / (F.lit(RQ_NQ) * F.lit(1e9)),
            6,
        ).alias("mrr"),
        F.round(
            F.sum("dcg_r").cast("double")
            / (F.lit(RQ_NQ) * F.lit(float(RQ_IDCG))),
            6,
        ).alias("mean_ndcg"),
    )
