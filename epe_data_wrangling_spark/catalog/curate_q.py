"""Corpus curation — the end-to-end composition the north-star
operators exist for: keep documents that are (a) not near-duplicates
of an earlier document, (b) above a quality floor, (c) in the target
language. One declarative plan: MinHash-LSH pairs → connected
components → anti-join, then the per-row language/quality filters —
at 100 TB this is scan + one banded-LSH shuffle + a tiny anti-join
broadcast, no step quadratic in corpus size.

The oracle is the same composition of the already-verified fragment
SQLs (dedup_q.minhash pairs, recursive-CTE components, text_q quality
and language scores), so the whole pipeline is hash-checked
end-to-end, not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog.dedup_q import _minhash_sql
from epe_data_wrangling_spark.catalog.text_q import _lang_id_sql, _quality_sql
from epe_data_wrangling_spark.functions import text as T
from epe_data_wrangling_spark.operators import dedup as X
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

_CURATE_SQL = f"""
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
    drops AS (SELECT node FROM comp WHERE node <> rep),
    q AS ({_quality_sql()}),
    l AS ({_lang_id_sql()})
    SELECT d.doc_id, l.lang_guess, q.quality
    FROM documents d
    JOIN q ON q.doc_id = d.doc_id
    JOIN l ON l.doc_id = d.doc_id
    LEFT JOIN drops ON drops.node = d.doc_id
    WHERE drops.node IS NULL AND q.quality >= 0.5 AND l.lang_guess = 'en'
"""


@query("curate_corpus", oracle=_CURATE_SQL)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus curation in one plan: drop near-duplicate
    non-representatives (MinHash-LSH → connected components →
    anti-join), then keep quality ≥ 0.5 English documents. Returns
    (doc_id, lang_guess, quality) of the surviving corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = X.minhash_lsh_pairs(
        docs, "text", "doc_id", shingle_n=5, num_hashes=16, bands=8, threshold=0.8
    )
    comps = X.connected_components(pairs, "a_id", "b_id")
    drops = comps.filter(F.col("node") != F.col("rep")).select("node")
    kept = docs.join(drops, docs.doc_id == drops.node, "left_anti")
    return (
        kept.select(
            "doc_id",
            T.lang_id("text").alias("lang_guess"),
            T.quality_score("text").alias("quality"),
        )
        .filter((F.col("quality") >= 0.5) & (F.col("lang_guess") == "en"))
    )


_KEEP_BEST_SQL = f"""
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
    q AS ({_quality_sql()}),
    clustered AS (
      SELECT q.doc_id, q.quality,
             COALESCE(comp.rep, q.doc_id) AS cluster
      FROM q LEFT JOIN comp ON comp.node = q.doc_id),
    ranked AS (
      SELECT doc_id, quality, cluster,
             CAST(COUNT(*) OVER (PARTITION BY cluster) AS INTEGER)
               AS cluster_size,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY quality DESC, doc_id) AS rn
      FROM clustered)
    SELECT doc_id, cluster, cluster_size, quality
    FROM ranked WHERE rn = 1
"""


@query("dedup_keep_best", oracle=_KEEP_BEST_SQL)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup with a QUALITY keep-policy: among each near-duplicate
    cluster (MinHash-LSH pairs → connected components), keep the
    highest-quality document instead of the arbitrary lowest-id
    representative — the policy real corpus curation wants ('of these
    nine mirrors, keep the cleanest'). Singletons are their own
    cluster. Scale shape identical to curate_corpus (banded LSH
    shuffle + node-sized component table broadcast); the keep
    decision is one window over cluster-sized groups."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    pairs = X.minhash_lsh_pairs(d, "text", "doc_id")
    comp = X.connected_components(pairs, "a_id", "b_id")
    q = d.select("doc_id", T.quality_score("text").alias("quality"))
    clustered = (
        q.join(comp, q.doc_id == comp.node, "left")
        .select(
            "doc_id",
            "quality",
            F.coalesce(F.col("rep"), F.col("doc_id")).alias("cluster"),
        )
    )
    wc = Window.partitionBy("cluster")
    wr = Window.partitionBy("cluster").orderBy(F.col("quality").desc(), "doc_id")
    return (
        clustered.withColumn("cluster_size", F.count(F.lit(1)).over(wc).cast("int"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster", "cluster_size", "quality")
    )


def _span_scrub_sql() -> str:
    from epe_data_wrangling_spark.catalog.dedup_q import (
        QUERIES as _DQ,
    )

    spans_sql = _DQ["dedup_shared_spans"].oracle
    w = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
    return f"""
    WITH spans AS ({spans_sql}),
    targets AS (SELECT doc_b AS doc_id, b_start AS s, len_words AS l
                FROM spans),
    wsrc AS (SELECT doc_id, {w} AS ws FROM documents),
    wp AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos, ws[u.i] AS word
           FROM wsrc, LATERAL unnest(generate_series(1, len(ws))) u(i)),
    rem AS (SELECT DISTINCT wp.doc_id, wp.pos
            FROM wp JOIN targets t
              ON wp.doc_id = t.doc_id
             AND wp.pos >= t.s AND wp.pos < t.s + t.l),
    nrem AS (SELECT doc_id, COUNT(*) AS cnt FROM rem GROUP BY doc_id),
    kept AS (SELECT wp.doc_id, wp.pos, wp.word
             FROM wp LEFT JOIN rem
               ON wp.doc_id = rem.doc_id AND wp.pos = rem.pos
             WHERE rem.pos IS NULL)
    SELECT k.doc_id, CAST(n.cnt AS INTEGER) AS n_removed,
           md5(array_to_string(list(k.word ORDER BY k.pos), ' '))
             AS scrubbed_md5
    FROM kept k JOIN nrem n ON k.doc_id = n.doc_id
    GROUP BY k.doc_id, n.cnt
    """


@query("scrub_shared_spans", oracle=_span_scrub_sql())
def scrub_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical span removal — the terminal action on
    dedup_shared_spans' findings: for every document that shares a
    run with a lower-id document, delete exactly the overlapping word
    positions (union of all its spans) and emit the scrubbed text's
    md5 plus the removed-word count. Word positions explode narrowly,
    the span table is tiny (broadcast), and the rebuild is one
    ordered collect per affected doc — text itself never shuffles
    except for the affected docs' rebuild."""
    from pyspark.sql import Window as _W

    from epe_data_wrangling_spark.catalog.dedup_q import (
        SPAN_MAX_FREQ,
        SPAN_MIN_RUN,
        SPAN_N,
    )

    d = load_table(spark, sf_dir, "documents")
    spans = X.shared_span_pairs(
        d, "text", "doc_id", n=SPAN_N, min_run=SPAN_MIN_RUN,
        max_gram_freq=SPAN_MAX_FREQ,
    )
    targets = spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("s"),
        F.col("len_words").alias("l"),
    )
    wp = d.select(
        "doc_id", F.posexplode(T.words("text")).alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "word")
    rem = (
        wp.join(F.broadcast(targets), "doc_id")
        .filter((F.col("pos") >= F.col("s")) & (F.col("pos") < F.col("s") + F.col("l")))
        .select("doc_id", "pos")
        .distinct()
    )
    nrem = rem.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("n_removed"))
    kept = wp.join(rem, ["doc_id", "pos"], "left_anti")
    return (
        kept.join(nrem, "doc_id")
        .groupBy("doc_id", "n_removed")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "word"))),
                        lambda st: st["word"],
                    ),
                ).cast("binary")
            ).alias("scrubbed_md5")
        )
        .select("doc_id", "n_removed", "scrubbed_md5")
    )


_DEDUP_RATE_SQL = f"""
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
    flags AS (
      SELECT d.doc_id, d.source,
             comp.node IS NOT NULL AS in_cluster,
             comp.node IS NOT NULL AND comp.node <> comp.rep AS dropped
      FROM documents d LEFT JOIN comp ON comp.node = d.doc_id)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE in_cluster) AS BIGINT)
             AS n_in_clusters,
           CAST(COUNT(*) FILTER (WHERE dropped) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) FILTER (WHERE dropped) AS DOUBLE) / COUNT(*)
             AS dedup_rate
    FROM flags GROUP BY source
"""


@query("dedup_rate_by_source", oracle=_DEDUP_RATE_SQL)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which crawl is dirtiest: per source, how many documents sit in
    a near-duplicate cluster and how many dedup would drop
    (non-representatives) — the accounting view that steers crawl
    budget. Composes MinHash-LSH pairs → components → per-source
    conditional counts; ratios are exact integer divisions in
    double."""
    d = load_table(spark, sf_dir, "documents")
    pairs = X.minhash_lsh_pairs(d, "text", "doc_id")
    comp = X.connected_components(pairs, "a_id", "b_id")
    flags = d.select("doc_id", "source").join(
        comp, d.doc_id == comp.node, "left"
    ).select(
        "source",
        F.col("node").isNotNull().alias("in_cluster"),
        (F.col("node").isNotNull() & (F.col("node") != F.col("rep"))).alias("dropped"),
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("in_cluster"), 1)).alias("n_in_clusters"),
        F.count(F.when(F.col("dropped"), 1)).alias("n_dropped"),
        (
            F.count(F.when(F.col("dropped"), 1)).cast("double") / F.count(F.lit(1))
        ).alias("dedup_rate"),
    )
