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
