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
