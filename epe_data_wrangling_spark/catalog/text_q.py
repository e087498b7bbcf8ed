"""Text-analysis suite over the documents table (north-star surface):
token statistics, quality scoring, language ID, fingerprinting.

All per-row Catalyst expressions (no shuffle except final ordering at
the consumer): these scale as pure scans, which is exactly what a
100 TB corpus pass needs. Oracles mirror each expression tree via
catalog.ducksql so doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog import ducksql as D
from epe_data_wrangling_spark.functions import text as T
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

_W = D.words("text")


@query(
    "text_token_stats",
    headline=True,
    oracle=f"""
    SELECT doc_id,
           CAST(len({_W}) AS INTEGER) AS n_words,
           CAST({D.bpe_count("text")} AS INTEGER) AS n_bpe_tokens,
           CASE WHEN len({_W}) > 0
                THEN len(array_to_string({_W}, '')) / len({_W})
                ELSE 0.0 END AS mean_word_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex tokens
    (functions.text.BPE_TOKEN_RE) + mean word length."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.word_count("text").alias("n_words"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        T.mean_word_length("text").alias("mean_word_len"),
    )


def _quality_sql() -> str:
    w = _W
    lw = f"list_transform({w}, t -> lower(t))"
    sw_ratio = (
        f"CASE WHEN len({w}) > 0 THEN {D.stopword_hits(lw, 'en')} / len({w}) ELSE 0.0 END"
    )
    punct = (
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text) "
        "ELSE 0.0 END"
    )
    return f"""
    SELECT doc_id,
           round((least(CAST(len({w}) AS DOUBLE) / 50.0, 1.0)
                  + least(({sw_ratio}) * 4, 1.0)
                  + (1.0 - least(({punct}) * 5, 1.0))) / 3, 6) AS quality
    FROM documents
    """


@query("text_quality_scores", oracle=_quality_sql())
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length / stopword / punctuation
    terms — functions.text.quality_score)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score("text").alias("quality"))


def _lang_id_sql() -> str:
    lw = f"list_transform({_W}, t -> lower(t))"
    scores = {
        lang: f"CASE WHEN len({_W}) > 0 THEN {D.stopword_hits(lw, lang)} / len({_W}) ELSE 0.0 END"
        for lang in sorted(T.LANG_STOPWORDS)
    }
    sel = ", ".join(f"{e} AS s_{lang}" for lang, e in scores.items())
    langs_desc = sorted(T.LANG_STOPWORDS, reverse=True)  # ties → lex-last wins
    chain = " ".join(
        f"WHEN s_{lang} >= greatest({', '.join('s_' + o for o in langs_desc if o != lang)}) "
        f"THEN '{lang}'"
        for lang in langs_desc
    )
    best = f"greatest({', '.join('s_' + lang for lang in langs_desc)})"
    return f"""
    WITH scored AS (SELECT doc_id, lang, {sel} FROM documents)
    SELECT doc_id,
           CASE WHEN {best} > 0 THEN (CASE {chain} END) ELSE 'und' END AS lang_guess,
           (CASE WHEN {best} > 0 THEN (CASE {chain} END) ELSE 'und' END) = lang AS is_match
    FROM scored
    """


@query("text_lang_id", oracle=_lang_id_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (functions.text.lang_id):
    argmax over per-language scores, deterministic tie-break, 'und'
    when no stopword hits."""
    d = load_table(spark, sf_dir, "documents")
    guess = T.lang_id("text")
    return d.select(
        "doc_id",
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("is_match"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_min(list_transform({D.shingles(_W, 8)}, s -> md5(s))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-md5 over 8-gram shingles (a 1-hash
    MinHash / winnowing-lite). Content-defined, robust to reordering
    of surrounding docs; at scale this is the cheap first-pass key
    for near-dup candidate grouping."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_min(F.transform(T.word_shingles("text", 8), F.md5)).alias("fp"),
    )
