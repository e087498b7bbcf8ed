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


@query(
    "text_readability_proxy",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len({_W}) AS INTEGER) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS INTEGER) AS n_sentences,
             CAST(len(array_to_string({_W}, '')) AS INTEGER) AS n_letters
      FROM documents)
    SELECT doc_id, n_words, n_sentences,
           round(CAST(n_words AS DOUBLE) / n_sentences, 6)
             AS words_per_sentence,
           round(CAST(n_letters AS DOUBLE) / greatest(n_words, 1), 6)
             AS chars_per_word,
           round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                 + 11.8 * (CAST(n_letters AS DOUBLE) / greatest(n_words, 1))
                 - 15.59, 6) AS grade_proxy
    FROM s
    """,
)
def text_readability_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring (Flesch-Kincaid-shaped, chars-per-word as
    the syllable proxy since syllabification is codec-free): sentence
    and word lengths plus the graded combination — a standard quality
    feature for corpus filtering. Pure per-row expressions, one
    narrow scan, shared double tree on both engines."""
    d = load_table(spark, sf_dir, "documents")
    w = T.words("text")
    n_words = F.size(w)
    n_sent = F.greatest(F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1))
    n_letters = F.length(F.concat_ws("", w))
    wps = n_words.cast("double") / n_sent
    cpw = n_letters.cast("double") / F.greatest(n_words, F.lit(1))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        F.round(wps, 6).alias("words_per_sentence"),
        F.round(cpw, 6).alias("chars_per_word"),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * cpw - F.lit(15.59), 6).alias(
            "grade_proxy"
        ),
    )


ZIPF_TOPK = 20


@query(
    "zipf_term_constants",
    oracle=f"""
    WITH t AS (SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                       '\\s+'), x -> x <> '')) AS term
               FROM documents),
    f AS (SELECT term, COUNT(*) AS freq FROM t GROUP BY term),
    r AS (SELECT term, freq,
                 CAST(row_number() OVER (ORDER BY freq DESC, term)
                      AS INTEGER) AS rank
          FROM f)
    SELECT rank, term, freq, CAST(rank * freq AS BIGINT) AS zipf_constant
    FROM r WHERE rank <= {ZIPF_TOPK}
    """,
)
def zipf_term_constants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf profile of the corpus vocabulary: rank×frequency for the
    top {ZIPF_TOPK} terms (constant under Zipf's law — the corpus-
    health diagnostic that flags boilerplate-dominated crawls where
    the curve flattens). Term counts shuffle as keys+counts; top-{ZIPF_TOPK}
    selection is an orderBy().limit() TakeOrdered (no global window
    over the vocabulary), and ranks are reconstructed on the
    {ZIPF_TOPK}-row result by a broadcast dominance self-join
    (rank = 1 + rows strictly earlier in the total order)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(F.explode(T.words(F.lower(F.col("text")))).alias("term"))
    f = t.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    top = (
        f.orderBy(F.col("freq").desc(), "term")
        .limit(ZIPF_TOPK)
        .localCheckpoint(eager=True)  # k rows; both self-join sides reuse
    )
    r = (
        top.alias("a")
        .join(
            F.broadcast(top.alias("b")),
            F.expr("b.freq > a.freq OR (b.freq = a.freq AND b.term < a.term)"),
            "left",
        )
        .groupBy(F.col("a.term").alias("term"), F.col("a.freq").alias("freq"))
        .agg((F.count(F.col("b.term")) + 1).cast("int").alias("rank"))
    )
    return r.select(
        "rank", "term", "freq",
        (F.col("rank") * F.col("freq")).cast("bigint").alias("zipf_constant"),
    )


CMS_ROWS = 4  #: independent hash rows (d)
CMS_COLS = 1024  #: buckets per row (w); eps ~ e/w
CMS_TOPK = 20  #: heavy hitters reported


def _cms_bucket_sql(seed: int, term: str) -> str:
    from epe_data_wrangling_spark.catalog.ducksql import hex_int

    md5 = "md5('" + str(seed) + "|' || " + term + ")"
    return f"({hex_int(md5, 1, 8)}) % {CMS_COLS}"


def _cms_oracle() -> str:
    buckets = ",\n             ".join(
        f"{_cms_bucket_sql(j, 'term')} AS b{j}" for j in range(CMS_ROWS)
    )
    mins = ", ".join(
        f"(SELECT bucket_total FROM sketch s WHERE s.row_id = {j} "
        f"AND s.bucket = t.b{j})" for j in range(CMS_ROWS)
    )
    unions = " UNION ALL ".join(
        f"SELECT {j} AS row_id, b{j} AS bucket, cnt FROM terms"
        for j in range(CMS_ROWS)
    )
    return f"""
    WITH tok AS (SELECT unnest({{W}}) AS term
                 FROM (SELECT lower(text) AS text FROM documents)),
    terms AS (
      SELECT term, COUNT(*) AS cnt,
             {buckets}
      FROM tok GROUP BY term),
    sketch AS (
      SELECT row_id, bucket, SUM(cnt) AS bucket_total
      FROM ({unions}) GROUP BY row_id, bucket),
    hh AS (SELECT term, cnt,
                  row_number() OVER (ORDER BY cnt DESC, term) AS rn
           FROM terms)
    SELECT t.term, CAST(t.cnt AS BIGINT) AS exact_count,
           CAST(least({mins}) AS BIGINT) AS cms_estimate,
           CAST(least({mins}) - t.cnt AS BIGINT) AS overestimate
    FROM hh h JOIN terms t ON h.term = t.term
    WHERE h.rn <= {CMS_TOPK}
    """.replace("{W}", D.words("text"))


@query("sketch_cms_heavy_hitters", oracle=_cms_oracle())
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus term frequencies, checked against
    exact counts for the top-{CMS_TOPK} heavy hitters. The sketch is
    {CMS_ROWS}x{CMS_COLS} md5-derived counters (CMS is linear, so it
    is built from per-term partial counts — identical to streaming
    token-at-a-time updates); a term's estimate is the min of its
    {CMS_ROWS} bucket totals, always >= exact (the `overestimate`
    column exposes the sketch error directly). Scale: the corpus scan
    reduces to |vocab| rows before any shuffle (map-side combine);
    the sketch itself is a fixed {CMS_ROWS}*{CMS_COLS}-cell table
    regardless of corpus size — THE bounded-memory frequency summary
    for 100 TB streams; the heavy-hitter probe is a broadcast join of
    top-k terms against it."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(T.words(F.lower(F.col("text")))).alias("term")
    )

    def bucket(seed: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}|"), F.col("term"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % CMS_COLS
        )

    terms = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    terms = terms.select(
        "term", "cnt", *[bucket(j).alias(f"b{j}") for j in range(CMS_ROWS)]
    )
    sketch = None
    for j in range(CMS_ROWS):
        part = terms.select(
            F.lit(j).alias("row_id"), F.col(f"b{j}").alias("bucket"), "cnt"
        )
        sketch = part if sketch is None else sketch.unionByName(part)
    sketch = sketch.groupBy("row_id", "bucket").agg(
        F.sum("cnt").alias("bucket_total")
    )
    # top-k via orderBy().limit() (TakeOrderedAndProject) — the rank
    # itself isn't part of the output, so no global window is needed
    hh = terms.orderBy(F.col("cnt").desc(), "term").limit(CMS_TOPK)
    est = hh
    for j in range(CMS_ROWS):
        sj = sketch.filter(F.col("row_id") == j).select(
            F.col("bucket").alias(f"b{j}"), F.col("bucket_total").alias(f"est{j}")
        )
        est = est.join(F.broadcast(sj), f"b{j}")
    estimate = F.least(*[F.col(f"est{j}") for j in range(CMS_ROWS)])
    return est.select(
        "term",
        F.col("cnt").cast("bigint").alias("exact_count"),
        estimate.cast("bigint").alias("cms_estimate"),
        (estimate - F.col("cnt")).cast("bigint").alias("overestimate"),
    )
