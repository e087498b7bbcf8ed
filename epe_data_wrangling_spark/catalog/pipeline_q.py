"""Training-data pipeline suite over the documents table (north-star
surface beyond dedup/ANN/text-metrics): chunking, benchmark-
contamination checks, PII scrubbing, deterministic stratified
sampling, within-document repetition scoring, and corpus accounting.

Scale notes (100 TB posture): every query here is either a narrow
per-row Catalyst expression pass (chunking, PII, repetition — scale
as pure scans) or a broadcast-join/group-by whose shuffled payload is
keys and counts, never raw text (contamination, sampling, stats).
Zero Python on any data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog import ducksql as D
from epe_data_wrangling_spark.functions import pipeline as P
from epe_data_wrangling_spark.functions import text as T
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

_W = D.words("text")

CHUNK_SIZE = 16  #: words per chunk
CHUNK_STRIDE = 12  #: chunk start stride (overlap = SIZE - STRIDE)
CONTAM_N = 5  #: contamination shingle width
SAMPLE_PER_STRATUM = 20


@query(
    "text_chunking",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_W} AS ws FROM documents),
    s AS (SELECT doc_id, ws,
                 unnest(generate_series(1, len(ws), {CHUNK_STRIDE})) AS start
          FROM w)
    SELECT doc_id,
           CAST((start - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(len(ws[start:start + {CHUNK_SIZE - 1}]) AS INTEGER) AS n_chunk_words,
           array_to_string(ws[start:start + {CHUNK_SIZE - 1}], ' ') AS chunk_text
    FROM s
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({CHUNK_SIZE} words, stride
    {CHUNK_STRIDE} → {CHUNK_SIZE - CHUNK_STRIDE}-word overlap) — the
    unit-of-training-example splitter. 1→N via explode of the chunk
    start offsets; a narrow op with no shuffle: 100 TB of documents
    chunk linearly, partition by partition."""
    d = load_table(spark, sf_dir, "documents")
    w = T.words("text")
    return (
        d.select("doc_id", w.alias("ws"), F.explode(P.chunk_starts("text", CHUNK_STRIDE)).alias("start"))
        .select(
            "doc_id",
            F.expr(f"CAST((start - 1) DIV {CHUNK_STRIDE} AS INT)").alias("chunk_idx"),
            F.size(F.slice(F.col("ws"), F.col("start"), CHUNK_SIZE)).alias("n_chunk_words"),
            F.concat_ws(" ", F.slice(F.col("ws"), F.col("start"), CHUNK_SIZE)).alias("chunk_text"),
        )
    )


@query(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH sh AS (SELECT doc_id,
                       unnest(list_distinct({D.shingles(_W, CONTAM_N)})) AS s
                FROM documents),
    b AS (SELECT doc_id AS bid, s FROM sh WHERE doc_id % 97 = 0),
    m AS (SELECT sh.doc_id, count(DISTINCT sh.s) AS n_shared
          FROM sh JOIN b ON sh.s = b.s AND b.bid <> sh.doc_id
          GROUP BY sh.doc_id)
    SELECT d.doc_id,
           d.doc_id % 97 = 0 AS is_benchmark,
           COALESCE(m.n_shared, 0) AS n_shared_shingles,
           COALESCE(m.n_shared, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: flag training docs sharing any
    {CONTAM_N}-gram with the benchmark set (doc_id % 97 == 0 stands in
    for an eval suite), self-matches excluded. The benchmark shingle
    set is small by definition → broadcast hash join against the
    corpus's exploded shingles; the only shuffle is the per-doc count.
    This is the scale shape: corpus never joins corpus."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(T.word_shingles("text", CONTAM_N))).alias("s")
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bid"), "s"
    )
    shared = (
        sh.join(F.broadcast(bench), "s")
        .filter(F.col("bid") != F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_shared"))
    )
    return (
        d.select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("doc_id") % 97 == 0).alias("is_benchmark"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared_shingles"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _pii_scrub_sql() -> str:
    scrubbed = "text"
    for kind, pat in P.PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '<{kind.upper()}>', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS n_{kind}"
        for kind, pat in P.PII_PATTERNS
    )
    return f"""
    SELECT doc_id, {counts}, md5({scrubbed}) AS scrubbed_md5
    FROM documents
    """


@query("text_pii_scrub", oracle=_pii_scrub_sql())
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: per-pattern match counts (email / ipv4 /
    phone — RE2-safe public patterns) plus the md5 of the scrubbed
    text. Pure regexp expressions, narrow scan; the synthetic corpus
    contains no PII (counts 0, scrub = identity), so the redaction
    semantics themselves are pinned by crafted-string unit tests in
    tests/test_pipeline_ops.py."""
    d = load_table(spark, sf_dir, "documents")
    counts = P.pii_counts("text")
    return d.select(
        "doc_id",
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        F.md5(P.pii_scrub("text").cast("binary")).alias("scrubbed_md5"),
    )


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, rn FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR))) AS INTEGER) AS rn
      FROM documents) t
    WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: top-{SAMPLE_PER_STRATUM}
    docs per language by md5(doc_id) order — hash-ordered sampling is
    reproducible across engines and runs (unlike RAND), and the
    per-stratum window sort parallelizes across strata. The 100 TB
    form swaps row_number for a per-stratum threshold on the hash
    value (no sort at all); this windowed form is the exact-k
    variant."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string").cast("binary")))
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= SAMPLE_PER_STRATUM)
    )


@query(
    "doc_repetition_scores",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_W} AS ws FROM documents),
    g AS (SELECT doc_id, ws,
                 CASE WHEN len(ws) >= 3 THEN
                   list_transform(generate_series(1, len(ws) - 2),
                                  i -> array_to_string(ws[i:i+2], ' '))
                 ELSE [] END AS grams
          FROM w)
    SELECT doc_id,
           CAST(len(ws) AS INTEGER) AS n_words,
           CASE WHEN len(ws) > 0 THEN len(list_distinct(ws)) / len(ws)
                ELSE 1.0 END AS distinct_word_ratio,
           CAST(COALESCE(list_max(list_transform(list_distinct(ws),
                    x -> len(list_filter(ws, y -> y = x)))), 0) AS INTEGER)
             AS max_word_freq,
           CASE WHEN len(grams) > 0
                THEN 1.0 - len(list_distinct(grams)) / len(grams)
                ELSE 0.0 END AS dup_trigram_fraction
    FROM g
    """,
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the boilerplate/spam
    signal): distinct-word ratio, max single-word frequency, repeated
    trigram fraction. Per-row array expressions only — O(doc²) in
    words-per-doc but documents are bounded; the corpus dimension is
    a narrow scan."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.word_count("text").alias("n_words"),
        P.distinct_word_ratio("text").alias("distinct_word_ratio"),
        P.max_word_frequency("text").alias("max_word_freq"),
        P.dup_ngram_fraction("text", 3).alias("dup_trigram_fraction"),
    )


@query(
    "corpus_source_stats",
    oracle=f"""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM({D.bpe_count("text")}) AS BIGINT) AS total_bpe_tokens,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           ROUND(CAST(SUM(CAST({D.quality("text")} AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 6) AS mean_quality
    FROM documents GROUP BY source, lang
    """,
)
def corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting per (source, lang): doc counts, total BPE-ish
    token budget, char bounds, mean quality. The per-row quality
    double is 6-dp-rounded, so staging it at decimal(18,6) makes the
    group sum exact and order-free on both engines. One partial-agg
    shuffle carrying only group keys + moments."""
    d = load_table(spark, sf_dir, "documents")
    q = T.quality_score("text").cast("decimal(18,6)")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.bpe_token_count("text").cast("long")).alias("total_bpe_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum(q).alias("_q"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_bpe_tokens",
            "min_chars",
            "max_chars",
            F.round(F.col("_q").cast("double") / F.col("n_docs"), 6).alias("mean_quality"),
        )
    )


DUP_N = 8  #: cross-corpus duplicate n-gram width
PACK_BUDGET = 2048  #: tokens per packed training sequence


@query(
    "corpus_dup_ngram_fraction",
    oracle=f"""
    WITH sh AS (SELECT doc_id,
                       unnest(list_distinct(list_transform(
                         {D.shingles(_W, DUP_N)}, s -> md5(s)))) AS g
                FROM documents),
    gdf AS (SELECT g, COUNT(*) AS gdf FROM sh GROUP BY g),
    per AS (SELECT sh.doc_id,
                   COUNT(*) AS n_grams,
                   COUNT(*) FILTER (WHERE gdf.gdf >= 2) AS n_shared
            FROM sh JOIN gdf USING (g) GROUP BY sh.doc_id)
    SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams,
           CAST(n_shared AS INTEGER) AS n_shared,
           CASE WHEN n_grams > 0
                THEN CAST(n_shared AS DOUBLE) / n_grams ELSE 0.0 END
             AS dup_fraction
    FROM per
    """,
)
def corpus_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicated-{DUP_N}-gram fraction per document —
    the RefinedWeb/Gopher-style inter-document repetition signal
    (what fraction of this doc's shingles exist anywhere else in the
    corpus). Shingles travel as md5 keys, so the gram-frequency
    shuffle carries 32-byte hashes and counts, never text; the
    per-doc rollup is a second key-only shuffle. Both are
    partial-aggregated — the corpus text is scanned exactly once."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    T.word_shingles("text", DUP_N),
                    lambda s: F.md5(s.cast("binary")),
                )
            )
        ).alias("g"),
    )
    gdf = sh.groupBy("g").agg(F.count(F.lit(1)).alias("gdf"))
    per = (
        sh.join(gdf, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("gdf") >= 2, 1)).alias("n_shared"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_grams").cast("int").alias("n_grams"),
        F.col("n_shared").cast("int").alias("n_shared"),
        F.when(
            F.col("n_grams") > 0,
            F.col("n_shared").cast("double") / F.col("n_grams"),
        )
        .otherwise(0.0)
        .alias("dup_fraction"),
    )


def _curation_sql() -> str:
    from epe_data_wrangling_spark.catalog.text_q import _lang_id_sql

    grams = (
        "CASE WHEN len(ws) >= 3 THEN list_transform(generate_series(1, len(ws) - 2), "
        "i -> array_to_string(ws[i:i+2], ' ')) ELSE [] END"
    )
    return f"""
    WITH w AS (SELECT doc_id, {_W} AS ws, {D.quality("text")} AS quality
               FROM documents),
    g AS (SELECT doc_id, ws, quality, {grams} AS grams FROM w),
    m AS (SELECT doc_id, quality,
                 CAST(len(ws) AS INTEGER) AS n_words,
                 CASE WHEN len(grams) > 0
                      THEN 1.0 - len(list_distinct(grams)) / len(grams)
                      ELSE 0.0 END AS dup3
          FROM g),
    l AS ({_lang_id_sql()})
    SELECT m.doc_id, m.quality, l.lang_guess, m.n_words, m.dup3,
           (m.quality >= 0.5 AND l.lang_guess = 'en'
            AND m.n_words BETWEEN 10 AND 5000 AND m.dup3 <= 0.2) AS keep,
           (CASE WHEN NOT m.quality >= 0.5 THEN 'low_quality;' ELSE '' END
            || CASE WHEN NOT l.lang_guess = 'en' THEN 'wrong_lang;' ELSE '' END
            || CASE WHEN NOT m.n_words BETWEEN 10 AND 5000 THEN 'bad_length;' ELSE '' END
            || CASE WHEN NOT m.dup3 <= 0.2 THEN 'repetitive;' ELSE '' END)
             AS reasons
    FROM m JOIN l USING (doc_id)
    """


@query("curation_decisions", oracle=_curation_sql())
def curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explainable corpus-filter pass: every document gets a keep/drop
    decision plus a machine-readable reasons string naming each failed
    rule (quality floor, language, length band, within-doc
    repetition) — the auditable form of a filtering pipeline, where
    dropped data can be accounted for by cause. Pure per-row Catalyst
    expressions over one narrow scan."""
    d = load_table(spark, sf_dir, "documents")
    quality = T.quality_score("text")
    lang = T.lang_id("text")
    n_words = T.word_count("text")
    dup3 = P.dup_ngram_fraction("text", 3)
    m = d.select(
        "doc_id",
        quality.alias("quality"),
        lang.alias("lang_guess"),
        n_words.alias("n_words"),
        dup3.alias("dup3"),
    )
    r_q = F.col("quality") >= 0.5
    r_l = F.col("lang_guess") == "en"
    r_n = F.col("n_words").between(10, 5000)
    r_d = F.col("dup3") <= 0.2
    return m.select(
        "doc_id",
        "quality",
        "lang_guess",
        "n_words",
        "dup3",
        (r_q & r_l & r_n & r_d).alias("keep"),
        F.concat(
            F.when(~r_q, F.lit("low_quality;")).otherwise(""),
            F.when(~r_l, F.lit("wrong_lang;")).otherwise(""),
            F.when(~r_n, F.lit("bad_length;")).otherwise(""),
            F.when(~r_d, F.lit("repetitive;")).otherwise(""),
        ).alias("reasons"),
    )


@query(
    "pack_sequences_greedy",
    oracle=f"""
    WITH t AS (SELECT lang, doc_id,
                      CAST({D.bpe_count("text")} AS INTEGER) AS n_tokens
               FROM documents),
    c AS (SELECT lang, doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
          FROM t)
    SELECT lang, doc_id, n_tokens,
           CAST(floor(cum_before / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           cum_before % {PACK_BUDGET} AS offset_in_pack
    FROM c
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential training-sequence packing: within each language
    stream (ordered by doc_id for determinism), documents fill
    {PACK_BUDGET}-token packs by running offset — the streaming
    packer used to batch variable-length documents into fixed context
    windows (a doc starting at offset o lands in pack ⌊o/budget⌋;
    the consumer splits stragglers at pack boundaries). One window
    cumsum per language partition: parallel across langs, no global
    sort, no shuffle beyond the lang partitioning."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang", "doc_id", T.bpe_token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    return c.select(
        "lang",
        "doc_id",
        "n_tokens",
        F.floor(F.col("cum_before") / float(PACK_BUDGET)).cast("bigint").alias("pack_id"),
        (F.col("cum_before") % PACK_BUDGET).alias("offset_in_pack"),
    )


PPS_TARGET = 50  #: expected sample size


@query(
    "sample_weighted_systematic",
    oracle=f"""
    WITH w AS (SELECT doc_id, n_chars AS wt FROM documents),
    t AS (SELECT CAST(SUM(wt) // {PPS_TARGET} AS BIGINT) AS step FROM w),
    c AS (SELECT doc_id, wt,
                 SUM(wt) OVER (ORDER BY doc_id) AS cum
          FROM w)
    SELECT c.doc_id, CAST(c.wt AS BIGINT) AS weight,
           CAST(c.cum AS BIGINT) AS cum_weight
    FROM c CROSS JOIN t
    WHERE c.cum // t.step > (c.cum - c.wt) // t.step  -- integer floor division
    """,
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling:
    walk the cumulative weight line (weight = n_chars) in doc_id
    order and keep every document whose interval crosses a step
    boundary (step = total/{PPS_TARGET}) — selection probability
    ∝ document size, sample size ≈ {PPS_TARGET}, all integer-exact
    (no pow/rand, so reproducible across engines and cluster
    layouts). The cumulative line is computed WITHOUT a global
    unpartitioned window (single-task at scale): range shards from
    approx-percentile cut points of doc_id, per-shard cumsum, plus
    broadcast per-shard prefix offsets (operators.windows.
    sharded_cumsum) — exact because doc_id is unique."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.col("n_chars").alias("wt"))
    # step must be the exact integer quotient on BOTH engines: casting
    # a double quotient truncates in Spark but rounds in DuckDB
    t = w.agg(F.sum("wt").alias("tot")).select(
        F.expr(f"tot DIV {PPS_TARGET}").alias("step")
    )
    from epe_data_wrangling_spark.operators.windows import sharded_cumsum

    c = sharded_cumsum(w, "doc_id", "wt", out="cum")
    return (
        c.crossJoin(F.broadcast(t))
        # integer division, NOT floor(double /): at exact multiples the
        # double quotient can land one ulp under k and floor to k-1
        # (caught at sf0.1: one boundary doc shifted) — DIV matches
        # DuckDB's // exactly
        .filter(
            F.expr("cum DIV step") > F.expr("(cum - wt) DIV step")
        )
        .select(
            "doc_id",
            F.col("wt").cast("bigint").alias("weight"),
            F.col("cum").cast("bigint").alias("cum_weight"),
        )
    )


#: mixture_rebalance: u01 hash threshold — first 8 md5 hex digits / 2^32.
_U01 = f"({D.hex_int('md5(CAST(doc_id AS VARCHAR))', 1, 8)} / 4294967296.0)"


@query(
    "mixture_rebalance",
    oracle=f"""
    WITH stats AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before
                   FROM documents GROUP BY source),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS k FROM documents),
    rates AS (SELECT source, n_before,
                     least(1.0, CAST(total AS DOUBLE) / k / n_before) AS rate
              FROM stats CROSS JOIN tot),
    sel AS (SELECT d.source FROM documents d JOIN rates r USING (source)
            WHERE {_U01} < r.rate),
    after AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_after
              FROM sel GROUP BY source),
    ta AS (SELECT CAST(SUM(n_after) AS BIGINT) AS total_after FROM after)
    SELECT r.source, r.n_before, round(r.rate, 8) AS rate,
           COALESCE(a.n_after, 0) AS n_after,
           round(COALESCE(a.n_after, 0) / CAST(ta.total_after AS DOUBLE), 8)
             AS achieved_share
    FROM rates r LEFT JOIN after a USING (source) CROSS JOIN ta
    """,
)
def mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing — the data-mixing pass a training
    pipeline runs before tokenization: compute per-source sampling
    rates that move the corpus toward a UNIFORM source mixture
    (rate = min(1, target/|source|)), select documents by a
    deterministic md5-threshold coin flip (reproducible across
    engines, runs, and cluster sizes — no RAND), and report the
    achieved mixture. Over-represented sources downsample; sources at
    or under target keep everything (rate 1). Shuffles carry
    (source, count) pairs only; the rate table is source-sized and
    broadcast back onto the scan."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    stats = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_before"))
    tot = d.agg(
        F.count(F.lit(1)).alias("total"), F.countDistinct("source").alias("k")
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_before",
        F.least(
            F.lit(1.0), F.col("total").cast("double") / F.col("k") / F.col("n_before")
        ).alias("rate"),
    )
    u01 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    sel = d.join(F.broadcast(rates), "source").where(u01 < F.col("rate"))
    after = sel.groupBy("source").agg(F.count(F.lit(1)).alias("n_after"))
    ta = after.agg(F.sum("n_after").alias("total_after"))
    return (
        rates.join(after, "source", "left")
        .crossJoin(F.broadcast(ta))
        .select(
            "source",
            "n_before",
            F.round("rate", 8).alias("rate"),
            F.coalesce(F.col("n_after"), F.lit(0)).alias("n_after"),
            F.round(
                F.coalesce(F.col("n_after"), F.lit(0))
                / F.col("total_after").cast("double"),
                8,
            ).alias("achieved_share"),
        )
    )


LM_ADD_K = 0.5  #: add-k smoothing mass per bigram type


@query(
    "lm_bigram_perplexity",
    oracle=f"""
    WITH d AS (SELECT doc_id, {D.words("lower(text)")} AS ws FROM documents),
    pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM d WHERE len(ws) >= 2),
    bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM pos),
    model AS (SELECT w1, w2, COUNT(*) AS c_bg FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c_bg) AS c_ctx FROM model GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT w) AS v
              FROM (SELECT unnest(ws) AS w FROM d)),
    scored AS (
      SELECT m.w1, m.w2,
             CAST(round(-ln((m.c_bg + {LM_ADD_K}) /
                            (c.c_ctx + {LM_ADD_K} * v.v)) * 1000000000.0)
                  AS BIGINT) AS nll_r
      FROM model m JOIN ctx c ON m.w1 = c.w1 CROSS JOIN vocab v),
    per_doc AS (
      SELECT b.doc_id, COUNT(*) AS n_bigrams, SUM(s.nll_r) AS nll_sum
      FROM bg b JOIN scored s ON b.w1 = s.w1 AND b.w2 = s.w2
      GROUP BY b.doc_id)
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(CAST(nll_sum AS DOUBLE) / 1000000000.0
                 / CAST(n_bigrams AS DOUBLE), 6) AS cross_entropy,
           round(exp(round(CAST(nll_sum AS DOUBLE) / 1000000000.0
                           / CAST(n_bigrams AS DOUBLE), 6)), 6) AS perplexity
    FROM per_doc
    """,
)
def lm_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring (the CCNet/KenLM-style filter):
    train an add-k-smoothed bigram model ON the corpus itself, then
    score every document's cross-entropy and perplexity under it —
    low-perplexity docs are fluent/common text, high-perplexity ones
    are junk or outliers. P(w2|w1) = (c(w1,w2)+{LM_ADD_K}) /
    (c(w1·)+{LM_ADD_K}·V). Parity: each bigram type's -ln P is
    rounded to 9 dp and staged as BIGINT so the per-doc sums are
    integer-exact and order-free; exp() runs on the 6-dp-rounded
    cross-entropy so a 1-ulp libm difference cannot survive into the
    hash. Scale (100 TB): the model is |distinct bigrams| rows —
    orders of magnitude below token count; doc-bigrams join the model
    on the bigram key with map-side-combinable counts on both inputs,
    and token text never shuffles beyond the distinct-type tables
    (the corpus scan emits (w1,w2) pairs already grouped per doc)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.words(F.lower(F.col("text"))).alias("ws")
    )
    ws = F.col("ws")
    bg = (
        d.filter(F.size(ws) >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size(ws) - 1)).alias("i"),
            ws,
        )
        .select(
            "doc_id",
            F.element_at(ws, F.col("i")).alias("w1"),
            F.element_at(ws, F.col("i") + 1).alias("w2"),
        )
    )
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = model.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = d.select(F.explode(ws).alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        model.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    (F.col("c_bg") + F.lit(LM_ADD_K))
                    / (F.col("c_ctx") + F.lit(LM_ADD_K) * F.col("v"))
                )
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("nll_r"),
        )
    )
    per_doc = (
        bg.join(scored, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll_r").alias("nll_sum"),
        )
    )
    ce = F.round(
        F.col("nll_sum").cast("double") / F.lit(1e9) / F.col("n_bigrams").cast("double"),
        6,
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        ce.alias("cross_entropy"),
        F.round(F.exp(ce), 6).alias("perplexity"),
    )


BPE_MERGES = 3  #: learned merge steps


def _bpe_chain() -> str:
    """The unrolled {BPE_MERGES}-iteration BPE merge-learning CTE
    chain (WITH ... w{{N}}) shared by the training and the encoding
    oracles — the same pair-count → argmax → gaps-and-islands
    greedy-merge relational plan the Spark side builds, iteration for
    iteration."""
    parts = [f"""
    WITH tok AS (SELECT unnest({_W}) AS word
                 FROM (SELECT lower(text) AS text FROM documents)),
    w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
                  list_transform(range(1, length(word) + 1),
                                 i -> substr(word, i, 1)) AS syms
           FROM tok GROUP BY word)"""]
    for i in range(1, BPE_MERGES + 1):
        parts.append(f"""
    p{i} AS (SELECT syms[k] AS l, syms[k + 1] AS r, SUM(freq) AS cnt
             FROM w{i - 1}, LATERAL unnest(generate_series(1, len(syms) - 1)) u(k)
             GROUP BY syms[k], syms[k + 1]),
    t{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
    s{i} AS (SELECT word, freq, k, syms[k] AS s,
                    COALESCE(syms[k] = t.l AND syms[k + 1] = t.r, FALSE) AS is_occ,
                    t.l, t.r
             FROM w{i - 1} CROSS JOIN t{i} t,
                  LATERAL unnest(generate_series(1, len(syms))) u(k)),
    o{i} AS (SELECT word, k,
                    k - row_number() OVER (PARTITION BY word ORDER BY k) AS island
             FROM s{i} WHERE is_occ),
    k{i} AS (SELECT word, k FROM (
               SELECT word, k,
                      row_number() OVER (PARTITION BY word, island ORDER BY k) AS rk
               FROM o{i}) z WHERE rk % 2 = 1),
    m{i} AS (SELECT s.word, s.freq, s.k, s.s, s.l, s.r,
                    (kk.k IS NOT NULL) AS m,
                    lag(kk.k IS NOT NULL)
                      OVER (PARTITION BY s.word ORDER BY s.k) AS pm
             FROM s{i} s LEFT JOIN k{i} kk
               ON s.word = kk.word AND s.k = kk.k),
    w{i} AS (SELECT word, freq,
                    list(CASE WHEN m THEN l || r ELSE s END ORDER BY k) AS syms
             FROM m{i} WHERE pm IS NULL OR NOT pm
             GROUP BY word, freq)""")
    return ",".join(parts)


def _bpe_oracle() -> str:
    finals = " UNION ALL ".join(
        f"SELECT {i} AS step, l AS merge_left, r AS merge_right, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM t{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    return _bpe_chain() + " " + finals


def _bpe_fit(spark: SparkSession, sf_dir: str):
    """The shared {BPE_MERGES}-step BPE merge-learning loop: returns
    ``(merges, words)`` — the per-step argmax rows and the FINAL
    per-word symbol segmentation. `bpe_train_merges` emits the former
    (the trained merge table); `bpe_encode_corpus` applies the latter
    (tokenizer application). One implementation so the two cannot
    drift."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(T.words(F.lower(F.col("text")))).alias("word"))
    words = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        )
        .localCheckpoint(eager=True)  # vocabulary-sized; start of each step
    )
    merges = []
    for step in range(1, BPE_MERGES + 1):
        top = (
            words.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(syms, 1, size(syms) - 1)").alias("l"),
                        F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .localCheckpoint(eager=True)  # 1 row, reused by merge + output
        )
        if top.isEmpty():  # vocabulary fully merged: no pair left to learn
            break
        merges.append(
            top.select(
                F.lit(step).alias("step"),
                F.col("l").alias("merge_left"),
                F.col("r").alias("merge_right"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        sp = (
            words.select("word", "freq", "syms", F.posexplode("syms").alias("k0", "s"))
            .withColumn("k", F.col("k0") + 1)  # 1-based like the oracle
            .crossJoin(F.broadcast(top))
            .withColumn(
                "is_occ",
                F.coalesce(
                    (F.col("s") == F.col("l"))
                    & (F.try_element_at("syms", F.col("k") + 1) == F.col("r")),
                    F.lit(False),
                ),
            )
        )
        wk = Window.partitionBy("word").orderBy("k")
        occ = sp.filter("is_occ").select(
            F.col("word").alias("ow"),
            F.col("k").alias("ok"),
            (F.col("k") - F.row_number().over(Window.partitionBy("word").orderBy("k"))).alias(
                "island"
            ),
        )
        kept = (
            occ.withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("ow", "island").orderBy("ok")),
            )
            .filter(F.col("rk") % 2 == 1)
            .select("ow", "ok")
        )
        merged = (
            sp.join(
                kept,
                (F.col("word") == F.col("ow")) & (F.col("k") == F.col("ok")),
                "left",
            )
            .withColumn("m", F.col("ok").isNotNull())
            .withColumn("pm", F.lag("m").over(wk))
        )
        words = (
            merged.filter(F.col("pm").isNull() | ~F.col("pm"))
            .withColumn(
                "ns",
                F.when(F.col("m"), F.concat(F.col("l"), F.col("r"))).otherwise(
                    F.col("s")
                ),
            )
            .groupBy("word", "freq")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(k, ns))), x -> x.ns)"
                ).alias("syms")
            )
            .localCheckpoint(eager=True)
        )
    return merges, words


@query("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING — {BPE_MERGES} merge-learning steps over
    the corpus, the missing half of tokenization (bpe_token_count
    applies a tokenizer; this learns one). Each step: (1) count
    adjacent symbol pairs weighted by word frequency (vocabulary-sized
    shuffle of pair keys + counts — the corpus is scanned ONCE total,
    at the initial word-frequency aggregate), (2) broadcast the argmax
    pair (count desc, then lexicographic — deterministic), (3) apply
    the merge greedily left-to-right per word. Greedy non-overlap over
    runs (e.g. 'aaaa' with pair (a,a) → 'aa','aa') is expressed
    RELATIONALLY as gaps-and-islands — occurrence positions that chain
    by +1 form an island; keep the 1st, 3rd, … of each island — so the
    identical plan runs on both engines with no UDF and no
    order-dependent fold. Output: (step, merge_left, merge_right,
    pair_count) — the learned merge table. 100 TB posture: after the
    first aggregate everything operates on the vocabulary (words ×
    symbols), per-word windows only; the merge table itself is what a
    real tokenizer trainer (GPT-2 BPE, SentencePiece-BPE) emits."""
    merges, _words = _bpe_fit(spark, sf_dir)
    if not merges:  # single-symbol vocabulary: nothing to learn
        return spark.createDataFrame(
            [], "step INT, merge_left STRING, merge_right STRING, pair_count BIGINT"
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_encode_oracle() -> str:
    """The training chain through w{BPE_MERGES}, then every word
    occurrence joins its final segmentation and per-doc token stats
    aggregate — the application half, locked to the same trained
    state as the training oracle by construction."""
    return f"""
    {_bpe_chain()}
    , tokd AS (SELECT doc_id, unnest({_W}) AS word
               FROM (SELECT doc_id, lower(text) AS text FROM documents)),
    enc AS (SELECT t.doc_id, len(w.syms) AS ntok, length(t.word) AS nch
            FROM tokd t JOIN w{BPE_MERGES} w USING (word))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(nch) AS BIGINT) AS n_chars,
           CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens,
           round(CAST(SUM(nch) AS DOUBLE) / SUM(ntok), 6) AS chars_per_token
    FROM enc GROUP BY doc_id
    """


@query("bpe_encode_corpus", oracle=_bpe_encode_oracle())
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION at corpus scale — the natural pair of
    `bpe_train_merges` (same {BPE_MERGES}-merge training loop via the
    shared `_bpe_fit`, so the applied tokenizer IS the trained one):
    every word occurrence joins its final symbol segmentation from the
    trained vocabulary and each document aggregates its token stats —
    (n_words, n_chars, n_bpe_tokens, chars_per_token), the
    tokens-per-doc accounting every LLM data pipeline runs before
    budgeting a training mix. Scale: the corpus is scanned once to
    explode words; the join side is the VOCABULARY (words × final
    syms — broadcastable at any corpus size, since vocabulary grows
    sublinearly); the aggregate is per-doc with map-side combine. No
    UDF anywhere — segmentation lengths ride the trained relation."""
    _merges, words = _bpe_fit(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    tokd = d.select(
        "doc_id", F.explode(T.words(F.lower(F.col("text")))).alias("word")
    )
    seg = words.select("word", F.size("syms").alias("ntok"))
    return (
        tokd.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("ntok").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


TEMP_ALPHA_SQRT = True  #: α = 0.5, expressed as sqrt() (bit-exact cross-engine)
TEMP_BUDGET = 0.5  #: target corpus fraction after sampling

#: temperature coin: distinct md5 stream from mixture_rebalance's.
_T_MD5 = "md5('t|' || CAST(doc_id AS VARCHAR))"
_TU01 = f"({D.hex_int(_T_MD5, 1, 8)} / 4294967296.0)"


@query(
    "mixture_temperature_sampling",
    oracle=f"""
    WITH stats AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before
                   FROM documents GROUP BY lang),
    w AS (SELECT lang, n_before,
                 CAST(round(sqrt(CAST(n_before AS DOUBLE)), 9)
                      AS DECIMAL(28,9)) AS wgt
          FROM stats),
    tot AS (SELECT CAST(SUM(wgt) AS DOUBLE) AS sum_w,
                   CAST(SUM(n_before) AS BIGINT) AS total FROM w),
    rates AS (SELECT lang, n_before,
                     CAST(wgt AS DOUBLE) / tot.sum_w AS p,
                     least(1.0, (tot.total * {TEMP_BUDGET})
                                * (CAST(wgt AS DOUBLE) / tot.sum_w)
                                / n_before) AS rate
              FROM w CROSS JOIN tot),
    sel AS (SELECT d.lang FROM documents d JOIN rates r USING (lang)
            WHERE {_TU01} < r.rate),
    after AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_after
              FROM sel GROUP BY lang),
    ta AS (SELECT CAST(SUM(n_after) AS BIGINT) AS total_after FROM after)
    SELECT r.lang, r.n_before, round(r.p, 8) AS target_share,
           round(r.rate, 8) AS rate,
           COALESCE(a.n_after, 0) AS n_after,
           round(COALESCE(a.n_after, 0) / CAST(ta.total_after AS DOUBLE), 8)
             AS achieved_share
    FROM rates r LEFT JOIN after a USING (lang) CROSS JOIN ta
    """,
)
def mixture_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing (the mT5/XLM-R recipe):
    sampling weights ∝ n^α with α=0.5 — boosts low-resource languages
    without the uniform target's aggressive downsampling of the head.
    α is expressed as sqrt() (correctly-rounded IEEE on both engines,
    unlike a general pow); the weight sum is 9-dp-decimal staged so
    the normalizer is exact and order-free; selection is the
    deterministic md5-threshold coin (its own 't|' stream, so
    composing this with mixture_rebalance never correlates picks).
    Budget = {TEMP_BUDGET} of the corpus. Shuffles carry (lang,
    count) pairs only; the rate table is language-sized, broadcast
    back onto a narrow scan — at 100 TB this is one aggregate plus
    one filter pass."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    stats = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    w = stats.select(
        "lang",
        "n_before",
        F.round(F.sqrt(F.col("n_before").cast("double")), 9)
        .cast("decimal(28,9)")
        .alias("wgt"),
    )
    tot = w.agg(
        F.sum("wgt").cast("double").alias("sum_w"),
        F.sum("n_before").cast("bigint").alias("total"),
    )
    p = F.col("wgt").cast("double") / F.col("sum_w")
    rates = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_before",
        p.alias("p"),
        F.least(
            F.lit(1.0),
            (F.col("total") * F.lit(TEMP_BUDGET)) * p / F.col("n_before"),
        ).alias("rate"),
    )
    u01 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("t|"), F.col("doc_id").cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    sel = d.join(F.broadcast(rates.select("lang", "rate")), "lang").where(u01 < F.col("rate"))
    after = sel.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after"))
    ta = after.agg(F.sum("n_after").cast("bigint").alias("total_after"))
    return (
        rates.join(after, "lang", "left")
        .crossJoin(F.broadcast(ta))
        .select(
            "lang",
            "n_before",
            F.round("p", 8).alias("target_share"),
            F.round("rate", 8).alias("rate"),
            F.coalesce("n_after", F.lit(0)).cast("bigint").alias("n_after"),
            F.round(
                F.coalesce("n_after", F.lit(0)) / F.col("total_after").cast("double"), 8
            ).alias("achieved_share"),
        )
    )


DSIR_BUCKETS = 64  #: hashed feature space size
DSIR_TOPK = 15
DSIR_TARGET_MOD = 7  #: doc_id % 7 == 0 stands in for the target-domain sample


def _dsir_oracle() -> str:
    from epe_data_wrangling_spark.functions.hashing import MINHASH_P

    b = f"({D.hex_int('md5(word)', 1, 8)} % {MINHASH_P}) % {DSIR_BUCKETS}"
    return f"""
    WITH w AS (SELECT doc_id, unnest({D.words('lower(text)')}) AS word
               FROM documents),
    wb AS (SELECT doc_id, {b} AS b FROM w),
    db AS (SELECT doc_id, b, COUNT(*) AS c FROM wb GROUP BY doc_id, b),
    srcb AS (SELECT b, COUNT(*) AS cs FROM wb GROUP BY b),
    tgtb AS (SELECT b, COUNT(*) AS ct FROM wb
             WHERE doc_id % {DSIR_TARGET_MOD} = 0 GROUP BY b),
    tot AS (SELECT COUNT(*) AS s_tot,
                   COUNT(CASE WHEN doc_id % {DSIR_TARGET_MOD} = 0 THEN 1 END) AS t_tot
            FROM wb),
    spine AS (SELECT unnest(generate_series(0, {DSIR_BUCKETS - 1})) AS b),
    lr AS (SELECT spine.b,
                  CAST(round((ln((COALESCE(tgtb.ct, 0) + 1)
                                 / CAST(tot.t_tot + {DSIR_BUCKETS} AS DOUBLE))
                            - ln((COALESCE(srcb.cs, 0) + 1)
                                 / CAST(tot.s_tot + {DSIR_BUCKETS} AS DOUBLE)))
                             * 1000000000.0) AS BIGINT) AS lr9
           FROM spine
           LEFT JOIN srcb ON spine.b = srcb.b
           LEFT JOIN tgtb ON spine.b = tgtb.b
           CROSS JOIN tot),
    doc AS (SELECT db.doc_id,
                   CAST(SUM(db.c) AS BIGINT) AS n_words,
                   SUM(db.c * lr.lr9) AS s9
            FROM db JOIN lr ON db.b = lr.b GROUP BY db.doc_id)
    SELECT doc_id, n_words,
           round(CAST(s9 AS DOUBLE) / 1000000000.0, 6) AS log_weight,
           CAST(doc_id % {DSIR_TARGET_MOD} = 0 AS BOOLEAN) AS is_target
    FROM doc
    ORDER BY log_weight DESC, doc_id
    LIMIT {DSIR_TOPK}
    """


@query("dsir_importance_select", oracle=_dsir_oracle())
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023, arXiv:2302.03169), the pretraining data-selection method:
    documents are featurized as hashed word-bucket counts
    ({DSIR_BUCKETS} buckets via the repo's base md5 hash), a target-
    domain sample (doc_id % {DSIR_TARGET_MOD} == 0 stands in for
    'looks like Wikipedia') and the raw corpus each get a smoothed
    bucket distribution, and every document scores the importance
    log-weight Σ_b count_doc[b]·(ln p_target[b] − ln p_source[b]) —
    the top-{DSIR_TOPK} selected. Per-bucket log-ratios are staged as
    round(lr·1e9) BIGINT ({DSIR_BUCKETS} rows, broadcast) so per-doc
    sums are integer-exact and order-free on both engines (the
    lm_bigram_perplexity idiom). 100 TB shape: one explode-shuffle of
    (doc, bucket) pairs, two bucket-sized aggregates, a broadcast
    join — no corpus-sized state anywhere."""
    from epe_data_wrangling_spark.functions.hashing import base_hash

    docs = load_table(spark, sf_dir, "documents")
    wb = docs.select(
        "doc_id", F.explode(T.words(F.lower(F.col("text")))).alias("word")
    ).select("doc_id", (base_hash(F.col("word")) % DSIR_BUCKETS).alias("b"))
    # ONE corpus explode+shuffle: every distribution below derives
    # from the (doc, bucket) aggregate, so Catalyst plans the heavy
    # exchange once and the corpus-sized branches become
    # ReusedExchange reads (4 scans -> 1 at 100 TB)
    db = wb.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    is_t = F.col("doc_id") % DSIR_TARGET_MOD == 0
    srcb = db.groupBy("b").agg(F.sum("c").alias("cs"))
    tgtb = db.filter(is_t).groupBy("b").agg(F.sum("c").alias("ct"))
    tot = db.agg(
        F.sum("c").alias("s_tot"),
        F.sum(F.when(is_t, F.col("c")).otherwise(0)).alias("t_tot"),
    )
    spine = spark.range(DSIR_BUCKETS).select(F.col("id").cast("int").alias("b"))
    lr = (
        spine.join(srcb, "b", "left")
        .join(tgtb, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        / (F.col("t_tot") + DSIR_BUCKETS).cast("double")
                    )
                    - F.log(
                        (F.coalesce(F.col("cs"), F.lit(0)) + 1)
                        / (F.col("s_tot") + DSIR_BUCKETS).cast("double")
                    )
                )
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("lr9"),
        )
    )
    doc = (
        db.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.col("lr9")).alias("s9"),
        )
    )
    return (
        doc.select(
            "doc_id",
            "n_words",
            F.round(F.col("s9").cast("double") / F.lit(1e9), 6).alias("log_weight"),
            is_t.alias("is_target"),
        )
        .orderBy(F.col("log_weight").desc(), "doc_id")
        .limit(DSIR_TOPK)
    )


# --- r6 additions: sketch / sampling / packing for the LLM pipeline ---

CMS_DEPTH = 4  #: count-min rows (independent seeded hashes)
CMS_WIDTH = 512  #: buckets per row
CMS_TOPK = 20  #: heavy hitters reported


def _cms_buckets(term: F.Column) -> F.Column:
    """array<long> of the {CMS_DEPTH} bucket indices for a term — one
    seeded md5 per row (functions.hashing.hash_u32), mod {CMS_WIDTH};
    exact on both engines."""
    from epe_data_wrangling_spark.functions.hashing import hash_u32

    return F.array(*[hash_u32(term, str(i)) % CMS_WIDTH for i in range(CMS_DEPTH)])


def _cms_bucket_sql(i: str, term: str) -> str:
    return (
        D.hex_int(f"md5(CAST({i} AS VARCHAR) || '|' || {term})", 1, 8)
        + f" % {CMS_WIDTH}"
    )


@query(
    "sketch_countmin_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_W}) AS term FROM documents),
    exact AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_n
              FROM tok GROUP BY term),
    top AS (SELECT term, exact_n FROM exact
            ORDER BY exact_n DESC, term LIMIT {CMS_TOPK}),
    r AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS row_i),
    sketch AS (
      SELECT r.row_i, {_cms_bucket_sql("r.row_i", "tok.term")} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cell_n
      FROM tok CROSS JOIN r GROUP BY 1, 2)
    SELECT t.term, t.exact_n, CAST(MIN(s.cell_n) AS BIGINT) AS cms_n
    FROM top t CROSS JOIN r
    JOIN sketch s
      ON s.row_i = r.row_i
     AND s.bucket = {_cms_bucket_sql("r.row_i", "t.term")}
    GROUP BY t.term, t.exact_n
    """,
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus term stream — the mergeable
    fixed-size frequency summary for heavy-hitter detection when the
    exact per-term table itself is too hot to keep (trending-term /
    boilerplate-phrase monitoring over a streaming crawl). {CMS_DEPTH}
    seeded hash rows × {CMS_WIDTH} buckets: the sketch is
    {CMS_DEPTH}·{CMS_WIDTH} cells REGARDLESS of corpus size, built
    with one (row, bucket) shuffle carrying partial counts (map-side
    combine) — at 100 TB the cells stream in from every partition and
    merge by addition, the CM property. Estimates (min over rows of
    the term's cells) are compared against exact counts for the true
    top-{CMS_TOPK} terms; CM guarantees estimate ≥ exact, with
    overshoot bounded by collisions (E[err] ≤ N/{CMS_WIDTH} per row).
    The tiny sketch is broadcast to the candidate probe — the corpus
    is never re-joined. Cross-engine: every bucket is seeded-md5 →
    int64 → mod, the repo's exact shared-hash idiom."""
    d = load_table(spark, sf_dir, "documents")
    # barrier: the exploded token stream feeds BOTH the exact counts
    # and the sketch cells, and Spark does not CSE across DataFrame
    # branches — without it the corpus is tokenized twice
    tok = d.select(F.explode(T.words("text")).alias("term")).localCheckpoint(eager=True)
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "term").limit(CMS_TOPK)
    cells = tok.select(F.posexplode(_cms_buckets(F.col("term"))).alias("row_i", "bucket"))
    sketch = cells.groupBy("row_i", "bucket").agg(F.count(F.lit(1)).alias("cell_n"))
    probe = top.select(
        "term", "exact_n", F.posexplode(_cms_buckets(F.col("term"))).alias("row_i", "bucket")
    )
    return (
        probe.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("term", "exact_n")
        .agg(F.min("cell_n").alias("cms_n"))
    )


WRS_K = 50  #: weighted sample size
#: A-ES key quantization (decimal places). Selection ranks on the
#: QUANTIZED key: two rows either share a grid cell (deterministic
#: o_orderkey tie-break) or differ by ≥1e-12, which no cross-engine
#: libm ln() ulp (~1e-21 at key magnitude) can bridge — restoring the
#: catalog-wide no-raw-floats-in-the-selection-path invariant.
WRS_KEY_DP = 12


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH w AS (
      SELECT o_orderkey, o_totalprice,
             round(ln(({D.hex_int("md5('wrs|' || CAST(o_orderkey AS VARCHAR))", 1, 8)} + 1)
                      / 4294967297.0) / o_totalprice, {WRS_KEY_DP}) AS k
      FROM orders)
    SELECT o_orderkey, o_totalprice
    FROM w ORDER BY k DESC, o_orderkey LIMIT {WRS_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES), the standard for quality-weighted corpus subsampling:
    each row draws u ~ U(0,1) and ranks by key u^(1/w) — here by the
    monotone-equivalent ln(u)/w — and the top-{WRS_K} keys are the
    sample; inclusion probability is proportional-to-weight without
    ever materializing a cumulative distribution. u is md5-derived
    (deterministic, reproducible across engines and runs — the repo's
    no-RAND policy), and selection is a distributed TakeOrdered
    (per-partition top-k, merge on the driver): ONE pass, no shuffle
    of the full table, no window. At 100 TB this is the
    one-scan-and-k-heap shape — the reservoir form of the same
    estimator. Orders weighted by o_totalprice; output is the
    selected id/weight set. Cross-engine determinism: the ranking key
    is QUANTIZED to a {WRS_KEY_DP}-dp grid on both engines (see
    WRS_KEY_DP) before the sort, with o_orderkey breaking grid-cell
    ties — so selection never compares raw libm doubles, the same
    invariant the rest of the catalog keeps via decimal staging."""
    from epe_data_wrangling_spark.functions.hashing import hash_u32

    o = load_table(spark, sf_dir, "orders")
    u = (hash_u32("o_orderkey", "wrs") + 1) / F.lit(4294967297.0)
    key = F.round(F.log(u) / F.col("o_totalprice"), WRS_KEY_DP)
    return (
        o.select("o_orderkey", "o_totalprice", key.alias("k"))
        .orderBy(F.desc("k"), "o_orderkey")
        .limit(WRS_K)
        .select("o_orderkey", "o_totalprice")
    )


PACK_BUDGET = 2048  #: tokens per packed sequence bin


@query(
    "pack_sequences_contiguous",
    oracle=f"""
    WITH d AS (SELECT doc_id, CAST(len({_W}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM d)
    SELECT CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY 1
    """,
)
def pack_sequences_contiguous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining batches: documents are
    packed in deterministic corpus order into contiguous
    {PACK_BUDGET}-token bins (bin = exclusive-prefix-tokens div
    budget) — the distributed-friendly packing form: first-fit
    bin packing is inherently sequential, but contiguous fill needs
    only a global running sum, which runs here as
    operators.windows.sharded_cumsum (range-shard → per-shard
    partitioned window + broadcast shard offsets — NO unpartitioned
    window, the repo-wide rule). A doc straddling a boundary starts
    the next bin's count (its bin is decided by its STARTING offset),
    so bins can overshoot by at most one doc — the padding/truncation
    tradeoff is downstream policy. Per-bin stats (doc count, token
    fill, id range) are the packing manifest a loader consumes.
    100 TB: one narrow scan + the sharded cumsum's two tiny
    shuffles; bins never materialize text."""
    from epe_data_wrangling_spark.operators.windows import sharded_cumsum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(T.words("text")).cast("bigint").alias("n_tokens")
    )
    c = sharded_cumsum(d, "doc_id", "n_tokens", out="cum")
    return (
        c.withColumn("bin_id", F.expr(f"(cum - n_tokens) div {PACK_BUDGET}"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
