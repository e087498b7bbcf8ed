"""Data-quality / constraint-audit suite (engine surface the
reference's manual eyeballing implies: its junk-row slicing and
regex routing ARE ad-hoc data-quality rules — `tratamento_epe.R:89,
133-138` strips rows that violate its shape expectations. Here the
idea is generalized to declarative, oracle-checked audits).

Scale notes: every audit is a single scan with conditional
aggregation (one partial+final pass, shuffle carries rule counters
only) or an aggregate-then-anti-join for referential checks — the
shapes that audit 100 TB in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog import ducksql as D
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)


@query(
    "dq_orders_constraint_audit",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_pk,
      CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
      CAST(SUM(CASE WHEN o_orderdate < DATE '1990-01-01'
                      OR o_orderdate > DATE '2030-01-01' THEN 1 ELSE 0 END) AS BIGINT)
        AS date_out_of_range,
      CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT)
        AS bad_status_domain,
      COUNT(*) - COUNT(DISTINCT o_orderkey) AS duplicate_pk
    FROM orders
    """,
)
def dq_orders_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit over orders in ONE scan:
    null-PK, non-positive price, date range, status domain, and
    PK-uniqueness violations as conditional aggregates. The whole
    audit is a single partial+final aggregate — rule count doesn't
    change the pass count."""
    o = load_table(spark, sf_dir, "orders")
    viol = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol(F.col("o_orderkey").isNull()).alias("null_pk"),
        viol(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        viol(
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("2030-01-01").cast("date"))
        ).alias("date_out_of_range"),
        viol(~F.col("o_orderstatus").isin("F", "O", "P")).alias("bad_status_domain"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("duplicate_pk"),
    )


@query(
    "dq_orphan_orders_fk",
    oracle="""
    SELECT COUNT(*) AS n_orphans,
           CAST(COALESCE(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_big_orphans
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def dq_orphan_orders_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orders whose o_custkey has no
    customer row (left-anti join against the distinct key set). At
    scale the key set is dimension-sized → broadcast anti join; the
    fact side never shuffles."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    orphans = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
    return orphans.agg(
        F.count(F.lit(1)).alias("n_orphans"),
        F.coalesce(F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_big_orphans"),
    )


@query(
    "dq_lineitem_null_profile",
    oracle="""
    SELECT 'l_quantity' AS col,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(*) AS n_rows
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag',
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
    FROM lineitem
    """,
)
def dq_lineitem_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rate profile for selected columns, one row per column.
    Spark computes all counters in ONE scan (a single aggregate whose
    results are unpivoted via stack) — the oracle's UNION ALL of
    three scans is the semantic spec, not the plan."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"null_{c}")
            for c in ("l_quantity", "l_discount", "l_returnflag")
        ],
    )
    return agg.select(
        F.expr(
            "stack(3, 'l_quantity', null_l_quantity, "
            "'l_discount', null_l_discount, "
            "'l_returnflag', null_l_returnflag) AS (col, n_null)"
        ),
        "n_rows",
    )


@query(
    "chisq_source_lang",
    oracle="""
    WITH o AS (SELECT source, lang, COUNT(*) AS obs
               FROM documents GROUP BY source, lang),
    rt AS (SELECT source, SUM(obs) AS r FROM o GROUP BY source),
    ct AS (SELECT lang, SUM(obs) AS c FROM o GROUP BY lang),
    n AS (SELECT SUM(obs) AS n FROM o),
    cells AS (
      SELECT o.source, o.lang, o.obs,
             CAST(rt.r AS DOUBLE) * ct.c / n.n AS expected
      FROM o JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n)
    SELECT source, lang, CAST(obs AS BIGINT) AS obs,
           round(expected, 6) AS expected,
           round((obs - expected) * (obs - expected) / expected, 6)
             AS chi2_term
    FROM cells
    """,
)
def chisq_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table independence profile (χ² cells) of source ×
    lang: observed vs expected counts and each cell's χ² term — the
    'is my corpus mix skewed by source' audit. Marginals are tiny
    aggregates broadcast back onto the cell table; all values derive
    from exact integer counts, so the double tree is identical across
    engines. One grouped scan of the corpus regardless of size."""
    d = load_table(spark, sf_dir, "documents")
    o = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("source").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("lang").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    expected = F.col("r").cast("double") * F.col("c") / F.col("n")
    return (
        o.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "lang",
            "obs",
            F.round(expected, 6).alias("expected"),
            F.round(
                (F.col("obs") - expected) * (F.col("obs") - expected) / expected, 6
            ).alias("chi2_term"),
        )
    )


@query(
    "gini_impurity_profile",
    oracle="""
    WITH c AS (SELECT event_type, COUNT(*) AS cnt FROM events
               GROUP BY event_type),
    n AS (SELECT SUM(cnt) AS n FROM c)
    SELECT 'event_type' AS column_name,
           CAST(COUNT(*) AS INTEGER) AS n_distinct,
           CAST(round(1.0 - SUM(CAST((CAST(cnt AS DOUBLE) / n.n)
                                     * (CAST(cnt AS DOUBLE) / n.n)
                                     AS DECIMAL(18,12))), 6)
                AS DOUBLE) AS gini
    FROM c CROSS JOIN n GROUP BY n.n
    """,
)
def gini_impurity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity (1 − Σp²) of the event_type distribution — the
    log-free concentration metric (entropy's rational cousin, so no
    cross-engine ln() hazard). p² terms are decimal-staged before the
    sum so the reduction is order-free; input is the tiny per-type
    count table."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    n = c.agg(F.sum("cnt").alias("n"))
    p = F.col("cnt").cast("double") / F.col("n")
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(
            F.lit("event_type").alias("column_name"),
            F.count(F.lit(1)).cast("int").alias("n_distinct"),
            F.round(
                F.lit(1.0) - F.sum((p * p).cast("decimal(18,12)")), 6
            ).alias("gini"),
        )
        .select("column_name", "n_distinct", "gini")
    )


def _orphan_sql(child: str, ck: str, parent: str, pk: str) -> str:
    return (f"(SELECT COUNT(*) FROM {child} c LEFT JOIN {parent} p "
            f"ON c.{ck} = p.{pk} WHERE p.{pk} IS NULL)")


@query(
    "dq_referential_summary",
    oracle=f"""
    SELECT
      {_orphan_sql('orders', 'o_custkey', 'customer', 'c_custkey')} AS orphan_orders_customer,
      {_orphan_sql('lineitem', 'l_orderkey', 'orders', 'o_orderkey')} AS orphan_lineitem_orders,
      {_orphan_sql('lineitem', 'l_partkey', 'part', 'p_partkey')} AS orphan_lineitem_part,
      {_orphan_sql('lineitem', 'l_suppkey', 'supplier', 's_suppkey')} AS orphan_lineitem_supplier,
      {_orphan_sql('customer', 'c_nationkey', 'nation', 'n_nationkey')} AS orphan_customer_nation,
      {_orphan_sql('supplier', 's_nationkey', 'nation', 'n_nationkey')} AS orphan_supplier_nation,
      {_orphan_sql('nation', 'n_regionkey', 'region', 'r_regionkey')} AS orphan_nation_region
    """,
)
def dq_referential_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema referential-integrity dashboard: orphan counts for
    every foreign-key edge of the star schema in ONE row — the audit
    a landing pipeline runs per batch. Each edge is a broadcast anti
    join count (dimension side small), facts scanned once per edge
    and never shuffled; zeros certify the contract, nonzeros localize
    the broken edge."""
    edges = [
        ("orders", "o_custkey", "customer", "c_custkey", "orphan_orders_customer"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey", "orphan_lineitem_orders"),
        ("lineitem", "l_partkey", "part", "p_partkey", "orphan_lineitem_part"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey", "orphan_lineitem_supplier"),
        ("customer", "c_nationkey", "nation", "n_nationkey", "orphan_customer_nation"),
        ("supplier", "s_nationkey", "nation", "n_nationkey", "orphan_supplier_nation"),
        ("nation", "n_regionkey", "region", "r_regionkey", "orphan_nation_region"),
    ]
    out = None
    for child, ck, parent, pk, alias in edges:
        cdf = load_table(spark, sf_dir, child).select(ck)
        pdf = load_table(spark, sf_dir, parent).select(pk)
        cnt = (
            cdf.join(F.broadcast(pdf), cdf[ck] == pdf[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias(alias))
        )
        out = cnt if out is None else out.crossJoin(F.broadcast(cnt))
    return out


@query(
    "entropy_lang_by_source",
    oracle="""
    WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY source, lang),
    t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS n_langs FROM c GROUP BY source),
    terms AS (
      SELECT c.source, t.tot, t.n_langs,
             CAST(round((n / CAST(tot AS DOUBLE)) * log2(n / CAST(tot AS DOUBLE)), 12)
                  AS DECIMAL(28,12)) AS term
      FROM c JOIN t USING (source))
    SELECT source, MAX(tot) AS n_docs, MAX(n_langs) AS n_langs,
           round(-CAST(SUM(term) AS DOUBLE), 10) AS lang_entropy_bits
    FROM terms GROUP BY source
    """,
)
def entropy_lang_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of each source's language distribution —
    the mixture-diversity audit a corpus-balance dashboard needs (0 =
    monolingual source; log2(k) = uniform over k languages). Two
    partial-aggregated scans ((source,lang) counts, then per-source
    reduce); entropy terms are rounded to 12 dp and decimal-summed so
    the per-source sum is order-free on both engines."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_langs")
    )
    p = F.col("n") / F.col("tot").cast("double")
    terms = c.join(t, "source").select(
        "source",
        "tot",
        "n_langs",
        F.round(p * F.log2(p), 12).cast("decimal(28,12)").alias("term"),
    )
    return terms.groupBy("source").agg(
        F.max("tot").alias("n_docs"),
        F.max("n_langs").alias("n_langs"),
        F.round(-F.sum("term").cast("double"), 10).alias("lang_entropy_bits"),
    )


@query(
    "benford_first_digit_audit",
    oracle="""
    WITH x AS (
      SELECT CAST(floor(o_totalprice / power(10, floor(log10(o_totalprice))))
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM x)
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
           round(COUNT(*) / CAST(total AS DOUBLE), 8) AS obs_freq,
           round(log10(1.0 + 1.0 / digit), 8) AS benford_freq,
           round(COUNT(*) / CAST(total AS DOUBLE) - log10(1.0 + 1.0 / digit), 8)
             AS deviation
    FROM x CROSS JOIN n GROUP BY digit, total
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-significant-
    digit frequencies vs the log10(1+1/d) expectation — the classic
    fabricated-numbers screen for financial columns. One scan to a
    9-row digit histogram (partial-aggregated); the scalar total
    broadcasts back. Synthetic uniform-ish prices will deviate from
    Benford — the point of the audit is the per-digit deviation
    column, not conformance."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    x = o.select(digit.alias("digit"))
    n = x.agg(F.count(F.lit(1)).alias("total"))
    counts = x.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    obs = F.col("n") / F.col("total").cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(n))
        .select(
            "digit",
            "n",
            F.round(obs, 8).alias("obs_freq"),
            F.round(exp, 8).alias("benford_freq"),
            F.round(obs - exp, 8).alias("deviation"),
        )
    )


_PROFILE_COLS = [  # (name, numeric) — orders schema
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    parts = []
    for name, numeric in _PROFILE_COLS:
        mn = f"CAST(MIN({name}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({name}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"""
    SELECT '{name}' AS col_name,
           CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num
    FROM orders""")
    return " UNION ALL ".join(parts)


@query("dq_schema_profile", oracle=_profile_oracle())
def dq_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style column profile of the orders table — per
    column: null count, exact distinct count, numeric min/max (NULL
    for non-numeric columns, whose min/max STRING formatting is not
    engine-portable) — the first pass a data contract check runs on
    an unfamiliar table. ONE scan: every metric is computed in a
    single aggregate row, then unpivoted into per-column rows with a
    literal-array explode (no second scan, no per-column pass). At
    100 TB swap the exact distinct counts for approx_count_distinct
    under the same output contract."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for name, numeric in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(name)).alias(f"{name}__nulls"),
            F.countDistinct(name).alias(f"{name}__dist"),
        ]
        if numeric:
            aggs += [
                F.min(name).cast("double").alias(f"{name}__min"),
                F.max(name).cast("double").alias(f"{name}__max"),
            ]
    one = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(f"{name}__nulls").cast("bigint").alias("n_nulls"),
                F.col(f"{name}__dist").cast("bigint").alias("n_distinct"),
                (
                    F.col(f"{name}__min")
                    if numeric
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{name}__max")
                    if numeric
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for name, numeric in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.col_name", "r.n_nulls", "r.n_distinct", "r.min_num", "r.max_num"
    )


@query(
    "dq_observe_single_scan",
    oracle="""
    WITH main AS (
      SELECT COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM orders WHERE o_orderstatus = 'F'),
    qc AS (
      SELECT COUNT(*) AS scanned_rows,
             COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS bad_price,
             COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_cust,
             MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
      FROM orders)
    SELECT n_orders, revenue, scanned_rows, bad_price, null_cust,
           min_date, max_date
    FROM main, qc
    """,
)
def dq_observe_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SINGLE-SCAN audit pattern via ``df.observe`` (Spark's
    Observation API): data-quality metrics — scanned-row count,
    non-positive prices, null FKs, date bounds — ride the SAME
    parquet scan as a production aggregate, as accumulator-style
    observed metrics. At 100 TB this is the difference between
    auditing for free and paying a second full pass; the pushed
    filter on the production branch cannot corrupt the audit because
    observe() sits UPSTREAM of the filter in the plan. Output is ONE
    TYPED row (bigints, a double, timestamps) — an earlier form
    rendered everything to (metric, value) strings via Python
    ``repr``/``strftime``, the same engine-rendering-parity hazard
    class that broke variant_shred_events in r4; typed columns are
    compared as values, never as engine-formatted text."""
    from pyspark.sql import Observation
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from epe_data_wrangling_spark.catalog.core import dec

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("qc")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("scanned_rows"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("bad_price"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_cust"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )
    main = (
        observed.filter(F.col("o_orderstatus") == "F")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )
    [mrow] = main.collect()  # one action: fills both result and metrics
    qc = obs.get
    schema = StructType(
        [
            StructField("n_orders", LongType()),
            StructField("revenue", DoubleType()),
            StructField("scanned_rows", LongType()),
            StructField("bad_price", LongType()),
            StructField("null_cust", LongType()),
            StructField("min_date", TimestampType()),
            StructField("max_date", TimestampType()),
        ]
    )
    row = (
        mrow.n_orders,
        mrow.revenue,
        qc["scanned_rows"],
        qc["bad_price"],
        qc["null_cust"],
        qc["min_date"],
        qc["max_date"],
    )
    return spark.createDataFrame([row], schema)


COMPACT_FRAGMENTS = 64  #: how badly the fixture table is fragmented
COMPACT_TARGET_FILES = 4


@query(
    "layout_compaction_lossless",
    oracle=f"""
    SELECT CAST({COMPACT_FRAGMENTS} AS BIGINT) AS n_files_before,
           CAST({COMPACT_TARGET_FILES} AS BIGINT) AS n_files_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    """,
)
def layout_compaction_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (operators.layout.compact_small_files) —
    the maintenance pass for the 'small files problem': the orders
    table is deliberately fragmented into {COMPACT_FRAGMENTS} files
    (the shape a per-batch streaming sink leaves behind), compacted
    by measured bytes into {COMPACT_TARGET_FILES}, and the audit row
    proves the rewrite is LOSSLESS against an oracle that only ever
    reads the ORIGINAL table: row count, distinct keys and the exact
    decimal-staged total must all survive, and the file counts are
    pinned. At scale this is the compaction job an object-store
    table runs nightly; scan cost tracks file count, not bytes."""
    import os
    import shutil
    import tempfile

    from epe_data_wrangling_spark.catalog.core import dec
    from epe_data_wrangling_spark.operators.layout import compact_small_files

    o = load_table(spark, sf_dir, "orders")
    work = tempfile.mkdtemp(prefix="compact_")
    frag, dest = os.path.join(work, "frag"), os.path.join(work, "compacted")
    try:
        o.repartition(COMPACT_FRAGMENTS).write.parquet(frag)
        size = sum(
            os.path.getsize(os.path.join(frag, f))
            for f in os.listdir(frag)
            if f.endswith(".parquet")
        )
        audit = compact_small_files(
            spark, frag, dest,
            target_file_bytes=(size + COMPACT_TARGET_FILES - 1) // COMPACT_TARGET_FILES,
        )
        stats = (
            spark.read.parquet(dest)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("o_orderkey").alias("n_keys"),
                F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            )
            .collect()[0]
        )
        row = (
            audit["n_files_before"],
            audit["n_files_after"],
            stats.n_rows,
            stats.n_keys,
            stats.total_price,
        )
        return spark.createDataFrame(
            [row],
            "n_files_before long, n_files_after long, n_rows long, "
            "n_keys long, total_price double",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---- Z-order layout skipping audit -----------------------------------

ZQ_BITS = 8  #: bits per column code (256 cells/dim; 16-bit Morton key)
ZQ_FILES = 16  #: logical file ranges per layout (power of two)
ZQ_FILE_BITS = ZQ_FILES.bit_length() - 1  #: log2(ZQ_FILES)
#: bucket shifts, derived so constants can't desync from behavior:
#: Morton key has 2·ZQ_BITS bits, a single-column code ZQ_BITS
ZQ_Z_SHIFT = 2 * ZQ_BITS - ZQ_FILE_BITS
ZQ_C_SHIFT = ZQ_BITS - ZQ_FILE_BITS
#: probe rectangles in CODE space (closed ranges)
ZQ_PROBE_P = (64, 95)  #: l_partkey codes — an eighth of the key space
ZQ_PROBE_S = (128, 191)  #: l_suppkey codes — a quarter of the key space


def _zq_oracle() -> str:
    b, m = ZQ_BITS, (1 << ZQ_BITS) - 1

    def code(col: str, mn: str, mx: str) -> str:
        return (
            f"LEAST(GREATEST(CAST(FLOOR((CAST({col} AS DOUBLE) - CAST({mn} AS DOUBLE)) "
            f"/ CAST(({mx} - {mn}) AS DOUBLE) * {m}) AS BIGINT), 0), {m})"
        )

    z = " + ".join(
        f"(((c1 >> {j}) & 1) << {2 * j + 1}) + (((c2 >> {j}) & 1) << {2 * j})"
        for j in range(b)
    )
    pl, ph = ZQ_PROBE_P
    sl, sh = ZQ_PROBE_S
    return f"""
    WITH bounds AS (SELECT MIN(l_partkey) AS p0, MAX(l_partkey) AS p1,
                           MIN(l_suppkey) AS s0, MAX(l_suppkey) AS s1
                    FROM lineitem),
    coded AS (SELECT {code('l_partkey', 'p0', 'p1')} AS c1,
                     {code('l_suppkey', 's0', 's1')} AS c2
              FROM lineitem, bounds),
    keyed AS (SELECT c1, c2, ({z}) AS z FROM coded),
    lay AS (
      SELECT 'zorder' AS layout, CAST(z >> {ZQ_Z_SHIFT} AS INT) AS file_id, c1, c2 FROM keyed
      UNION ALL
      SELECT 'linear', CAST(c1 >> {ZQ_C_SHIFT} AS INT), c1, c2 FROM keyed)
    SELECT layout, file_id, COUNT(*) AS n_rows,
           MIN(c1) AS min_p, MAX(c1) AS max_p,
           MIN(c2) AS min_s, MAX(c2) AS max_s,
           CAST(CASE WHEN MIN(c1) <= {ph} AND MAX(c1) >= {pl} THEN 1 ELSE 0 END AS INT)
             AS hit_probe_p,
           CAST(CASE WHEN MIN(c2) <= {sh} AND MAX(c2) >= {sl} THEN 1 ELSE 0 END AS INT)
             AS hit_probe_s
    FROM lay GROUP BY layout, file_id
    """


@query("layout_zorder_skipping", oracle=_zq_oracle())
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering's data-skipping payoff, quantified and
    oracle-checked (operators.layout.zorder_key — the Morton-curve
    layout Delta/Iceberg OPTIMIZE ZORDER produces, re-expressed as
    plain expressions): lineitem keys are quantized to {ZQ_BITS}-bit
    codes from one broadcast min/max row (rank-free — no global
    window/sort anywhere), bit-interleaved into the Morton index, and
    bucketed into {ZQ_FILES} logical file ranges two ways — along the
    z-curve and along a single-column sort. Each file's min-max cube
    is then probed with two rectangles, exactly as a parquet reader
    prunes row groups. The certified numbers show the trade: the
    single-column layout prunes perfectly on ITS column and not at
    all on the other (sf0.01: partkey probe touches 2/16 files,
    supplier probe 16/16); the z-layout bounds BOTH dimensions
    (4/16 files for EITHER probe). The physical twin
    (repartitionByRange on z → parquet footer stats) is asserted in
    tests/test_layout.py; this query certifies the curve math
    cross-engine."""
    from epe_data_wrangling_spark.operators.layout import _column_code, zorder_key

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("p0"), F.max("l_partkey").alias("p1"),
        F.min("l_suppkey").alias("s0"), F.max("l_suppkey").alias("s1"),
    )
    wb = li.crossJoin(F.broadcast(bounds))
    c1 = _column_code("l_partkey", F.col("p0"), F.col("p1"), ZQ_BITS)
    c2 = _column_code("l_suppkey", F.col("s0"), F.col("s1"), ZQ_BITS)
    keyed = wb.select(
        c1.alias("c1"), c2.alias("c2"),
        zorder_key([c1, c2], ZQ_BITS).alias("z"),
    )
    both = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("z"), ZQ_Z_SHIFT).cast("int").alias("file_id"),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.shiftright(F.col("c1"), ZQ_C_SHIFT).cast("int").alias("file_id"),
                ),
            )
        ).alias("e"),
        "c1",
        "c2",
    ).select("e.layout", "e.file_id", "c1", "c2")
    pl, ph = ZQ_PROBE_P
    sl, sh = ZQ_PROBE_S
    return both.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("c1").alias("min_p"), F.max("c1").alias("max_p"),
        F.min("c2").alias("min_s"), F.max("c2").alias("max_s"),
        F.when((F.min("c1") <= ph) & (F.max("c1") >= pl), 1).otherwise(0)
        .cast("int").alias("hit_probe_p"),
        F.when((F.min("c2") <= sh) & (F.max("c2") >= sl), 1).otherwise(0)
        .cast("int").alias("hit_probe_s"),
    )


# --- r6 addition: key-skew profiler (the salting-decision input) ---

SKEW_TOPK = 15  #: heaviest keys reported


@query(
    "skew_key_profile",
    oracle=f"""
    WITH k AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
               FROM lineitem GROUP BY l_suppkey),
    s AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(MAX(n) AS BIGINT) AS max_n
          FROM k)
    SELECT k.l_suppkey, k.n,
           round(CAST(k.n AS DOUBLE) / s.total, 8) AS share,
           round(CAST(k.n AS DOUBLE) * s.n_keys / s.total, 6) AS skew_factor,
           round(CAST(s.max_n AS DOUBLE) * s.n_keys / s.total, 6)
             AS max_skew_factor
    FROM k CROSS JOIN s
    ORDER BY k.n DESC, k.l_suppkey LIMIT {SKEW_TOPK}
    """,
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the measurement that DECIDES the
    skew treatment (operators.joins.salted_join's salt factor, or
    trusting AQE's runtime skew split): top-{SKEW_TOPK} heaviest
    lineitem supplier keys with each key's share of the table and its
    skew factor (count ÷ mean-per-key; a factor ≫ 1 on a key that
    lands in one shuffle partition is exactly the straggler that
    salting spreads). At 100 TB this is ONE partial-agg shuffle of
    (key, count) — the per-key table is keys-sized, its global stats
    a one-row broadcast, and the report a distributed top-k; profiling
    cost is a rounding error next to the join it tunes. Integer
    counts end-to-end; the two ratios are one shared double tree."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    s = k.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
    )
    return (
        k.crossJoin(F.broadcast(s))
        .select(
            "l_suppkey",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 8).alias("share"),
            F.round(
                F.col("n").cast("double") * F.col("n_keys") / F.col("total"), 6
            ).alias("skew_factor"),
            F.round(
                F.col("max_n").cast("double") * F.col("n_keys") / F.col("total"), 6
            ).alias("max_skew_factor"),
        )
        .orderBy(F.desc("n"), "l_suppkey")
        .limit(SKEW_TOPK)
    )


DP_EPSILON = 1.0  #: privacy budget epsilon; Laplace scale b = sensitivity/epsilon
DP_SCALE_B = 1.0 / DP_EPSILON  #: the b actually multiplied into the noise term
DP_NOISE_DP = 6  #: noise quantization (same cross-engine-libm rule as WRS_KEY_DP)
K_ANON = 10  #: minimum group size a quasi-identifier release tolerates


@query(
    "dp_noisy_group_counts",
    oracle=f"""
    WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY event_type),
    u AS (SELECT event_type, n,
                 ({D.hex_int("md5('dp|' || CAST(event_type AS VARCHAR))", 1, 8)}
                  + 1) / 4294967297.0 AS u
          FROM g)
    SELECT event_type,
           round(n + round(-{DP_SCALE_B} * sign(u - 0.5)
                           * ln(1 - 2 * abs(u - 0.5)), {DP_NOISE_DP}),
                 {DP_NOISE_DP}) AS n_noisy
    FROM u
    """,
)
def dp_noisy_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-SHAPED count release: per-group counts
    plus Laplace(b = 1/{DP_EPSILON}) noise via inverse-CDF
    (−b·sign(u−½)·ln(1−2|u−½|)). HONESTY NOTE, stated plainly: real
    DP requires fresh randomness; here u is the repo's seeded md5
    uniform (``hash_u32``) so the release is REPRODUCIBLE and
    oracle-checkable — this certifies the noise ARITHMETIC and the
    one-pass release plan (swap the uniform source for true
    randomness in production and the plan is unchanged). The noise
    term is quantized to {DP_NOISE_DP} dp before addition (the
    WRS_KEY_DP rule) so no raw libm double reaches the hashed
    result. Scale: one partial-agg shuffle; noise is per-GROUP, so
    the noisy release costs nothing beyond the exact one."""
    from epe_data_wrangling_spark.functions.hashing import hash_u32

    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = (hash_u32("event_type", "dp") + 1) / F.lit(4294967297.0)
    noise = F.round(
        -F.lit(DP_SCALE_B)
        * F.signum(u - 0.5)
        * F.log(1 - 2 * F.abs(u - 0.5)),
        DP_NOISE_DP,
    )
    return g.select(
        "event_type", F.round(F.col("n") + noise, DP_NOISE_DP).alias("n_noisy")
    )


@query(
    "kanon_quasi_identifier_audit",
    oracle=f"""
    WITH g AS (SELECT c_nationkey, c_mktsegment,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT c_nationkey, c_mktsegment, n,
           n < {K_ANON} AS below_k,
           CASE WHEN n < {K_ANON} THEN '<suppressed>'
                ELSE CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
           END AS release_key
    FROM g
    """,
)
def kanon_quasi_identifier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination
    (nation × market segment): any group smaller than k={K_ANON} is
    re-identification-risky and its release key is suppressed — the
    gate a privacy review runs before publishing per-segment stats
    (and the training-data analogue: rare attribute combinations
    that memorization could expose). One partial-agg pass; the audit
    table is |quasi-id-combinations|-sized regardless of corpus."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "n",
        (F.col("n") < K_ANON).alias("below_k"),
        F.when(F.col("n") < K_ANON, "<suppressed>")
        .otherwise(
            F.concat_ws("|", F.col("c_nationkey").cast("string"), "c_mktsegment")
        )
        .alias("release_key"),
    )
