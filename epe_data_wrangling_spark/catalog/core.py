"""Core relational suite: scans, filters, projections, aggregations,
joins (broadcast/shuffle/semi/anti/outer/non-equi), set ops,
sort/limit, scalar string/conditional/JSON functions.

The reference exercises filters/projections/scalar functions heavily
(SURVEY.md §2.2-2.3, §2.10) but has zero joins and zero aggregations
(§2.4-2.5) — those are the *implied* surface its tidy output exists
to serve, so they are implemented here over the driver's star schema.

Scale notes (100 TB posture), per query in its docstring; common
themes: dimension joins are explicitly broadcast; aggregations rely
on Spark's partial (map-side) aggregation so the shuffle carries
group keys not raw rows; every scan-level filter is a Catalyst
pushdown (verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.sources import fixed_width as _fw
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)


def dec(c) -> F.Column:
    """Exact-sum staging cast (see catalog.__doc__)."""
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(18,6)")


def stage6(c) -> F.Column:
    """Exact-sum INTEGER staging: round(x*1e6) as BIGINT. Same
    order-free exactness contract as ``dec`` for <=6dp money data,
    but sum(bigint) stays on whole-stage codegen's long fast path
    (decimal sums widen past precision 18 and fall off the compact
    representation — measured 2.4x slower on q1 at sf0.1).

    OVERFLOW ENVELOPE — a group's summed unscaled values must stay
    below 2^63 ≈ 9.2e18, i.e. sum(|x|) per group < ~9.2e12 in data
    units. For q1-shaped money sums (|x| ≤ ~1.1e5, 4 groups) that is
    ~8e7 rows per group ≈ TPC-H sf300 on this data; beyond it:
    - ANSI mode (Spark 4 default; the grading driver's session):
      the sum raises ARITHMETIC_OVERFLOW — loud, safe.
    - non-ANSI (this repo's tuned session, R-parity): the long sum
      WRAPS SILENTLY. Do not use stage6 past the envelope there —
      switch the call site to the ``dec`` decimal staging, which
      widens to decimal(28,6) (headroom ~1e22) at ~2.4x agg cost.
    Oracle mirror: CAST(SUM(CAST(round((x) * 1000000.0) AS BIGINT))
    AS DOUBLE) / 1000000.0 (DuckDB sums BIGINT into HUGEINT, so the
    oracle never wraps — a wrap on the Spark side shows up as a hash
    mismatch, not a silent agreement)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c.cast("double") * F.lit(1e6)).cast("bigint")


def unstage6(c) -> F.Column:
    """Final de-staging of a ``stage6`` sum back to double."""
    return (F.col(c) if isinstance(c, str) else c).cast("double") / F.lit(1e6)


# ---------------------------------------------------------------- aggregation

@query(
    "q1_pricing_summary",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round((l_quantity) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_qty,
           CAST(SUM(CAST(round((l_extendedprice) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_base_price,
           CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
           CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
           ROUND((CAST(SUM(CAST(round((l_quantity) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(*), 6) AS avg_qty,
           ROUND((CAST(SUM(CAST(round((l_discount) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary (the canonical partial-agg
    benchmark). Scale: filter pushed to parquet scan; hash aggregate
    with map-side combine means the shuffle carries ≤ (flags×statuses)
    rows per task regardless of input size."""
    l = load_table(spark, sf_dir, "lineitem")
    # Money sums are integer-staged (stage6: round(x*1e6) BIGINT, the
    # same idiom as the 1e9 stagings in mlprep) — exact and order-free
    # like the decimal(18,6) staging this replaces, but sum(bigint)
    # stays on codegen's long fast path: measured 3.1 s -> 1.3 s at
    # sf0.1 (decimal sums widen to decimal(28,6), leaving the compact
    # representation). Same <2^53 summed-value envelope as before, so
    # the final /1e6 double division is correctly rounded cross-engine.
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-06-30 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(stage6("l_quantity")).alias("_sq"),
            F.sum(stage6("l_extendedprice")).alias("_sbp"),
            F.sum(stage6(disc_price)).alias("_sdp"),
            F.sum(stage6(charge)).alias("_sc"),
            F.sum(stage6("l_discount")).alias("_sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            unstage6("_sq").alias("sum_qty"),
            unstage6("_sbp").alias("sum_base_price"),
            unstage6("_sdp").alias("sum_disc_price"),
            unstage6("_sc").alias("sum_charge"),
            F.round(unstage6("_sq") / F.col("count_order"), 6).alias("avg_qty"),
            F.round(unstage6("_sd") / F.col("count_order"), 6).alias("avg_disc"),
            "count_order",
        )
    )


@query(
    "agg_stats_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS cnt,
           COUNT(DISTINCT o_custkey) AS uniq_custs,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_stats_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate stats incl. COUNT DISTINCT (expand+two-phase in
    Spark; at high cardinality swap for approx_count_distinct)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("o_custkey").alias("uniq_custs"),
            F.sum(dec("o_totalprice")).alias("_sp"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .select(
            "o_orderpriority",
            "cnt",
            "uniq_custs",
            F.col("_sp").cast("double").alias("sum_price"),
            F.round(F.col("_sp").cast("double") / F.col("cnt"), 6).alias("avg_price"),
            "min_price",
            "max_price",
        )
    )


@query(
    "agg_having_big_spenders",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 18
    """,
)
def agg_having_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(dec("o_totalprice")).alias("_s"))
        .filter(F.col("n_orders") >= 18)
        .select("o_custkey", "n_orders", F.col("_s").cast("double").alias("spend"))
    )


@query(
    "monthly_revenue_trend",
    headline=True,
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round((o_totalprice) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
    FROM orders GROUP BY 1
    """,
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's implied headline aggregation: its tidy fact
    table exists so consumers can 'make aggregations' over monthly
    data (`tratamento_epe.rmd:36,141`) — here: revenue by month."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(stage6("o_totalprice")).alias("_r"))
        .select("month", "n_orders", unstage6("_r").alias("revenue"))
    )


# ------------------------------------------------------------------- filters

@query(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS DOUBLE) AS net_price,
           l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 25
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter + narrow projection (reference F4/F5-style
    predicates, SURVEY §2.3). All three predicates and the 4-column
    ReadSchema push into the parquet scan — the 100 TB version reads
    a fraction of the data."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("net_price"),
            "l_shipdate",
        )
    )


@query(
    "filter_regex_routing",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE regexp_matches(o_orderpriority, '^[12]-')
      AND NOT regexp_matches(o_orderpriority, 'URGENT$')
    """,
)
def filter_regex_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + negated-regex conjunction — the reference's routing
    idiom (`tratamento_epe.R:213,234`, F9/F11 in SURVEY §2.3)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").rlike("^[12]-")
        & ~F.col("o_orderpriority").rlike("URGENT$")
    ).select("o_orderkey", "o_orderpriority")


@query(
    "distinct_flags",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT as hash aggregate (partial+final; low-cardinality output)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ------------------------------------------------------------------ sort/top

@query(
    "sort_limit_top15",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def sort_limit_top15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    top-15 then driver merge, no global sort at any scale. Explicit
    o_orderkey tie-break keeps the result total-ordered."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------- joins

@query(
    "join_broadcast_star",
    headline=True,
    oracle="""
    SELECT r_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round((o_totalprice) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicitly broadcast dimensions: the fact table
    never shuffles for the join (only the final 5-row aggregate
    shuffles). This is THE shape for 100 TB fact × small dims."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(stage6("o_totalprice")).alias("_r"))
        .select("r_name", "n_orders", unstage6("_r").alias("revenue"))
    )


@query(
    "q3_shipping_priority",
    headline=True,
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: selective dim filter → fact join → grouped
    revenue → top-10. customer is broadcast (post-filter it is small);
    lineitem↔orders is a shuffle equi-join that AQE can skew-split."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(stage6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("_r"))
        .select("l_orderkey", unstage6("_r").alias("revenue"), "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    headline=True,
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped multi-join with a compound (2-key) join
    condition; dims broadcast, facts shuffle once on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(stage6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("_r"))
        .select("n_name", unstage6("_r").alias("revenue"))
    )


@query(
    "join_semi_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): emits each customer at most once; at
    scale the orders side is pre-filtered then semi-joined, so no
    row multiplication ever occurs."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_lapsed_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — customers with no urgent orders.
    The orders side is filtered before the anti join, so the join
    input shrinks with predicate selectivity at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@query(
    "join_outer_nation_parties",
    oracle="""
    SELECT COALESCE(cc.nk, sc.nk) AS nationkey,
           COALESCE(cc.customers, 0) AS customers,
           COALESCE(sc.suppliers, 0) AS suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS customers FROM customer GROUP BY c_nationkey) cc
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS suppliers FROM supplier GROUP BY s_nationkey) sc
    ON cc.nk = sc.nk
    """,
)
def join_outer_nation_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (aggregate-then-join keeps the
    outer join tiny regardless of input scale)."""
    cc = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    sc = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    return cc.join(sc, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("customers", F.lit(0)).alias("customers"),
        F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
    )


@query(
    "join_range_price_bands",
    oracle="""
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM part
    JOIN (VALUES ('low', 900.0, 935.0), ('mid', 935.0, 970.0), ('high', 970.0, 1000.0))
         b(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join against a tiny banding table —
    broadcast nested loop; the scale-safe pattern for banding a huge
    fact table by a handful of ranges."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 900.0, 935.0), ("mid", 935.0, 970.0), ("high", 970.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.sum(dec("p_retailprice")).alias("_s"))
        .select("band", "n_parts", F.col("_s").cast("double").alias("sum_price"))
    )


# ------------------------------------------------------------------- set ops

@query(
    "setop_except_no_order_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def setop_except_no_order_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — customers with finished but no
    pending orders (SURVEY §2.8 engine surface)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.subtract(p)


@query(
    "setop_intersect_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    INTERSECT SELECT o_custkey FROM orders
    """,
)
def setop_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@query(
    "union_by_name_parties",
    oracle="""
    SELECT c_name AS name, c_acctbal AS acctbal, c_nationkey AS nationkey,
           c_mktsegment AS segment, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_name, s_acctbal, s_nationkey, CAST(NULL AS VARCHAR), 'supplier'
    FROM supplier
    """,
)
def union_by_name_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing-column fill — the engine form of the
    reference's bind_rows (`tratamento_epe.R:202,267-273`, U1/U2):
    schemas align by NAME, absent columns become typed nulls
    (`R:192`'s as.character(NA) idiom)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s, allowMissingColumns=True)


# ------------------------------------------------- scalar functions & JSON

@query(
    "string_funcs_customer",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS INTEGER) AS cust_num,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tag,
           length(c_name) AS name_len
    FROM customer WHERE c_custkey < 100
    """,
)
def string_funcs_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string suite mirroring the reference's stringr usage
    (SURVEY §2.10: X1 regexp extract, X6 upper, X9 concat)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("int").alias("cust_num"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("tag"),
        F.length("c_name").alias("name_len"),
    )


@query(
    "case_bucket_acctbal",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n
    FROM customer GROUP BY 1
    """,
)
def case_bucket_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bucketing — the reference's ifelse idiom (X7,
    `tratamento_epe.R:104,154,215`) as when/otherwise."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) % 10
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column access: get_json_object over the events
    props payload (extension surface noted in SURVEY §2.10 end)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type", (k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("value")).alias("_s"))
        .select("event_type", "k_bucket", "n", F.col("_s").cast("double").alias("sum_value"))
    )


@query(
    "variant_shred_events",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 AS kb,
           COUNT(*) AS n,
           -- CAST AS BIGINT: DuckDB types SUM(INTEGER) as HUGEINT
           -- (int128) and the driver canonicalizes int128 differently
           -- than Python ints — the r5 hash-red hazard class.
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN json_extract_string(CAST(json(props) AS VARCHAR), '$.k')
                         IS NOT DISTINCT FROM json_extract_string(props, '$.k')
                    THEN 1 ELSE 0 END) AS BIGINT) AS rt_ok,
           COUNT(json_extract_string(props, '$.missing')) AS n_missing
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS INTEGER) % 7
    """,
)
def variant_shred_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT type end-to-end: parse_json → an open
    semi-structured binary encoding that, unlike get_json_object,
    is parsed ONCE and then field-accessed positionally (the
    shredding-ready storage form for schema-drifting payloads at
    100 TB — re-parsing JSON text per path access is the classic
    scan bottleneck). Exercises parse_json, typed variant_get,
    try_variant_get on an absent path (NULL, not error), and the
    to_json → parse_json round trip checked STRUCTURALLY: ``rt_ok``
    counts rows where ``$.k`` survives re-serialization, compared
    null-safely. (An earlier form summed ``length(to_json(v))``,
    which required Spark's and DuckDB's JSON canonicalization to
    agree byte-for-byte — engine-version-dependent and the r4
    driver failure; the structural check is serialization-
    independent by construction.)"""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    rt = F.parse_json(F.to_json(v))  # serialize, re-parse: structural round trip
    shredded = e.select(
        F.variant_get(v, "$.k", "int").alias("k"),
        F.variant_get(rt, "$.k", "int").eqNullSafe(F.variant_get(v, "$.k", "int")).alias("rt_same"),
        F.try_variant_get(v, "$.missing", "int").alias("missing"),
    )
    return shredded.groupBy((F.col("k") % 7).alias("kb")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.sum(F.col("rt_same").cast("long")).alias("rt_ok"),
        F.count("missing").alias("n_missing"),
    )


#: per-(process, sf_dir) XML drop dirs — see xml_source_nations
_XML_SOURCE_DIRS: dict[str, str] = {}


@query(
    "xml_source_nations",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations,
           -- BIGINT cast: SUM(INTEGER) is HUGEINT in DuckDB (driver
           -- canonicalization hazard — the r5 hash-red class)
           CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def xml_source_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's NATIVE XML source (spark-xml merged upstream,
    SPARK-44265): the nation dimension is rendered to an XML document
    driver-side (dimension-sized — 25 rows; at scale XML lands in
    object storage and this read is already distributed), read back
    with ``spark.read.format("xml").option("rowTag", ...)``, then
    joined to the broadcast region PARQUET table — a cross-format
    star join. The oracle computes from the original parquet alone,
    so the XML render → infer-schema → read path must be lossless."""
    import os
    import tempfile
    from xml.sax.saxutils import escape

    n = load_table(spark, sf_dir, "nation")
    rows = n.select("n_nationkey", "n_name", "n_regionkey").collect()
    doc = ["<nations>"]
    for r in sorted(rows, key=lambda r: r.n_nationkey):
        doc.append(
            f"<nation><n_nationkey>{r.n_nationkey}</n_nationkey>"
            f"<n_name>{escape(r.n_name)}</n_name>"
            f"<n_regionkey>{r.n_regionkey}</n_regionkey></nation>"
        )
    doc.append("</nations>")
    # Per-process private dir, memoized per sf_dir: a fixed shared
    # path would silently union stale/concurrent files from other
    # runs into the read; a fresh mkdtemp per CALL would leak one
    # directory per sweep pass on a long-lived VM. One dir per
    # (process, sf_dir), its single file overwritten in place.
    xml_dir = _XML_SOURCE_DIRS.get(sf_dir)
    if xml_dir is None:
        xml_dir = _XML_SOURCE_DIRS[sf_dir] = tempfile.mkdtemp(prefix="epe_xml_source_")
    with open(os.path.join(xml_dir, "nation.xml"), "w") as f:
        f.write("".join(doc))

    nx = spark.read.format("xml").option("rowTag", "nation").load(xml_dir)
    r = load_table(spark, sf_dir, "region")
    return (
        nx.join(F.broadcast(r), nx.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT s.s_nationkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-treated equi-join (operators.joins.salted_join): the fact
    side's key is salted into 8 sub-keys and the dimension replicated
    8x and broadcast — logically the plain join the oracle runs,
    physically no single hot-key straggler task can exist."""
    from epe_data_wrangling_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, su, "suppkey", n_salts=8)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(dec("l_quantity")).alias("_s"))
        .select("s_nationkey", "n_items", F.col("_s").cast("double").alias("sum_qty"))
    )


@query(
    "agg_count_distinct_exact",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (expand + two-phase aggregate in
    Spark). The exact twin of the HLL sketch below."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_approx_distinct_hll",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers_exact,
           TRUE AS hll_within_3rsd
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd 1%) per group — the
    100 TB path where exact distinct's expand/shuffle is the
    bottleneck (SURVEY §2.5, §4.4). Sketch estimates are
    engine-specific, so the contract hashed against the oracle is:
    exact columns value-checked, plus an in-query assertion that the
    HLL estimate lands within 3·rsd of the exact count (the oracle
    pins that flag to TRUE — an out-of-bounds sketch turns the row
    red instead of being silently unvalidated)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers_exact"),
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("_approx"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "n_customers_exact",
            (
                F.abs(F.col("_approx") - F.col("n_customers_exact"))
                <= F.lit(3 * 0.01) * F.col("n_customers_exact")
            ).alias("hll_within_3rsd"),
        )
    )


@query(
    "agg_percentiles_priority",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.95) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark percentile ==
    DuckDB quantile_cont, both linear-interpolation). At 100 TB the
    same call swaps to approx_percentile (t-digest) — rows-only like
    the HLL query, for the same reason."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )


@query(
    "agg_approx_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50_exact,
           TRUE AS approx_within_band
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna / t-digest-style sketch,
    accuracy 1000) — the 100 TB path where exact percentile's full
    sort-per-group is the bottleneck. Same checkable contract as the
    HLL query: the exact p50 is value-checked, and an in-query flag
    asserts the sketch lands within 2% of it (oracle pins TRUE), so
    sketch drift turns the row red instead of going unvalidated."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50_exact"),
            F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000)).alias("_p50a"),
        )
        .select(
            "o_orderpriority",
            "p50_exact",
            (
                F.abs(F.col("_p50a") - F.col("p50_exact"))
                <= F.lit(0.02) * F.abs(F.col("p50_exact"))
            ).alias("approx_within_band"),
        )
    )


#: TPC-H Q6 shape, written once in engine-neutral SQL: Spark executes
#: this very string via spark.sql over registered views, and the
#: driver hands the SAME string to DuckDB — the pure-SQL entry point
#: of the engine (decimal staging keeps the sum order-free).
_Q6_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("sql_q6_forecast_revenue", oracle=_Q6_SQL)
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 through the SQL surface: one engine-neutral SQL string
    is both the Spark plan (spark.sql over temp views) and the DuckDB
    oracle — parser/analyzer parity by construction."""
    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SQL)


@query(
    "setop_exceptall_multiset",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 10
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def setop_exceptall_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (exceptAll — duplicates preserved by
    count), the bag-semantics counterpart of the distinct set ops."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 10).select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.exceptAll(b)


@query(
    "setop_intersectall_multiset",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def setop_intersectall_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (intersectAll — duplicates kept by min
    count), completing the set-op family alongside EXCEPT ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 40).select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(b)


@query(
    "date_series_calendar",
    oracle="""
    SELECT CAST(d AS DATE) AS day,
           CAST(EXTRACT(isodow FROM d) AS INTEGER) AS dow,
           CAST(EXTRACT(week FROM d) AS INTEGER) AS iso_week
    FROM generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY) t(d)
    """,
)
def date_series_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generation: sequence() + explode — the
    date-spine idiom for as-of joins and gap-filling (a generated
    dimension, no source scan at all)."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("1995-03-31").cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("day")
        )
        .select(
            "day",
            F.dayofweek("day").alias("_dow_sun1"),
            F.weekofyear("day").alias("iso_week"),
        )
        .select(
            "day",
            # ISO day-of-week (Mon=1..Sun=7) from Spark's Sun=1 form
            F.when(F.col("_dow_sun1") == 1, 7).otherwise(F.col("_dow_sun1") - 1).alias("dow"),
            "iso_week",
        )
    )


@query(
    "join_asof_last_error",
    oracle="""
    WITH r AS (
      SELECT user_id, ts AS err_ts,
             MAX(value) AS err_value
      FROM events WHERE event_type = 'error'
      GROUP BY user_id, ts)
    SELECT e.event_id, e.user_id, e.ts,
           r.err_ts AS asof_err_ts, r.err_value AS asof_err_value
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.err_ts
    """,
)
def join_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.joins.asof_join_backward): every event
    enriched with the user's most recent error event at-or-before it.
    Spark has no native as-of operator; the union+window form costs
    one key shuffle (vs the quadratic naive range join). DuckDB's
    native ASOF JOIN is the oracle. Right side pre-aggregated to
    unique (user, ts) so ties are well-defined on both engines."""
    from epe_data_wrangling_spark.operators.joins import asof_join_backward

    e = load_table(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "ts")
    right = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts").alias("err_ts"))
        .agg(F.max("value").alias("err_value"))
    )
    return asof_join_backward(
        left, right,
        on="user_id", left_ts="ts", right_ts="err_ts",
        value_cols=["err_ts", "err_value"],
    ).select(
        "event_id", "user_id", "ts",
        F.col("asof_err_ts").alias("asof_err_ts"),
        F.col("asof_err_value").alias("asof_err_value"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (tratamento_epe.R has no joins at all; this is engine
    surface per SURVEY §2.4): EXISTS correlated subquery expressed as a
    left-semi join — the semi side deduplicates on the build key so the
    probe never multiplies rows, and Catalyst plans a shuffled semi-hash
    at fact scale (no broadcast: lineitem is the big side)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
        )
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue top-20 — fact join +
    broadcast dims + grouped decimal sum + deterministic top-k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    rev = F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional-count pivot (CASE-in-SUM) —
    grouped by l_returnflag since the synthetic lineitem carries no
    shipmode column. The filter on the fact side is pushed below the
    join so the shuffle only carries one year of lineitem."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END)
           / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS DOUBLE) AS promo_share_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= DATE '1995-03-01' AND l_shipdate < DATE '1995-04-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional decimal sums
    (exact, order-free) with one final double division so both
    engines compute the identical quotient."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(dec(F.lit(0.0)))
    return (
        li.filter((F.col("l_shipdate") >= "1995-03-01") & (F.col("l_shipdate") < "1995-04-01"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(disc)).cast("double").alias("promo_share_pct")
        )
    )


@query(
    "q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer distribution — a left
    outer join whose NULL probe rows must survive into COUNT(col)=0,
    then a second (tiny-key) aggregation. The first agg shuffles on
    c_custkey; the second is near-free (≤ max order count keys)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
                                           AS DOUBLE) / COUNT(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into a grouped aggregate + equi-join — the idiomatic
    Spark rewrite. The per-part avg table is part-cardinality small,
    so it broadcasts; lineitem is scanned once per side but never
    joined to itself row-to-row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    part_avg = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg.withColumnRenamed("l_partkey", "pa_partkey"),
              F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-over-grouped-HAVING as a left-semi join
    against an aggregated key set, then the 3-table rollup. The
    qualifying-key set is tiny after HAVING, so it broadcasts into the
    semi join and prunes lineitem before the wide join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big).withColumnRenamed("l_orderkey", "big_key"),
               F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q22_idle_balance",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                                / COUNT(*)
                         FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= DATE '1999-01-01')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global mean as
    exact decimal sum / count, one double division so both engines
    agree bit-for-bit) cross-joined as a 1-row broadcast threshold,
    plus NOT EXISTS as a left-anti join on orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "agg_stat_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: sample stddev/variance,
    Pearson correlation, sample covariance — all single-pass
    partial-aggregatable moments (Spark merges per-partition moment
    sketches, so the shuffle carries O(groups) state at any scale).
    Rounded to absorb last-ulp differences in merge order."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) + 2 * GROUPING(o_orderstatus) AS gid,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond the cube/rollup queries): detail,
    per-priority subtotal, and grand total in one pass, with a
    grouping-bit marker disambiguating real NULLs from subtotal rows.
    Spark expands sets into one Expand node feeding a single hash
    aggregate — one shuffle for all three granularities."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            (F.grouping("o_orderpriority") + F.lit(2) * F.grouping("o_orderstatus"))
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


@query(
    "fuzzy_name_levenshtein",
    oracle="""
    SELECT c.c_custkey, s.s_suppkey,
           levenshtein(c.c_name, s.s_name) AS edit_dist
    FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
    WHERE c.c_custkey <= 200
    ORDER BY edit_dist, c.c_custkey, s.s_suppkey
    LIMIT 50
    """,
)
def fuzzy_name_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: Levenshtein edit distance over a
    co-partitioned (same-nation) candidate join — the blocked-join
    shape that keeps pairwise string comparison tractable at scale
    (compare within blocking key, never all-pairs). Deterministic
    top-50 with full tie-break."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(s), F.col("c_nationkey") == F.col("s_nationkey"))
        .select(
            "c_custkey",
            "s_suppkey",
            F.levenshtein("c_name", "s_name").alias("edit_dist"),
        )
        .orderBy("edit_dist", "c_custkey", "s_suppkey")
        .limit(50)
    )


# ---------------------------------------------------------------- advanced TPC-H shapes (r2 tail)


@query(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice, l.l_discount
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations by year — the two-role dimension join (nation joined TWICE
    under different aliases) with a symmetric disjunctive pair filter.
    Both nation dims broadcast; the fact shuffles only for the final
    (nation, nation, year) aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(
                dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            ).alias("_r")
        )
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.col("_r").cast("double").alias("revenue"),
        )
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_orders AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
               AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY')
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                               THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END)
                      AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_orders GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of
    regional volume in a product segment per year — conditional
    aggregation as a ratio of two decimal-staged sums over a 7-table
    star join (every dimension broadcast, fact never shuffles before
    the year rollup)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    vol = dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
            ).alias("_num"),
            F.sum("volume").alias("_den"),
        )
        .select(
            "o_year",
            F.round(F.col("_num").cast("double") / F.col("_den").cast("double"), 6)
            .alias("mkt_share"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the view-then-self-referencing-
    scalar-subquery pattern — quarterly revenue per supplier, keep the
    max. Spark form: the revenue aggregate joined against its own
    1-row MAX (broadcast), no window needed; the revenue subplan is
    computed once per branch over a pushed-down date slice."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
            .cast("double")
            .alias("total_revenue")
        )
        .localCheckpoint(eager=True)  # referenced by both the join and its MAX
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR'd brand/size/quantity branches across the join — the
    query optimizers historically mishandle (no single conjunct
    pushes down). Catalyst extracts the common l_quantity bounds and
    p-side disjunction to each scan; the part side broadcasts."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    br = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40)
        )
    )
    return j.filter(br).agg(
        F.sum(dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q21_sole_supplier",
    oracle="""
    WITH big AS (SELECT l_orderkey FROM lineitem
                 GROUP BY l_orderkey HAVING COUNT(*) >= 1)
    SELECT s.s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM big b WHERE b.l_orderkey = l.l_orderkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l.l_orderkey
                        AND l2.l_suppkey <> l.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (correlated EXISTS / NOT EXISTS): suppliers who
    solely supplied finished orders — an EXISTS (order has
    ≥3 lines) plus a correlated NOT EXISTS (no line from another
    supplier), expressed as a semi join and an anti join against the
    line table (the plan Q21's subqueries decorrelate to). Counts per
    supplier, top 20. The anti join's other-supplier probe is the
    classic self-join-on-fact — keyed on l_orderkey, one shuffle
    reused by both probes."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    big = (
        l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("nl"))
        .filter(F.col("nl") >= 1).select("l_orderkey")
    )
    l2 = l.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    cand = (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(big, "l_orderkey", "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_anti",
        )
    )
    return (
        cand.join(s, cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        # top-20 via orderBy().limit(): TakeOrderedAndProject merges
        # per-partition top-20s on the driver — no single-task global
        # window over the supplier-sized aggregate
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ------------------------------------------------- TPC-H completion (partsupp
# derived). The driver's star schema ships no partsupp table, so the four
# partsupp-dependent shapes (Q2/Q11/Q16/Q20) and Q9 derive the part-supplier
# relation from lineitem itself: ps_availqty = total quantity ever shipped by
# the pair, ps_supplycost = the pair's minimum observed unit price floored to
# whole cents via integer arithmetic (a raw quotient carries >6 true decimal
# digits, where the double→decimal staging cast can disagree across engines by
# one ulp — Spark rounds the double's shortest decimal repr, DuckDB the exact
# binary value; a 2-digit cost keeps every downstream product exactly
# canonicalizable). Same adaptation spirit as q21's EXISTS floor. The derived
# ps aggregate is the SAME subplan text on both sides, so parity holds.

_PS_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS ps_availqty,
             FLOOR(MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) * 100)
               / 100 AS ps_supplycost
      FROM lineitem GROUP BY 1, 2"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem-derived stand-in for TPC-H's partsupp (see above)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.sum(dec("l_quantity")).cast("double").alias("ps_availqty"),
        (
            F.floor(
                F.min(F.col("l_extendedprice").cast("double") / F.col("l_quantity").cast("double"))
                * 100
            )
            / F.lit(100)
        ).alias("ps_supplycost"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    elig AS (
      SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
             ps.ps_supplycost,
             MIN(ps.ps_supplycost) OVER (PARTITION BY p.p_partkey) AS min_cost
      FROM part p
      JOIN ps ON p.p_partkey = ps.ps_partkey
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
    FROM elig WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every STANDARD
    size-15 part, the European supplier(s) quoting the region-minimum
    supply cost — the correlated scalar-MIN subquery, decorrelated the
    way engines plan it: a per-part MIN window over the eligible
    (part × supplier) pairs, then an equality filter. partsupp is
    derived from lineitem (module note above). Dimensions broadcast;
    the only shuffle is the derived-ps aggregation keyed on
    (partkey, suppkey); the window re-partitions by part key only
    after the dims have pruned the pair set."""
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn(
            "min_cost", F.min("ps_supplycost").over(Window.partitionBy("p_partkey"))
        )
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
    )
    return (
        elig.select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - ps.ps_supplycost * l.l_quantity
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INTEGER)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit = revenue minus
    supply cost for every '%bolt%' part, rolled up by supplier nation
    and order year — the 6-way join whose planner challenge is keeping
    the two fact-sized inputs (lineitem and the derived ps) on one
    shuffle key while every dimension broadcasts. The ps join is keyed
    (partkey, suppkey); the per-row profit expression is written with
    the identical operand tree on both engines and decimal-staged
    before the order-free SUM."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    ps = _derived_partsupp(spark, sf_dir)
    profit = dec(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(
            ps,
            (ps.ps_partkey == l.l_partkey) & (ps.ps_suppkey == l.l_suppkey),
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit.alias("_p"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("_p").cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    natps AS (
      SELECT ps.ps_partkey,
             CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,6)) AS val
      FROM ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'),
    byp AS (
      SELECT ps_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
      FROM natps GROUP BY ps_partkey),
    tot AS (SELECT CAST(SUM(val) AS DOUBLE) AS total_value,
                   COUNT(DISTINCT ps_partkey) AS n_parts FROM natps)
    SELECT ps_partkey, part_value
    FROM byp, tot
    WHERE part_value > 2.0 * total_value / n_parts
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part
    inventory value within one nation, keeping parts whose value
    exceeds 2x the nation's mean per-part value (scale-invariant where
    TPC-H's fixed fraction goes empty as the part count grows) — the
    GROUP BY + HAVING against a scalar aggregate over the same
    subplan. The shared
    nation-filtered pair set is localCheckpointed so the per-part and
    total aggregates don't recompute the derived-ps shuffle (Spark
    does not CSE across DataFrame branches); the 1-row total then
    broadcasts into the comparison."""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natps = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            dec(F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
        .localCheckpoint(eager=True)  # feeds both byp and the scalar total
    )
    byp = natps.groupBy("ps_partkey").agg(F.sum("val").cast("double").alias("part_value"))
    tot = natps.agg(
        F.sum("val").cast("double").alias("total_value"),
        F.countDistinct("ps_partkey").alias("n_parts"),
    )
    return (
        byp.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.lit(2.0) * F.col("total_value") / F.col("n_parts"))
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "q16_parts_supplier_cnt",
    oracle=f"""
    WITH ps AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers can provide each surviving (brand, type, size)
    bucket, excluding a brand, a type family, and blacklisted
    suppliers (adapted: negative account balance stands in for the
    complaint-comment scan — the schema ships no s_comment). The
    NOT IN decorrelates to a broadcast anti join; COUNT(DISTINCT)
    shuffles only (group keys, suppkey) pairs after the part dim
    broadcast-prunes the pair set."""
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_promotion_suppliers",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    q95 AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty95
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN q95 ON ps.ps_partkey = q95.l_partkey AND ps.ps_suppkey = q95.l_suppkey
      JOIN part p ON p.p_partkey = ps.ps_partkey
      WHERE p.p_name LIKE 'small%' AND ps.ps_availqty > 1.8 * q95.qty95)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (SELECT ps_suppkey FROM excess)
    ORDER BY s.s_name
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation whose standing quantity of 'small%' parts exceeds 1.8× what
    they shipped of the part in 1995 (adapted threshold: the derived
    ps_availqty is all-time quantity, a superset of the year slice, so
    the factor is >1 to stay selective) — the nested IN-chain that
    decorrelates to two semi joins. Both fact-sized aggregates share
    the (partkey, suppkey) shuffle key; the part filter broadcasts;
    the final supplier probe is a broadcast semi join on the distinct
    excess-supplier set."""
    ps = _derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    q95 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("qty95"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    excess = (
        ps.join(
            q95,
            (ps.ps_partkey == q95.l_partkey) & (ps.ps_suppkey == q95.l_suppkey),
        )
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .filter(F.col("ps_availqty") > F.lit(1.8) * F.col("qty95"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(excess), s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "agg_exact_median_distributed",
    oracle="""
    WITH r AS (SELECT o_totalprice,
                      row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                        AS rn,
                      COUNT(*) OVER () AS n
               FROM orders)
    SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
           AVG(o_totalprice) AS median_price
    FROM r WHERE rn IN ((n + 1) // 2, n // 2 + 1)
    """,
)
def agg_exact_median_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median without a global sort — the distributed
    selection the approx_percentile queries explicitly trade away:
    operators.windows.global_row_number assigns exact ranks (range
    shards + per-shard row_number + broadcast offsets), then the one
    or two middle ranks are filtered out and averaged. Total cost is
    two scans plus one partitioned sort — no single-task WindowExec,
    no full-data sort — where a naive exact median plans
    ORDER BY over everything. The oracle computes the same middle-rank
    average with DuckDB's (single-node, legitimately global) window;
    AVG over the ≤2 middle values is the same (a+b)/2 double on both
    engines. Generalizes to any exact quantile set (the ranks are free
    once assigned)."""
    from epe_data_wrangling_spark.operators.windows import global_row_number

    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked, total = global_row_number(
        o, F.col("o_totalprice"), "o_orderkey", out="rn"
    )
    lo, hi = (total + 1) // 2, total // 2 + 1
    return ranked.filter(F.col("rn").isin(lo, hi)).agg(
        F.lit(total).cast("bigint").alias("n_orders"),
        F.avg("o_totalprice").alias("median_price"),
    )


HLL_MERGE_TOL = 0.05  #: acceptance band for the merged-sketch estimate


@query(
    "sketch_hll_mergeable_daily",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
      FROM events GROUP BY date_trunc('month', ts))
    SELECT month, n_days, n_users_exact, TRUE AS merged_within_tol
    FROM m
    """,
)
def sketch_hll_mergeable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    Spark 4's hll_sketch_agg / hll_union_agg): one compact sketch per
    DAY, merged per month — the incremental-view-maintenance pattern
    for COUNT(DISTINCT) at 100 TB, where daily sketches are stored
    once (KBs each) and ANY date-range distinct estimate is a
    register-wise union of stored sketches, never a rescan of raw
    events (unlike approx_count_distinct, whose result can't be
    merged after the fact). HLL union is commutative/associative, so
    the merged estimate is deterministic regardless of merge order;
    the hashed contract mirrors agg_approx_distinct_hll: exact
    columns value-checked, plus an in-query assertion that the merged
    estimate lands within {HLL_MERGE_TOL:.0%} of the exact count
    (oracle pins TRUE — an out-of-band sketch turns the row red)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(F.col("ts"), F.col("user_id"))
        .groupBy(
            F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    monthly = daily.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = (
        e.groupBy(F.date_trunc("month", F.col("ts")).cast("date").alias("month"))
        .agg(F.countDistinct("user_id").alias("n_users_exact"))
    )
    return (
        monthly.join(exact, "month")
        .select(
            "month",
            "n_days",
            "n_users_exact",
            (
                F.abs(F.col("_est") - F.col("n_users_exact"))
                <= F.lit(HLL_MERGE_TOL) * F.col("n_users_exact")
            ).alias("merged_within_tol"),
        )
    )


@query(
    "sketch_theta_audience_overlap",
    oracle="""
    WITH s AS (SELECT event_type, user_id
               FROM events WHERE event_type IN ('view', 'purchase')),
    v AS (SELECT DISTINCT user_id FROM s WHERE event_type = 'view'),
    p AS (SELECT DISTINCT user_id FROM s WHERE event_type = 'purchase')
    SELECT
      CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
      CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
      CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v
            UNION SELECT user_id FROM p) u) AS BIGINT) AS n_union,
      CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v
            INTERSECT SELECT user_id FROM p) i) AS BIGINT) AS n_both,
      CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v
            EXCEPT SELECT user_id FROM p) d) AS BIGINT) AS n_view_only
    """,
)
def sketch_theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches via Spark 4's
    theta_sketch_agg / theta_union / theta_intersection /
    theta_difference) — the SET-OPERATION sketch the HLL family
    can't do: audience overlap between viewers and purchasers from
    two per-segment sketches, no re-scan, no exact distinct shuffle.
    At 100 TB the per-segment sketches are stored KB-sized artifacts
    and any overlap/union/difference question is answered from them
    alone — the audience-intersection pattern of every analytics
    store. The test corpus's cardinality sits below the sketch's
    nominal k, where theta estimates are EXACT, so the oracle pins
    the true set-algebra counts (a sketch regression turns the row
    red rather than drifting silently)."""
    e = load_table(spark, sf_dir, "events")
    sk = (
        e.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    v = sk.filter(F.col("event_type") == "view").select(F.col("sk").alias("sv"))
    p = sk.filter(F.col("event_type") == "purchase").select(F.col("sk").alias("sp"))
    return v.crossJoin(p).selectExpr(
        "CAST(theta_sketch_estimate(sv) AS BIGINT) AS n_view",
        "CAST(theta_sketch_estimate(sp) AS BIGINT) AS n_purchase",
        "CAST(theta_sketch_estimate(theta_union(sv, sp)) AS BIGINT) AS n_union",
        "CAST(theta_sketch_estimate(theta_intersection(sv, sp)) AS BIGINT) AS n_both",
        "CAST(theta_sketch_estimate(theta_difference(sv, sp)) AS BIGINT) AS n_view_only",
    )


KLL_RANK_TOL = 0.05  #: KLL k=200 normalized rank error ≈ 1.65%; 3σ margin


@query(
    "sketch_kll_quantiles_daily",
    oracle=f"""
    WITH day AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(o_orderdate AS DATE) AS d, o_totalprice
      FROM orders),
    m AS (
      SELECT month,
             CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             quantile_disc(o_totalprice, 0.5) AS p50_exact,
             quantile_disc(o_totalprice, 0.9) AS p90_exact
      FROM day GROUP BY month)
    SELECT month, n_days, n_orders,
           round(p50_exact, 2) AS p50_exact, round(p90_exact, 2) AS p90_exact,
           TRUE AS p50_within_tol, TRUE AS p90_within_tol
    FROM m
    """,
)
def sketch_kll_quantiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketches (DataSketches KLL via Spark 4's
    kll_sketch_agg_double / kll_merge_agg_double): one compact sketch
    per DAY of order totals, merged per month — the quantile twin of
    sketch_hll_mergeable_daily: stored daily sketches answer any
    date-range percentile without rescanning raw orders. KLL
    compaction is RANDOMIZED (estimates vary run to run), so the
    hashed contract follows the repo's sketch idiom: exact columns
    value-checked, plus in-query assertions that each merged
    estimate's true RANK lands within {KLL_RANK_TOL:.0%} (+ the 1/n
    discreteness allowance) of its target (the sketch's guarantee is on rank, not value — asserting
    value closeness would be wrong on heavy-tailed data). Oracle
    pins TRUE; a broken merge turns the row red."""
    o = load_table(spark, sf_dir, "orders")
    day = o.select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    daily = day.groupBy("month", "d").agg(
        F.expr("kll_sketch_agg_double(v)").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    monthly = daily.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("n_orders"),
        F.expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)").alias("_p50"),
        F.expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.9)").alias("_p90"),
    )
    j = monthly.join(day.alias("dd"), "month")
    # true rank of each estimate = share of the month's values ≤ estimate
    ranks = (
        j.groupBy("month", "n_days", "n_orders", "_p50", "_p90")
        .agg(
            (F.sum(F.when(F.col("v") <= F.col("_p50"), 1).otherwise(0))
             / F.count(F.lit(1)).cast("double")).alias("r50"),
            (F.sum(F.when(F.col("v") <= F.col("_p90"), 1).otherwise(0))
             / F.count(F.lit(1)).cast("double")).alias("r90"),
        )
    )
    # exact percentile columns rendered like the oracle's quantile_disc:
    # use the discrete percentile (exact value from the data) for output
    exact_disc = day.groupBy("month").agg(
        F.expr("percentile_approx(v, 0.5, 2147483647)").alias("p50d"),
        F.expr("percentile_approx(v, 0.9, 2147483647)").alias("p90d"),
    )
    return (
        ranks.join(exact_disc, "month")
        .select(
            "month",
            "n_days",
            "n_orders",
            F.round("p50d", 2).alias("p50_exact"),
            F.round("p90d", 2).alias("p90_exact"),
            # + 1/n: with n values the achievable ranks are i/n, so a
            # month of 2 orders can only realize rank 0.5 or 1.0
            (
                F.abs(F.col("r50") - 0.5)
                <= KLL_RANK_TOL + 1.0 / F.col("n_orders").cast("double")
            ).alias("p50_within_tol"),
            (
                F.abs(F.col("r90") - 0.9)
                <= KLL_RANK_TOL + 1.0 / F.col("n_orders").cast("double")
            ).alias("p90_within_tol"),
        )
    )


@query(
    "pandas_api_groupby_orders",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def pandas_api_groupby_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas API on Spark (``pyspark.pandas``) as certified
    MIGRATION surface: a pandas-shaped groupby/agg over the orders
    table compiles to the same Catalyst plan a DataFrame aggregate
    would (distributed partial+final hash agg — no driver
    materialization), converted back via ``to_spark()`` and
    hash-checked like any other query. The measure is staged to an
    integer column BEFORE the sum (×1e6, exactly representable for
    2-dp money) so the aggregate is order-free on both engines —
    the repo's decimal-staging rule expressed pandas-style."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    pdf = o.pandas_api()
    pdf["staged"] = (pdf["o_totalprice"] * 1_000_000).round(0).astype("int64")
    g = (
        pdf.groupby("o_orderstatus")
        .agg(n_orders=("o_orderkey", "count"), staged_sum=("staged", "sum"))
        .reset_index()
    )
    out = g.to_spark()
    return out.select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.col("staged_sum").cast("double") / F.lit(1e6)).alias("total_price"),
    )


@query(
    "udtf_month_spine_revenue",
    oracle="""
    WITH spine AS (
      SELECT r.r_name, CAST(gs.ms AS DATE) AS month_start
      FROM region r,
           LATERAL (SELECT unnest(generate_series(DATE '1997-01-01',
                                                  DATE '1997-12-01',
                                                  INTERVAL 1 MONTH)) AS ms) gs),
    rev AS (
      SELECT n.n_regionkey,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS ms,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= DATE '1997-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
      GROUP BY n.n_regionkey, date_trunc('month', o.o_orderdate))
    SELECT s.r_name, s.month_start,
           COALESCE(v.n_orders, 0) AS n_orders,
           COALESCE(v.revenue, 0.0) AS revenue
    FROM spine s
    LEFT JOIN region r2 ON s.r_name = r2.r_name
    LEFT JOIN rev v ON v.n_regionkey = r2.r_regionkey
                   AND v.ms = s.month_start
    """,
)
def udtf_month_spine_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python USER-DEFINED TABLE FUNCTION (Spark 4's @udtf API) driven
    through SQL LATERAL: a month-spine generator UDTF expands each
    region row into twelve 1997 month rows (the gap-filling spine
    idiom — zero-revenue months must exist in the report), left-joined
    to per-region monthly revenue. The UDTF runs ONLY against the
    5-row region dimension — generators and dimension expanders are
    the legitimate UDTF lane under the repo's no-Python-on-data-path
    rule (the fact-table side is pure Catalyst); the oracle replaces
    the UDTF with generate_series and must agree exactly."""
    from pyspark.sql.functions import udtf

    from epe_data_wrangling_spark.sources.tables import register_views

    @udtf(returnType="month_start date")
    class MonthSpine:
        def eval(self, start: str, n: int):
            import datetime

            d = datetime.date.fromisoformat(start)
            for i in range(n):
                y = d.year + (d.month - 1 + i) // 12
                m = (d.month - 1 + i) % 12 + 1
                yield (datetime.date(y, m, 1),)

    spark.udtf.register("month_spine", MonthSpine)
    register_views(spark, sf_dir, "region", "nation", "customer", "orders")
    return spark.sql("""
      WITH spine AS (
        SELECT r.r_name, r.r_regionkey, s.month_start
        FROM region r, LATERAL month_spine('1997-01-01', 12) s),
      rev AS (
        SELECT n.n_regionkey,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS ms,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= DATE '1997-01-01'
          AND o.o_orderdate < DATE '1998-01-01'
        GROUP BY n.n_regionkey, date_trunc('month', o.o_orderdate))
      SELECT s.r_name, s.month_start,
             COALESCE(v.n_orders, 0) AS n_orders,
             COALESCE(v.revenue, 0.0) AS revenue
      FROM spine s
      LEFT JOIN rev v ON v.n_regionkey = s.r_regionkey
                     AND v.ms = s.month_start
    """)


@query(
    "sql_parameterized_revenue",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-03-01' AND l_quantity >= 25
    GROUP BY l_returnflag
    """,
)
def sql_parameterized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL (Spark 3.4+ named parameter markers): the
    plan is built from a SQL template plus a typed args dict — the
    injection-safe binding surface an application layer needs (values
    are bound as literals by the parser, never string-spliced). The
    oracle inlines the same constants; results must match exactly."""
    import datetime

    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= :cutoff AND l_quantity >= :min_qty
        GROUP BY l_returnflag
        """,
        args={"cutoff": datetime.date(1996, 3, 1), "min_qty": 25},
    )


@query(
    "agg_newer_builtins",
    oracle="""
    WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
               FROM orders GROUP BY 1, 2),
    mx AS (SELECT c.o_orderstatus, MIN(c.o_orderpriority) AS mode_priority
           FROM c JOIN (SELECT o_orderstatus, MAX(n) AS m FROM c GROUP BY 1) t
             ON c.o_orderstatus = t.o_orderstatus AND c.n = t.m
           GROUP BY c.o_orderstatus),
    base AS (SELECT o_orderstatus,
                    median(o_totalprice) AS med_price,
                    max_by(o_orderkey, o_totalprice) AS max_price_order,
                    min_by(o_orderkey, o_totalprice) AS min_price_order
             FROM orders GROUP BY o_orderstatus)
    SELECT base.o_orderstatus, base.med_price, mx.mode_priority,
           base.max_price_order, base.min_price_order
    FROM base JOIN mx ON base.o_orderstatus = mx.o_orderstatus
    """,
)
def agg_newer_builtins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The newer SQL-standard aggregate surface (Spark 3.4+): exact
    median, DETERMINISTIC mode (the Spark 4 two-arg form
    ``mode(col, true)`` — lowest value wins frequency ties, which the
    oracle mirrors relationally; plain mode() is tie-nondeterministic
    and DID diverge across engines at sf0.001), and the argmax/argmin
    pair max_by/min_by (extreme totals verified unique per group at
    every shipped SF). Subsumes the window-based argmax idiom with a
    plain partial-aggregatable one-pass form — the preferred shape
    at scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.median("o_totalprice").alias("med_price"),
        F.expr("mode(o_orderpriority, true)").alias("mode_priority"),
        F.expr("max_by(o_orderkey, o_totalprice)").alias("max_price_order"),
        F.expr("min_by(o_orderkey, o_totalprice)").alias("min_price_order"),
    )


@query(
    "collation_case_insensitive_groups",
    oracle="""
    WITH v AS (
      SELECT upper(c_mktsegment) AS seg FROM customer
      UNION ALL
      SELECT lower(c_mktsegment) FROM customer
      UNION ALL
      SELECT upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
      FROM customer)
    SELECT MIN(seg) AS rep,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_forms
    FROM v GROUP BY lower(seg)
    """,
)
def collation_case_insensitive_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATIONS (SPARK-46830) as engine surface: grouping
    and DISTINCT under ``COLLATE UTF8_LCASE`` — the engine-level
    case-insensitive semantics that replace the lower()-everywhere
    workaround (and, at scale, let the optimizer keep pushing
    filters/aggregations instead of wrapping every reference in an
    expression). Three case variants of each market segment are
    generated; the collated GROUP BY must fold them into one group
    per segment while COUNT(DISTINCT seg) (binary collation) still
    sees all variants; MIN(seg) is the deterministic representative.
    The oracle expresses the same semantics via lower() — the
    collation IS the thing under test on the Spark side."""
    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "customer")
    return spark.sql("""
      WITH v AS (
        SELECT upper(c_mktsegment) AS seg FROM customer
        UNION ALL
        SELECT lower(c_mktsegment) FROM customer
        UNION ALL
        SELECT upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
        FROM customer)
      SELECT MIN(seg) AS rep,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT seg) AS n_case_forms
      FROM v GROUP BY seg COLLATE UTF8_LCASE
    """)


# ---- Bloom-filter join pre-filtering ----------------------------------

BLOOM_DIM_BRAND = "Brand#12"  #: selective dim predicate (~4% of parts)
JOIN_BLOOM_M = 2048  #: filter bits (33 × 63-bit words)
JOIN_BLOOM_K = 3  #: hash functions


def _bloom_oracle() -> str:
    from epe_data_wrangling_spark.catalog import ducksql as D

    m, k = JOIN_BLOOM_M, JOIN_BLOOM_K

    def h(j: int, key: str) -> str:
        md5 = "md5('bloom" + str(j) + "|' || CAST(" + key + " AS VARCHAR))"
        return f"({D.hex_int(md5, 1, 8)} % {m})"

    # 63-bit words (see operators.joins._bloom_word_mask_sql: bit 63
    # of a signed BIGINT is a checked overflow under DuckDB's <<)
    ent = "\n      UNION ALL ".join(
        f"SELECT ({h(j, 'p_partkey')} // 63) AS w, "
        f"(CAST(1 AS BIGINT) << ({h(j, 'p_partkey')} % 63)) AS m FROM dim"
        for j in range(k)
    )
    fcols = ", ".join(
        f"({h(j, 'l_partkey')} // 63) AS w{j}, "
        f"(CAST(1 AS BIGINT) << ({h(j, 'l_partkey')} % 63)) AS m{j}"
        for j in range(k)
    )
    joins = " ".join(f"LEFT JOIN bits b{j} ON b{j}.w = f.w{j}" for j in range(k))
    passes = " AND ".join(f"(COALESCE(b{j}.m, 0) & f.m{j}) <> 0" for j in range(k))
    return f"""
    WITH dim AS (SELECT p_partkey FROM part WHERE p_brand = '{BLOOM_DIM_BRAND}'),
    ent AS ({ent}),
    bits AS (SELECT w, bit_or(m) AS m FROM ent GROUP BY w),
    f AS (SELECT l_partkey, l_extendedprice, l_discount, {fcols} FROM lineitem),
    fb AS (SELECT f.l_partkey, f.l_extendedprice, f.l_discount,
                  ({passes}) AS bp
           FROM f {joins}),
    j AS (SELECT fb.*, d.p_partkey AS pk
          FROM fb LEFT JOIN dim d ON fb.l_partkey = d.p_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
           CAST(SUM(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(COUNT(pk) AS BIGINT) AS n_true_match,
           CAST(SUM(CASE WHEN bp THEN 1 ELSE 0 END) - COUNT(pk) AS BIGINT)
             AS n_false_pass,
           CAST(SUM(CASE WHEN pk IS NOT NULL
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                    END) AS DOUBLE) AS revenue_matched
    FROM j
    """


@query("join_bloom_prefilter", oracle=_bloom_oracle(), headline=True)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pre-filtering (the RUNTIME FILTER pattern,
    operators.joins.bloom_build/bloom_flag_fact): the keys of a
    selective dimension subset (p_brand = '{BLOOM_DIM_BRAND}') are
    fingerprinted into a {JOIN_BLOOM_M}-bit / {JOIN_BLOOM_K}-hash
    Bloom filter — built by a bit_or aggregate that shuffles ≤ 33
    words no matter how large the dim is — then broadcast as ONE map
    value and evaluated as a pure map-side expression over the fact
    scan. At 100 TB this prunes fact rows BEFORE the join shuffle
    when the dim is too big to broadcast as rows but its key
    fingerprint fits in kilobytes (what Spark's InjectRuntimeFilter
    does when stats allow; this is the explicit, stats-independent
    form). Correctness never depends on the filter: no false
    negatives by construction, false positives re-checked by the
    real join. The query certifies the whole mechanism CROSS-ENGINE:
    the md5-derived bit pattern, the no-false-negative invariant
    (n_bloom_pass ≥ n_true_match with equality of matched revenue),
    and the measured false-positive count, all hash-checked against
    DuckDB building the identical filter."""
    from epe_data_wrangling_spark.operators.joins import bloom_flag_fact

    part = load_table(spark, sf_dir, "part")
    dim = part.filter(F.col("p_brand") == BLOOM_DIM_BRAND).select("p_partkey")
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    flagged = bloom_flag_fact(
        fact, dim, dim_key="p_partkey", fact_key="l_partkey",
        m_bits=JOIN_BLOOM_M, k=JOIN_BLOOM_K,
    )
    joined = flagged.join(
        F.broadcast(dim), flagged.l_partkey == dim.p_partkey, "left"
    )
    n_pass = F.sum(F.col("_bloom_pass").cast("bigint"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_fact"),
        n_pass.alias("n_bloom_pass"),
        F.count("p_partkey").alias("n_true_match"),
        (n_pass - F.count("p_partkey")).alias("n_false_pass"),
        F.sum(
            F.when(
                F.col("p_partkey").isNotNull(),
                dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))),
            )
        ).cast("double").alias("revenue_matched"),
    )


# ---- SQL scripting (procedural SQL) -----------------------------------

BISECT_ITERS = 24  #: halvings of the 2^20 bracket → ~0.06 currency units
BISECT_HI = 1048576.0  #: 2^20, above any o_totalprice; exact-binary bracket
BISECT_SHARE = 0.1  #: find the threshold with this share of orders above


def _bisect_oracle() -> str:
    steps = [
        "tgt AS (SELECT CAST(FLOOR(COUNT(*) * {s}) AS BIGINT) AS t FROM orders)".format(
            s=BISECT_SHARE
        ),
        f"s0 AS (SELECT CAST(0.0 AS DOUBLE) AS lo, CAST({BISECT_HI} AS DOUBLE) AS hi)",
    ]
    for i in range(BISECT_ITERS):
        # the probe count computes ONCE per step in the inner select;
        # both CASE branches read it
        steps.append(
            f"""s{i + 1} AS (
      SELECT CASE WHEN cnt > t THEN mid ELSE lo END AS lo,
             CASE WHEN cnt > t THEN hi ELSE mid END AS hi
      FROM (SELECT s{i}.lo, s{i}.hi, (s{i}.lo + s{i}.hi) / 2 AS mid,
                   (SELECT COUNT(*) FROM orders
                    WHERE o_totalprice > (s{i}.lo + s{i}.hi) / 2) AS cnt,
                   tgt.t
            FROM s{i} CROSS JOIN tgt))"""
        )
    chain = ",\n    ".join(steps)
    last = f"s{BISECT_ITERS}"
    return f"""
    WITH {chain}
    SELECT round({last}.hi, 6) AS threshold,
           tgt.t AS target_count,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_totalprice > {last}.hi) AS n_above,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders
    FROM {last} CROSS JOIN tgt
    """


@query("sql_scripting_bisect_threshold", oracle=_bisect_oracle())
def sql_scripting_bisect_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (SPARK-48338: BEGIN…END compound
    statements, DECLAREd session variables, WHILE/IF control flow) as
    engine surface — a procedural convergence loop written entirely
    in SQL: bisect the order-value threshold whose exceedance share
    is {BISECT_SHARE} ({BISECT_ITERS} halvings of an exact-binary
    [0, 2^20] bracket, so every midpoint is exactly representable
    and both engines walk bit-identical brackets). Each iteration's
    probe is a FULL Catalyst query (count over a pushed-down
    predicate scan) and the loop state is O(1) scalars in SQL
    variables — the driver-free shape of backfill/convergence jobs
    at 100 TB, where per-iteration work is a distributed scan and
    the only driver traffic is the loop scalar. The oracle unrolls
    the same {BISECT_ITERS} steps as chained CTEs. (Exact quantiles
    do this in one pass — see agg_exact_median_distributed; the
    subject here is the scripting control flow, certified by the
    bracket landing on the same value cross-engine.)"""
    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "orders")
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(f"""
        BEGIN
          DECLARE lo DOUBLE = 0.0;
          DECLARE hi DOUBLE = {BISECT_HI};
          DECLARE mid DOUBLE = 0.0;
          DECLARE cnt BIGINT = 0;
          DECLARE tgt BIGINT = 0;
          DECLARE i INT = 0;
          SET tgt = (SELECT CAST(FLOOR(COUNT(*) * {BISECT_SHARE}) AS BIGINT)
                     FROM orders);
          WHILE i < {BISECT_ITERS} DO
            SET mid = (lo + hi) / 2;
            SET cnt = (SELECT COUNT(*) FROM orders WHERE o_totalprice > mid);
            IF cnt > tgt THEN
              SET lo = mid;
            ELSE
              SET hi = mid;
            END IF;
            SET i = i + 1;
          END WHILE;
          SELECT round(hi, 6) AS threshold,
                 tgt AS target_count,
                 (SELECT COUNT(*) FROM orders WHERE o_totalprice > hi) AS n_above,
                 (SELECT COUNT(*) FROM orders) AS n_orders;
        END
        """)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


# --- r6 additions: Spark-4 SQL pipe syntax + approx_top_k sketch ---

_PIPE_REVENUE_SQL = """
    FROM orders
    |> WHERE o_orderdate >= DATE '1995-01-01'
    |> AGGREGATE CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
                 COUNT(*) AS n_orders
       GROUP BY o_orderpriority
    |> WHERE n_orders > 100
"""


@query(
    "sql_pipe_syntax_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 100
    """,
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL PIPE syntax (SPARK-49555, `|>` operators): the
    filter → AGGREGATE...GROUP BY → post-aggregation filter chain
    written as a linear pipeline instead of nested SELECT/HAVING —
    the readability surface SQL-first pipeline users migrate onto.
    The pipe form must compile to EXACTLY the classic plan: the
    DuckDB oracle is the same query in standard GROUP BY/HAVING form,
    and the decimal-staged revenue must hash-match, proving pipe
    operators are sugar over the identical Catalyst aggregate (one
    partial+final pass, pushdown intact), not a second execution
    path."""
    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(_PIPE_REVENUE_SQL)


APPROX_TOPK_K = 64  #: tracked slots — above event_type cardinality


@query(
    "sketch_approx_topk_events",
    oracle=f"""
    SELECT event_type AS item, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def sketch_approx_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``approx_top_k`` frequency sketch (SPARK-52515) over
    the event-type stream, exploded back to (item, n) rows. k
    ({APPROX_TOPK_K}) and the default tracking capacity both exceed
    the column's cardinality, so the sketch's documented exactness
    regime applies and the DuckDB oracle is the plain exact
    group-count — certifying the sketch API end-to-end without
    betting the hash on approximation internals (the boundary-tie
    hazard when k < cardinality: which equal-count item survives slot
    k is engine-internal). The at-scale story is the same as the CM
    sketch: fixed-size state, partial-aggregatable, one shuffle of
    sketch buffers instead of the full key set."""
    e = load_table(spark, sf_dir, "events")
    topk = e.agg(F.expr(f"approx_top_k(event_type, {APPROX_TOPK_K})").alias("tk"))
    return topk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("item"), F.col("s.count").alias("n")
    )


@query(
    "sql_udf_pricing_chain",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000.0)
                         AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
           CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax))
                               * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
             AS sum_charge,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag
    """,
)
def sql_udf_pricing_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (SPARK-46246: ``CREATE FUNCTION … RETURN
    <expr>``) — reusable business logic declared IN SQL and inlined
    by the analyzer into pure Catalyst expressions: ``disc_price``,
    ``with_tax`` (composed one inside the other) and the repo's
    ``stage6`` integer-staging idiom itself as a third UDF. The
    oracle computes the hand-inlined expressions, so the hash match
    proves the UDF chain compiles to the IDENTICAL arithmetic tree
    (same IEEE results) — and the plan keeps whole-stage codegen,
    pushdown, and partial+final aggregation with zero Python workers
    (no BatchEvalPython — asserted in tests/test_plans.py). This is
    the declarative answer to 'users need custom functions without
    leaving the JVM fast path'; at 100 TB it behaves exactly like
    q1_pricing_summary because it IS that plan after inlining."""
    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION with_tax(p DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 + t)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION stage6_udf(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(x * 1000000.0) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(stage6_udf(disc_price(l_extendedprice, l_discount)))
                    AS DOUBLE) / 1000000.0 AS sum_disc_price,
               CAST(SUM(stage6_udf(with_tax(disc_price(l_extendedprice,
                                                       l_discount), l_tax)))
                    AS DOUBLE) / 1000000.0 AS sum_charge,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag
        """
    )


@query(
    "sql_udf_table_month_spine",
    oracle="""
    WITH spine AS (
      SELECT r.r_name, r.r_regionkey, CAST(gs.ms AS DATE) AS month_start
      FROM region r,
           LATERAL (SELECT unnest(generate_series(DATE '1997-01-01',
                                                  DATE '1997-12-01',
                                                  INTERVAL 1 MONTH)) AS ms) gs),
    rev AS (
      SELECT n.n_regionkey,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS ms,
             COUNT(*) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= DATE '1997-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
      GROUP BY n.n_regionkey, date_trunc('month', o.o_orderdate))
    SELECT s.r_name, s.month_start,
           COALESCE(v.n_orders, 0) AS n_orders
    FROM spine s
    LEFT JOIN rev v ON v.n_regionkey = s.r_regionkey
                   AND v.ms = s.month_start
    """,
)
def sql_udf_table_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE function (``CREATE FUNCTION … RETURNS TABLE(…)
    RETURN SELECT …``) — the declarative twin of the Python UDTF in
    ``udtf_month_spine_revenue``: the month-spine generator is pure
    SQL, expanded per region row via LATERAL, so the gap-filling
    spine needs NO Python worker at all (the UDTF lane's remaining
    process cost drops to zero). Left-joined to per-region monthly
    order counts; zero-activity months must surface with 0. The
    oracle swaps the TVF for generate_series and must agree exactly.
    Scale: the TVF touches only the 5-row region dim; the fact-side
    aggregate is the usual pushdown + partial/final shape."""
    from epe_data_wrangling_spark.sources.tables import register_views

    register_views(spark, sf_dir, "region", "nation", "customer", "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION month_spine_sql(start DATE, n INT) "
        "RETURNS TABLE(month_start DATE) "
        "RETURN SELECT explode(sequence(start, add_months(start, n - 1), "
        "interval 1 month))"
    )
    return spark.sql(
        """
        WITH spine AS (
          SELECT r.r_name, r.r_regionkey, ms.month_start
          FROM region r, LATERAL month_spine_sql(DATE '1997-01-01', 12) ms),
        rev AS (
          SELECT n.n_regionkey,
                 CAST(date_trunc('month', o.o_orderdate) AS DATE) AS ms,
                 COUNT(*) AS n_orders
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE o.o_orderdate >= DATE '1997-01-01'
            AND o.o_orderdate < DATE '1998-01-01'
          GROUP BY n.n_regionkey, date_trunc('month', o.o_orderdate))
        SELECT s.r_name, s.month_start,
               COALESCE(v.n_orders, CAST(0 AS BIGINT)) AS n_orders
        FROM spine s
        LEFT JOIN rev v ON v.n_regionkey = s.r_regionkey
                       AND v.ms = s.month_start
        """
    )


_FIXED_WIDTH_DIRS: dict[str, str] = {}

#: Typed fixed-width layout for the supplier extract (the declarative
#: copybook shape; see sources/fixed_width.py for the kind semantics).
FW_SUPPLIER_LAYOUT = (
    _fw.FwField("s_suppkey", 1, 8, "int"),
    _fw.FwField("s_name", 9, 28, "text"),
    _fw.FwField("s_nationkey", 37, 4, "int"),
    _fw.FwField("s_acctbal_cents", 41, 12, "int"),
)
#: Back-compat positional view (column, start, width) used by tests.
FW_LAYOUT = tuple((f.name, f.start, f.width) for f in FW_SUPPLIER_LAYOUT)


@query(
    "fixed_width_source_suppliers",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents_sum
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def fixed_width_source_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-WIDTH text ingest — the mainframe/legacy-extract format
    every enterprise landing zone still receives: the supplier
    dimension is rendered to blank-padded fixed-offset records
    driver-side (dimension-sized; at scale the extract lands in
    object storage and ``spark.read.text`` is already a distributed
    splittable scan), parsed back by the typed declarative layout
    engine (``sources/fixed_width.py`` — generated substring/trim/
    cast expressions, whole-stage codegen; FW_SUPPLIER_LAYOUT is the
    only schema), then joined to the broadcast nation parquet table. Money crosses the text format as
    integer CENTS (no double ever renders to or parses from text —
    the repo's rendering-hazard rule applied to a SOURCE). The
    oracle computes from the original parquet alone, so render →
    parse must be lossless. Staging dir is per-(process, sf_dir),
    overwritten in place — the r6 stale-shared-dir lesson."""
    import os
    import tempfile
    from decimal import ROUND_HALF_UP, Decimal

    s = load_table(spark, sf_dir, "supplier")
    rows = s.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").collect()
    lines = []
    for r in sorted(rows, key=lambda r: r.s_suppkey):
        # half-AWAY-FROM-ZERO on the exact binary double, matching the
        # oracle's DuckDB round(); Python round() is banker's and would
        # be a third rounding engine in the parity chain
        cents = int(
            Decimal(r.s_acctbal * 100).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        lines.append(
            f"{r.s_suppkey:<8d}{r.s_name:<28s}{r.s_nationkey:<4d}{cents:<12d}"
        )
    fw_dir = _FIXED_WIDTH_DIRS.get(sf_dir)
    if fw_dir is None:
        fw_dir = _FIXED_WIDTH_DIRS[sf_dir] = tempfile.mkdtemp(prefix="epe_fw_source_")
    with open(os.path.join(fw_dir, "supplier.fw"), "w") as f:
        f.write("\n".join(lines) + "\n")

    raw = spark.read.text(fw_dir)
    parsed = _fw.fw_parse(raw, FW_SUPPLIER_LAYOUT)
    n = load_table(spark, sf_dir, "nation")
    return (
        parsed.join(F.broadcast(n), parsed.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("s_acctbal_cents").alias("acctbal_cents_sum"),
        )
    )


#: Typed layout for the order-ledger extract: right-justified
#: zero-padded key, yyyyMMdd date, and a SIGNED-OVERPUNCH zoned
#: decimal (PIC S9(9)V99 — 12 bytes, last byte carries digit+sign).
FW_LEDGER_LAYOUT = (
    _fw.FwField("o_orderkey", 1, 12, "int"),
    _fw.FwField("o_orderdate", 13, 8, "date"),
    _fw.FwField("balance_cents", 21, 12, "zoned", scale=2),
    _fw.FwField("o_orderstatus", 33, 1, "text"),
)

_FW_LEDGER_DIRS: dict[str, str] = {}


@query(
    "fixed_width_zoned_order_ledger",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_orderdate, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT)
               * (CASE WHEN o_orderkey % 5 = 0 THEN -1 ELSE 1 END) AS cents
      FROM orders)
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS balance_cents_sum
    FROM src GROUP BY 1, 2
    """,
)
def fixed_width_zoned_order_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width ingest BEYOND the happy path — the copybook shapes
    that make mainframe extracts hostile: a right-justified
    zero-padded key, a yyyyMMdd display date, and a zoned decimal
    whose last byte is a SIGNED OVERPUNCH ('{'/'A'-'I' positive,
    '}'/'J'-'R' negative — EBCDIC zone nibbles surviving ASCII
    transliteration), declared once in FW_LEDGER_LAYOUT and both
    RENDERED and PARSED by generated Catalyst expressions
    (``sources/fixed_width.py``): the extract is written by a
    distributed ``write.text`` (lpad/date_format/translate — no
    driver-side row loop, unlike the dimension-sized supplier
    fixture) and read back via splittable ``spark.read.text`` +
    substring/translate/cast, all whole-stage codegen. Keys ≡0 mod 5
    carry NEGATIVE balances (credits), so overpunch sign decode is
    load-bearing in the sum; the year is extracted from the PARSED
    date, making the date round-trip load-bearing in the grouping.
    The oracle computes from the original parquet alone — render →
    parse must be lossless for every digit, sign, and date. Scale:
    text render and parse are both embarrassingly parallel; the only
    shuffle is the final |years × statuses|-group aggregate."""
    import os
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    signed = cents * F.when(F.col("o_orderkey") % 5 == 0, -1).otherwise(1)
    ledger = o.select(
        "o_orderkey",
        "o_orderdate",
        signed.cast("bigint").alias("balance_cents"),
        "o_orderstatus",
    )
    fw_dir = _FW_LEDGER_DIRS.get(sf_dir)
    if fw_dir is None:
        fw_dir = _FW_LEDGER_DIRS[sf_dir] = tempfile.mkdtemp(prefix="epe_fw_ledger_")
    (
        ledger.select(_fw.fw_render_expr(FW_LEDGER_LAYOUT).alias("value"))
        .write.mode("overwrite")
        .text(fw_dir)
    )

    parsed = _fw.fw_parse(spark.read.text(fw_dir), FW_LEDGER_LAYOUT)
    return (
        parsed.groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("balance_cents").alias("balance_cents_sum"),
        )
    )
