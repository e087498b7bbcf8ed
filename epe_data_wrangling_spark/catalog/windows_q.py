"""Window-function suite: LOCF fill (the reference's only window ops,
W1/W2 — SURVEY §2.6), ranking/top-k-per-group, running aggregates,
lag/lead deltas, and event sessionization (batch form of the
session_window streaming operator).

Scale notes: every window here partitions by a key (user/customer),
so the sort is per-partition-group and parallel — there is no global
sort anywhere. Sessionization via session_window is the same code
path Structured Streaming uses, so the batch oracle check covers the
streaming semantics too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog.core import dec, stage6, unstage6
from epe_data_wrangling_spark.operators.windows import locf
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via row_number (SURVEY §2.7 engine surface).
    Scale: partial top-k per partition would be even cheaper, but the
    windowed form is the general idiom and AQE handles group skew."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


@query(
    "window_running_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           lag(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag over an explicit ROWS frame; decimal staging
    keeps the cumulative sum exact and order-free across engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(frame).cast("double").alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@query(
    "window_locf_events",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM events
    """,
)
def window_locf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF fill-down — the exact Spark form of the reference's
    zoo::na.locf0 (W1/W2, `tratamento_epe.R:100,140`): last non-null
    over an ordered, partitioned window; leading nulls stay null.
    Here 'error' events' values are treated as missing and filled
    from the user's previous event."""
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        locf(v, partition_by=["user_id"], order_by=["ts", "event_id"]).alias("value_filled"),
    )


@query(
    "window_lag_gap_seconds",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS gap_us
    FROM events
    """,
)
def window_lag_gap_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap via lag over microsecond epochs (exact integer
    arithmetic on both engines; no float/timezone ambiguity)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return e.select(
        "event_id", "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 THEN 1
                  WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap using Spark's
    native session_window — the same operator Structured Streaming
    uses for stateful session aggregation (SURVEY §2.11), so this
    batch oracle check also pins the streaming semantics. The DuckDB
    oracle is the classic gaps-and-islands rewrite."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@query(
    "tumbling_window_events",
    headline=True,
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate via F.window — identical
    logical op under readStream+watermark (SURVEY §2.11); batch form
    is oracle-checkable."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(stage6("value")).alias("_s"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            unstage6("_s").alias("sum_value"),
        )
    )


@query(
    "sliding_window_events",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts) - o.off * INTERVAL '30 minutes' AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(round((value) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
    FROM events, (VALUES (0), (1)) o(off)
    GROUP BY 1
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h width, 30m slide): each event lands in
    exactly 2 overlapping windows. Spark's F.window handles the
    replication natively; the oracle replicates via a 2-row offset
    cross join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(stage6("value")).alias("_s"))
        .select(
            F.col("w.start").alias("window_start"),
            "n",
            unstage6("_s").alias("sum_value"),
        )
    )


@query(
    "gap_fill_monthly_spend",
    oracle="""
    WITH m AS (
      SELECT o_custkey % 20 AS bucket, date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend
      FROM orders GROUP BY 1, 2),
    spine AS (
      SELECT b.bucket, mo.month
      FROM (SELECT DISTINCT bucket FROM m) b,
           (SELECT DISTINCT month FROM m) mo),
    j AS (
      SELECT spine.bucket, spine.month, m.spend
      FROM spine LEFT JOIN m ON m.bucket = spine.bucket AND m.month = spine.month)
    SELECT bucket, month,
           last_value(spend IGNORE NULLS) OVER (
             PARTITION BY bucket ORDER BY month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spend_filled
    FROM j
    """,
)
def gap_fill_monthly_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling composition: month spine × key set → outer join
    actuals → LOCF fill-down (the reference's W1/W2 operator doing
    consumer-side work). A bucket's missing months appear with its
    last known value; leading gaps stay null. The spine is the
    global distinct-month set crossed with the key set — a generated
    dimension + one key-partitioned window, no collect, no global
    sort."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            (F.col("o_custkey") % 20).alias("bucket"),
            F.trunc("o_orderdate", "month").alias("month"),
        )
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("spend"))
    )
    spine = m.select("bucket").distinct().crossJoin(m.select("month").distinct())
    j = spine.join(m, ["bucket", "month"], "left")
    return j.select(
        "bucket",
        "month",
        locf("spend", partition_by=["bucket"], order_by=["month"]).alias("spend_filled"),
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS bal_quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume,
           DENSE_RANK() OVER w AS drank
    FROM customer
    WHERE c_acctbal > 9000
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic distribution functions (ntile / percent_rank /
    cume_dist / dense_rank) per market segment — the ranking surface
    SURVEY §2.6 notes the reference lacks but the engine must expose.
    Deterministic: the window orders by (c_acctbal, c_custkey) so no
    ties; rounding to 9 dp absorbs double formatting differences.
    Scale: partitioned by segment, sort is per-group and parallel."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


ROLL_MED_FRAME = 9  #: rows preceding (window = this + current row)


@query(
    "rolling_median_value",
    oracle=f"""
    WITH f AS (SELECT user_id, event_id, ts, value FROM events
               WHERE value IS NOT NULL),
    w AS (SELECT user_id, event_id, ts, value,
                 list(value) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN {ROLL_MED_FRAME} PRECEDING
                                   AND CURRENT ROW) AS win
          FROM f)
    SELECT user_id, event_id, ts, value,
           list_sort(win)[CAST(floor((len(win) + 1) / 2) AS INTEGER)]
             AS rolling_median
    FROM w
    """,
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median (lower-middle of the last {ROLL_MED_FRAME + 1}
    events per user) — the robust rolling statistic mean can't give
    you. Built from collect_list over a rows frame + array_sort +
    positional pick: pure selection, no arithmetic, so cross-engine
    parity is exact by construction. Per-key frames parallelize like
    every other window; frame size bounds the per-row array cost at
    any scale."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLL_MED_FRAME, 0)
    )
    win = F.array_sort(F.collect_list("value").over(w))
    med = F.element_at(win, F.floor((F.size(win) + 1) / 2).cast("int"))
    return e.select(
        "user_id", "event_id", "ts", "value", med.alias("rolling_median")
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           nth_value(event_type, 3) OVER w AS third_type,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window-function surface: first / last / third event
    type per user over the full partition frame (explicit UNBOUNDED
    FOLLOWING — the default frame would silently make last_value mean
    'current row'). One row per user via distinct over the constant-
    per-partition values; one user_id exchange total."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 3).over(w).alias("third_type"),
        F.count(F.lit(1)).over(w).alias("n_events"),
    ).distinct()


@query(
    "revenue_pareto_contribution",
    oracle="""
    WITH r AS (
      SELECT n.n_name,
             CAST(SUM(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name),
    t AS (SELECT n_name, revenue,
                 CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER ()
                      AS DOUBLE) AS total,
                 CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                      OVER (ORDER BY revenue DESC, n_name)
                      AS DOUBLE) AS running
          FROM r)
    SELECT n_name, revenue,
           round(revenue / total, 6) AS share,
           round(running / total, 6) AS cumulative_share,
           running / total <= 0.8 AS in_top80
    FROM t
    """,
)
def revenue_pareto_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / contribution analysis: each nation's revenue share and
    the cumulative share in descending-revenue order (the 80/20 cut
    flagged). Heavy lifting is one partial-aggregated star join down
    to the |nations|-row aggregate; the running sum is then a
    broadcast dominance self-join (sum over rows at-or-before in the
    (revenue DESC, n_name) total order) and the grand total a
    broadcast scalar aggregate — no unpartitioned window anywhere,
    and the |nations|² join is constant-sized at any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
        .localCheckpoint(eager=True)  # |nations| rows; self-join sides reuse
    )
    before = (F.col("b.revenue") > F.col("a.revenue")) | (
        (F.col("b.revenue") == F.col("a.revenue")) & (F.col("b.n_name") <= F.col("a.n_name"))
    )
    run = (
        r.alias("a")
        .join(F.broadcast(r.alias("b")), before)
        .groupBy(F.col("a.n_name").alias("n_name"), F.col("a.revenue").alias("revenue"))
        # decimal-staged so the unordered join-side sum is exact and
        # order-free (a double sum here would differ from the oracle's
        # sequential prefix sum by summation order)
        .agg(F.sum(F.col("b.revenue").cast("decimal(18,2)")).cast("double").alias("running"))
    )
    tot = r.agg(F.sum(F.col("revenue").cast("decimal(18,2)")).cast("double").alias("total"))
    t = run.crossJoin(F.broadcast(tot))
    return t.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.col("total"), 6).alias("share"),
        F.round(F.col("running") / F.col("total"), 6).alias("cumulative_share"),
        (F.col("running") / F.col("total") <= 0.8).alias("in_top80"),
    )


@query(
    "monthly_value_percentile_bands",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           quantile_cont(o_totalprice, 0.10) AS p10,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.90) AS p90
    FROM orders GROUP BY date_trunc('month', o_orderdate)
    """,
)
def monthly_value_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-over-time report: exact P10/P50/P90 of order value
    per month (Spark percentile ≡ DuckDB quantile_cont, both linear
    interpolation — parity proven by agg_percentiles_priority). The
    per-month groups sort independently; the 100 TB swap is
    approx_percentile per the same contract as the approx twin."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("o_totalprice", F.lit(0.10)).alias("p10"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.90)).alias("p90"),
    )


@query(
    "tumbling_distinct_users",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def tumbling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per hourly window (windowed COUNT DISTINCT —
    the unique-visitors metric). Exact two-phase distinct within each
    window; at stream scale the drop-in is approx_count_distinct with
    the HLL query's bound contract."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "seasonality_monthly_revenue",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY date_trunc('month', o_orderdate)),
    w AS (SELECT month, rev,
                 SUM(rev) OVER (ORDER BY month
                                ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
                   AS ma_sum,
                 COUNT(*) OVER (ORDER BY month
                                ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
                   AS ma_n
          FROM m)
    SELECT month, CAST(rev AS DOUBLE) AS revenue,
           round(CAST(ma_sum AS DOUBLE) / ma_n, 6) AS ma12,
           round(CAST(rev AS DOUBLE) - CAST(ma_sum AS DOUBLE) / ma_n, 6)
             AS seasonal_component
    FROM w
    """,
)
def seasonality_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, additive: monthly revenue minus its
    centered 12-month moving average. The frame aggregate runs over
    DECIMAL sums so the moving window is order-free exact (frame
    summation order differs between engines for doubles); the series
    is the already-aggregated month table. The centered 12-month
    moving frame is a broadcast rank-band self-join over the bounded
    month series (rank = count of earlier months, band = ranks within
    [-6, +5]) — exact ROWS-frame semantics, decimal-staged so the
    unordered band sum equals the oracle's sequential one, and no
    unpartitioned window; the |months|×12 join is calendar-bounded at
    any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
        )
        .agg(F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")).alias("rev"))
        .localCheckpoint(eager=True)  # |months| rows; self-join sides reuse
    )
    ranked = (
        m.alias("a")
        .join(F.broadcast(m.alias("b")), F.col("b.month") < F.col("a.month"), "left")
        .groupBy(F.col("a.month").alias("month"), F.col("a.rev").alias("rev"))
        .agg(F.count(F.col("b.month")).alias("rank0"))
        .localCheckpoint(eager=True)
    )
    band = (F.col("b.rank0") >= F.col("a.rank0") - 6) & (
        F.col("b.rank0") <= F.col("a.rank0") + 5
    )
    win = (
        ranked.alias("a")
        .join(F.broadcast(ranked.alias("b")), band)
        .groupBy(F.col("a.month").alias("month"), F.col("a.rev").alias("rev"))
        .agg(F.sum(F.col("b.rev")).alias("ma_sum"), F.count(F.lit(1)).alias("ma_n"))
    )
    ma = F.col("ma_sum").cast("double") / F.col("ma_n")
    return win.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        F.round(ma, 6).alias("ma12"),
        F.round(F.col("rev").cast("double") - ma, 6).alias("seasonal_component"),
    )


EWMA_SPAN = 32  #: frame length (rows) the smoother looks back over
EWMA_DECAY = 0.5  #: per-step decay; 0.5 ⇒ weights are exact powers of two


@query(
    "window_ewma_user_value",
    oracle=f"""
    WITH w AS (
      SELECT user_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING AND CURRENT ROW) AS xs,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    t AS (
      SELECT user_id, value, xs,
             list_transform(generate_series(1, len(xs)),
                            i -> pow({EWMA_DECAY}, CAST(len(xs) - i AS DOUBLE))) AS wts
      FROM w WHERE rn = 1)
    SELECT user_id,
           CAST(len(xs) AS INTEGER) AS n_window,
           list_dot_product(xs, wts) / list_dot_product(wts, list_transform(wts, x -> 1.0)) AS ewma,
           value AS last_value
    FROM t
    """,
)
def window_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's event
    values — the classic streaming smoother, expressed as a bounded
    window frame (last {EWMA_SPAN} rows) so state is O(span) per key.
    Weights use decay {EWMA_DECAY}: exact powers of two, so every
    term x·2^-k is exact dyadic scaling and the two engines' sums are
    bit-identical by construction (no libm-rounding hazard). The
    numerator/denominator are both left-fold dot products (Spark
    ``aggregate`` ≡ DuckDB ``list_dot_product`` — same proven pairing
    as functions.vectors.dot). Emits each user's final smoothed
    level. Scale: per-user partition sort, frame-bounded memory — no
    global sort, no shuffle beyond the keyed exchange; at 100 TB this
    is the same shape as any per-entity sessionization pass."""
    e = load_table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), 0)
    )
    last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    xs = F.col("xs")
    n = F.size(xs)
    wts = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pow(F.lit(EWMA_DECAY), (n - i).cast("double")),
    )
    dot_fold = lambda a, b: F.aggregate(  # noqa: E731 — mirrors list_dot_product
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        e.select(
            "user_id",
            "value",
            F.collect_list("value").over(frame).alias("xs"),
            F.row_number().over(last).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .withColumn("wts", wts)
        .select(
            "user_id",
            n.cast("int").alias("n_window"),
            (
                dot_fold(xs, F.col("wts"))
                / dot_fold(F.col("wts"), F.transform(F.col("wts"), lambda x: F.lit(1.0)))
            ).alias("ewma"),
            F.col("value").alias("last_value"),
        )
    )
