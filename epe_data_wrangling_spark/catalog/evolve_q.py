"""Table-evolution and profiling suite: SCD type-2 history build,
MERGE-style upsert, per-group z-score anomaly flagging, and a
fixed-width histogram.

Scale notes (100 TB posture): SCD2 is per-key windowed (parallel
across keys, no global sort); MERGE is one shuffle-on-key full outer
join (exchange-free against a bucketed target); anomaly stats are a
tiny per-group table broadcast back against the fact scan; the
histogram is a partial-aggregated single pass. Zero Python on any
data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

Z_THRESHOLD = 2.5
HIST_WIDTH = 25000.0
HIST_MAX_BUCKET = 19


@query(
    "scd2_user_history",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    versioned AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS version
      FROM flagged),
    seg AS (
      SELECT user_id, CAST(version AS INTEGER) AS version, event_type,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM versioned GROUP BY user_id, version, event_type)
    SELECT user_id, version, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to,
           n_events,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             IS NULL AS is_current
    FROM seg
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from an event log: per
    user, collapse consecutive runs of the same event_type into
    versioned validity intervals [valid_from, valid_to) with an
    is_current flag — the standard dimension-history derivation
    (change detection via lag, version via running sum of change
    flags, interval close via lead). All windows are partitioned by
    user_id with a deterministic (ts, event_id) order, so the work
    parallelizes across keys with no global sort; 100 TB of events
    needs exactly one shuffle on user_id reused by every window and
    the group-by."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = e.withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    )
    versioned = flagged.withColumn("version", F.sum("chg").over(w).cast("int"))
    seg = versioned.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from").over(w2)
    return seg.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH cents AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders),
    src AS (
      SELECT o_orderkey, floor(c * 105 / 100.0) / 100.0 AS price,
             'R' AS status
      FROM cents WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey + 10000000 AS o_orderkey,
             c / 100.0 AS price, 'N' AS status
      FROM cents WHERE o_orderkey % 997 = 0)
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           COALESCE(s.price, t.o_totalprice) AS o_totalprice,
           COALESCE(s.status, t.o_orderstatus) AS o_orderstatus,
           CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                WHEN s.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS action
    FROM orders t FULL OUTER JOIN src s USING (o_orderkey)
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one declarative plan: a deterministic
    source of updates (keys ≡ 0 mod 11, +5% repriced, status 'R') and
    inserts (fresh keys offset by 10M, status 'N') full-outer-joined
    against the target; matched rows take source values ('update'),
    source-only rows are 'insert', target-only rows are 'keep'. The
    scale shape of upsert/CDC-apply: one shuffle on the merge key —
    against a bucketed target table the exchange disappears on the
    target side, and the output is partition-aligned for write-back."""
    o = load_table(spark, sf_dir, "orders")
    # Reprice in integer cents: round(x*100) is unambiguous (inputs are
    # 2-dp money), and the +5% is integer math — exact on both engines,
    # unlike round(x * 1.05, 2) whose half-digit ties Spark and DuckDB
    # break differently.
    cents = o.withColumn("c", F.round(F.col("o_totalprice") * 100).cast("bigint"))
    updates = cents.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        (F.floor(F.col("c") * 105 / 100.0) / 100.0).alias("price"),
        F.lit("R").alias("status"),
    )
    inserts = cents.filter(F.col("o_orderkey") % 997 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        (F.col("c") / 100.0).alias("price"),
        F.lit("N").alias("status"),
    )
    src = updates.unionByName(inserts)
    t, s = o.alias("t"), src.alias("s")
    return t.join(s, "o_orderkey", "full_outer").select(
        F.coalesce(F.col("t.o_orderkey"), F.col("s.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("s.price"), F.col("t.o_totalprice")).alias("o_totalprice"),
        F.coalesce(F.col("s.status"), F.col("t.o_orderstatus")).alias("o_orderstatus"),
        F.when(F.col("t.o_orderkey").isNull(), "insert")
        .when(F.col("s.price").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


@query(
    "anomaly_zscore_events",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS mean,
             CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*) AS msq
      FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mean) / sqrt(s.msq - s.mean * s.mean), 6)
             AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE e.value IS NOT NULL
      AND abs((e.value - s.mean) / sqrt(s.msq - s.mean * s.mean))
            > {Z_THRESHOLD}
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier flagging (|z| > {Z_THRESHOLD}
    against the population std). Moments are staged as decimal sums of
    6-dp-rounded values so mean/msq are exact and order-free on both
    engines; the z expression is then one shared double tree, so the
    threshold comparison can't flip between engines. Scale shape: the
    stats table is |event_type| rows — broadcast back against the
    fact scan, so the outlier pass is a narrow second scan with no
    fact shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean"),
        (
            F.sum(
                F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("msq"),
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt(
        F.col("msq") - F.col("mean") * F.col("mean")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > Z_THRESHOLD)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("zscore"))
    )


@query(
    "histogram_order_totals",
    oracle=f"""
    SELECT CAST(least(floor(o_totalprice / {HIST_WIDTH}), {HIST_MAX_BUCKET})
                AS INTEGER) AS bucket,
           least(floor(o_totalprice / {HIST_WIDTH}), {HIST_MAX_BUCKET})
             * {HIST_WIDTH} AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY bucket, bucket_lo
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals ({HIST_WIDTH:g}-wide
    buckets, top bucket open-ended at {HIST_MAX_BUCKET}): the
    data-profiling primitive behind range-partition planning and skew
    detection. One partial-aggregated scan; the exchange carries at
    most {HIST_MAX_BUCKET + 1} rows regardless of input size."""
    o = load_table(spark, sf_dir, "orders")
    b = F.least(
        F.floor(F.col("o_totalprice") / HIST_WIDTH), F.lit(HIST_MAX_BUCKET)
    )
    return (
        o.select(
            b.cast("int").alias("bucket"),
            (b * HIST_WIDTH).alias("bucket_lo"),
            "o_totalprice",
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


EPISODE_HOURS = 4
EPISODE_BIN_S = EPISODE_HOURS * 3600


@query(
    "join_interval_episodes",
    oracle=f"""
    WITH err AS (
      SELECT event_id AS episode_id, user_id, ts AS ep_start,
             ts + INTERVAL {EPISODE_HOURS} HOUR AS ep_end
      FROM events WHERE event_type = 'error')
    SELECT e.episode_id, e.ep_start, p.user_id, p.event_id,
           p.event_type, p.ts
    FROM err e JOIN events p
      ON p.user_id = e.user_id
     AND p.ts >= e.ep_start AND p.ts <= e.ep_end
    """,
)
def join_interval_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (point-in-range) join: attach every event falling
    inside a {EPISODE_HOURS}-hour 'error episode' window opened by
    each error event of the same user — incident-context gathering.
    Runs through operators.joins.binned_interval_join: intervals
    explode over the ≤2 time bins they span, the join is an EQUI-join
    on (user_id, bin) refined by the exact BETWEEN — one bounded
    shuffle instead of the per-user cartesian a naive range join
    plans. The oracle states the BETWEEN semantics directly."""
    from epe_data_wrangling_spark.operators.joins import binned_interval_join

    e = load_table(spark, sf_dir, "events")
    episodes = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("episode_id"),
        "user_id",
        F.col("ts").alias("ep_start"),
        (F.col("ts") + F.expr(f"INTERVAL {EPISODE_HOURS} HOURS")).alias("ep_end"),
    )
    points = e.select("user_id", "event_id", "event_type", "ts")
    joined = binned_interval_join(
        points,
        episodes,
        on="user_id",
        point_ts="ts",
        start_ts="ep_start",
        end_ts="ep_end",
        bin_seconds=EPISODE_BIN_S,
    )
    return joined.select(
        "episode_id", "ep_start", "user_id", "event_id", "event_type", "ts"
    )


N_BINS = 10


@query(
    "feature_quantile_bins",
    oracle=f"""
    WITH b AS (SELECT o_totalprice,
                      ntile({N_BINS}) OVER (ORDER BY o_totalprice, o_orderkey)
                        AS bin
               FROM orders)
    SELECT CAST(bin AS INTEGER) AS bin, COUNT(*) AS n_orders,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM b GROUP BY bin
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of a numeric feature with the
    learned bin edges — the feature-engineering discretizer. Exact
    ntile({N_BINS}) semantics WITHOUT the global unpartitioned window
    (which serializes all orders through one task): distributed rank
    via operators.windows.global_row_number (approx-percentile range
    shards + per-shard row_number + broadcast offsets), then the ANSI
    ntile bucket computed arithmetically from (rank, total). The
    deterministic (value, key) tie-break keeps both engines' ntile
    identical; results are bit-equal to the oracle's global ntile."""
    from epe_data_wrangling_spark.operators.windows import (
        exact_ntile_from_rank,
        global_row_number,
    )

    o = load_table(spark, sf_dir, "orders")
    ranked, total = global_row_number(
        o.select("o_totalprice", "o_orderkey"),
        F.col("o_totalprice"),
        "o_orderkey",
        out="_rank",
    )
    b = ranked.select(
        "o_totalprice", exact_ntile_from_rank("_rank", total, N_BINS).alias("bin")
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
           v.user_id IS NOT NULL AS did_view,
           c.user_id IS NOT NULL AS did_click_after_view,
           p.user_id IS NOT NULL AS did_purchase_after_click
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, each stage
    strictly after the previous one's first completion): the product-
    analytics sequence operator. Three chained conditional MIN
    aggregates — every stage is one filtered agg joined to the
    previous stage's per-user timestamp, so the event log is scanned
    once per stage with key-only shuffles; no per-user sequence
    materialization, no UDFs. 100 TB form is identical (stages are
    associative over partitions)."""
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_view").isNotNull().alias("did_view"),
            F.col("t_click").isNotNull().alias("did_click_after_view"),
            F.col("t_purchase").isNotNull().alias("did_purchase_after_click"),
        )
    )


@query(
    "event_type_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence (market-basket) matrix: for every unordered pair
    of event types, how many users exhibit both. The distinct
    (user, type) projection collapses the log before the self-join,
    so the joined volume is users × types², not events² — the
    standard itemset-counting shape (at 100 TB the distinct
    projection is the only event-sized shuffle)."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "scd2_dimension_lookup",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    versioned AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS version
      FROM flagged),
    seg AS (
      SELECT user_id, CAST(version AS INTEGER) AS version, event_type,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM versioned GROUP BY user_id, version, event_type),
    dim AS (
      SELECT user_id, version, event_type AS state_at_time, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to
      FROM seg)
    SELECT e.event_id, e.user_id, e.ts, d.version, d.state_at_time
    FROM events e JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    """,
)
def scd2_dimension_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dated dimension lookup: join each fact row to the
    SCD2 version that was valid at its timestamp (the canonical
    'enrich with historical attributes as-of event time' join,
    composed on scd2_user_history's output). Because validity
    intervals within a key are non-overlapping and key-partitioned,
    the plan is a plain equi-join on user_id plus the validity
    filter — already the 100 TB shape (one key shuffle, no range-join
    explosion); each event matches exactly one version."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    dim = scd2_user_history(spark, sf_dir).select(
        "user_id",
        "version",
        F.col("event_type").alias("state_at_time"),
        "valid_from",
        "valid_to",
    )
    return (
        e.join(dim, "user_id")
        .filter(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "user_id", "ts", "version", "state_at_time")
    )


@query(
    "period_over_period_revenue",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS revenue
      FROM orders GROUP BY date_trunc('month', o_orderdate))
    SELECT month, revenue,
           LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
           round((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month), 6) AS mom_change
    FROM m
    """,
)
def period_over_period_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change (the period-comparison
    analytic): monthly sums decimal-staged for exactness. LAG over
    the month series is expressed as a broadcast self-join on the
    time-dimension-sized aggregate (previous existing month = max
    month strictly before, then fetch its revenue) — exact lag
    semantics with no global ordering window at all; the series is
    bounded by calendar time, so the |months|² dominance join is
    constant-sized at any fact-table scale."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    ).localCheckpoint(eager=True)  # tiny; three self-join sides reuse it
    earlier = m.select(F.col("month").alias("pm"), F.col("revenue").alias("prev_revenue"))
    withprev = (
        m.join(F.broadcast(earlier.select("pm")), F.col("pm") < F.col("month"), "left")
        .groupBy("month", "revenue")
        .agg(F.max("pm").alias("pmx"))
        .join(F.broadcast(earlier), F.col("pmx") == F.col("pm"), "left")
    )
    prev = F.col("prev_revenue")
    return withprev.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_change"),
    )


EPOCH_2024_US = 1704067200000000  #: 2024-01-01 in microseconds


@query(
    "regression_trend_per_type",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             (epoch_us(ts) - {EPOCH_2024_US}) / 86400000000.0 AS x,
             value AS y
      FROM events WHERE value IS NOT NULL),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(y, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(round(y * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS syy
      FROM pts GROUP BY event_type)
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 8)
             AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 8) AS r2
    FROM s
    """,
)
def regression_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (the SQL-standard
    REGR_SLOPE / REGR_INTERCEPT / R² family) of event value against
    time-in-days: closed-form from five decimal-staged moment sums,
    so the whole regression is ONE partial-aggregated scan — the
    canonical way to fit millions of tiny per-key models at 100 TB
    (no per-group iteration, no collect). Moment staging keeps both
    engines' sums exact; slope/intercept/R² are then one shared
    double tree."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (F.unix_micros(F.col("ts")) - F.lit(EPOCH_2024_US)) / F.lit(86400000000.0)
    y = F.col("value")

    def stg(c, p):
        return F.sum(F.round(c, 6).cast(f"decimal({p},6)")).cast("double")

    s = e.select("event_type", x.alias("x"), y.alias("y")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        stg(F.col("x"), 18).alias("sx"),
        stg(F.col("y"), 18).alias("sy"),
        stg(F.col("x") * F.col("y"), 28).alias("sxy"),
        stg(F.col("x") * F.col("x"), 28).alias("sxx"),
        stg(F.col("y") * F.col("y"), 28).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "event_type",
        "n",
        F.round(slope, 8).alias("slope"),
        F.round((sy - slope * sx) / n, 8).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            8,
        ).alias("r2"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id,
                        CAST(date_trunc('week', ts) AS DATE) AS week
                 FROM events),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week
               FROM act GROUP BY user_id)
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INTEGER)
             AS week_offset,
           COUNT(*) AS n_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY c.cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted per subsequent active week offset — the standard
    retention triangle. Two grouped passes over the distinct
    (user, week) activity projection (which is the only event-sized
    shuffle); the cohort table is user-sized and joins back on the
    key. date math is integer-exact on both engines."""
    e = load_table(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "categorical_encode_dense",
    oracle="""
    WITH v AS (SELECT DISTINCT o_orderpriority FROM orders),
    codes AS (SELECT o_orderpriority,
                     CAST(row_number() OVER (ORDER BY o_orderpriority) - 1
                          AS INTEGER) AS code
              FROM v)
    SELECT o.o_orderkey, o.o_orderpriority, c.code
    FROM orders o JOIN codes c USING (o_orderpriority)
    """,
)
def categorical_encode_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label encoding: map a categorical column to dense integer codes
    via a sorted distinct-value dictionary joined back (broadcast —
    the dictionary is vocabulary-sized). Deterministic code assignment
    (lexicographic), the reproducibility requirement for a feature
    store; the fact scan never shuffles. The dictionary FIT is a
    driver-side sort of the distinct values (the standard label-
    encoder fit step — it must fit in one broadcast anyway, and this
    avoids a global ordering window entirely)."""
    o = load_table(spark, sf_dir, "orders")
    # NULL-safe sort, NULLS LAST to match the oracle's row_number ASC
    # (DuckDB default); a bare sorted() would raise on None
    vals = sorted(
        (r[0] for r in o.select("o_orderpriority").distinct().collect()),
        key=lambda v: (v is None, v or ""),
    )
    codes = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "o_orderpriority STRING, code INT"
    )
    return o.select("o_orderkey", "o_orderpriority").join(
        F.broadcast(codes), "o_orderpriority"
    ).select("o_orderkey", "o_orderpriority", "code")


@query(
    "impute_value_by_type_mean",
    oracle="""
    WITH m AS (SELECT event_type,
                      round(CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6)))
                                 AS DOUBLE) / COUNT(value), 6) AS mean_v
               FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           COALESCE(e.value, m.mean_v) AS value_imputed,
           e.value IS NULL AS was_imputed
    FROM events e JOIN m USING (event_type)
    """,
)
def impute_value_by_type_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation by per-group mean (decimal-staged so
    the imputed constant is identical across engines): nulls take the
    event_type mean, with a was_imputed audit flag — the standard
    feature-cleaning pass. The |types|-row stats broadcast back; one
    narrow pass over the facts."""
    e = load_table(spark, sf_dir, "events")
    m = (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("mean_v")
        )
    )
    return (
        e.join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            F.coalesce(F.col("value"), F.col("mean_v")).alias("value_imputed"),
            F.col("value").isNull().alias("was_imputed"),
        )
    )


@query(
    "ivm_incremental_agg_merge",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def ivm_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, proven: the orders aggregate is
    computed as BASE (keys ≢ 9 mod 10, the 'already materialized'
    90%) merged with DELTA (the 'newly arrived' 10%) via a full outer
    join of partial states — and the oracle computes the SAME
    aggregate directly over everything, so the hash check certifies
    merge(partial, delta) ≡ recompute(full). This is the contract an
    incremental pipeline relies on: count and decimal-staged sum are
    associative partial states. At 100 TB only the delta is scanned
    per refresh; the merge is a |groups|-row join."""
    o = load_table(spark, sf_dir, "orders")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")).alias("s"),
        )

    base = agg(o.filter(F.col("o_orderkey") % 10 != 9))
    delta = agg(o.filter(F.col("o_orderkey") % 10 == 9))
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (
                F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("b.s"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("d.s"), F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "cascade_delete_audit",
    oracle="""
    WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 53 = 0),
    del_orders AS (SELECT o_orderkey FROM orders
                   JOIN del ON o_custkey = c_custkey),
    surviving_li AS (
      SELECT l.* FROM lineitem l
      LEFT JOIN del_orders d ON l.l_orderkey = d.o_orderkey
      WHERE d.o_orderkey IS NULL)
    SELECT (SELECT COUNT(*) FROM del) AS n_customers_deleted,
           (SELECT COUNT(*) FROM del_orders) AS n_orders_cascaded,
           (SELECT COUNT(*) FROM lineitem) -
             (SELECT COUNT(*) FROM surviving_li) AS n_lineitems_cascaded,
           (SELECT COUNT(*) FROM surviving_li) AS n_lineitems_surviving,
           (SELECT CAST(SUM(l_orderkey) AS BIGINT) FROM surviving_li)
             AS surviving_orderkey_checksum
    """,
)
def cascade_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade, audited: a deterministic subject set
    (custkeys ≡ 0 mod 53) is deleted and the deletion propagates
    customer → orders → lineitem via anti-joins; output counts each
    cascade level plus a checksum of the surviving fact rows — the
    compliance evidence a deletion pipeline must produce. Scale
    shape: the subject set is small (broadcast anti-joins all the way
    down); facts are scanned once per level and never shuffled."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dele = c.filter(F.col("c_custkey") % 53 == 0).select("c_custkey")
    del_orders = o.join(
        F.broadcast(dele), o.o_custkey == dele.c_custkey
    ).select("o_orderkey")
    surviving = li.join(
        F.broadcast(del_orders), li.l_orderkey == del_orders.o_orderkey, "left_anti"
    )
    n_li = li.agg(F.count(F.lit(1)).alias("n"))
    stats = surviving.agg(
        F.count(F.lit(1)).alias("n_surv"),
        F.sum("l_orderkey").alias("chk"),
    )
    return (
        dele.agg(F.count(F.lit(1)).alias("n_customers_deleted"))
        .crossJoin(del_orders.agg(F.count(F.lit(1)).alias("n_orders_cascaded")))
        .crossJoin(F.broadcast(n_li))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_customers_deleted",
            "n_orders_cascaded",
            (F.col("n") - F.col("n_surv")).alias("n_lineitems_cascaded"),
            F.col("n_surv").alias("n_lineitems_surviving"),
            F.col("chk").cast("bigint").alias("surviving_orderkey_checksum"),
        )
    )


@query(
    "funnel_conversion_rates",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked,
           (SELECT COUNT(*) FROM p) AS n_purchased,
           round(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
           round(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase
    """,
)
def funnel_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel roll-up: stage populations and conversion rates in
    one summary row (built on the same chained-conditional-MIN stages
    as funnel_conversion). Tiny aggregates cross-joined — the report
    a dashboard reads."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id").filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id").filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    nu = e.agg(F.countDistinct("user_id").alias("n_users"))
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased"))
    return (
        nu.crossJoin(F.broadcast(nv)).crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))
        .select(
            "n_users", "n_viewed", "n_clicked", "n_purchased",
            F.round(F.col("n_clicked").cast("double") / F.col("n_viewed"), 6)
            .alias("view_to_click"),
            F.round(F.col("n_purchased").cast("double") / F.col("n_clicked"), 6)
            .alias("click_to_purchase"),
        )
    )


@query(
    "interarrival_stats_per_user",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                  AS BIGINT) / 1000000.0 AS gap_s
      FROM events),
    s AS (SELECT user_id, COUNT(gap_s) AS n_gaps,
                 CAST(SUM(CAST(round(gap_s, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(gap_s) AS mean_gap,
                 CAST(SUM(CAST(round(gap_s * gap_s) AS DECIMAL(38,0))
                      ) AS DOUBLE) / COUNT(gap_s) AS msq
          FROM g WHERE gap_s IS NOT NULL GROUP BY user_id)
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           mean_gap AS mean_gap_s,
           sqrt(msq - mean_gap * mean_gap) AS std_gap_s,
           sqrt(msq - mean_gap * mean_gap) / mean_gap AS burstiness_cv
    FROM s
    """,
)
def interarrival_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal behavior profile: per-user inter-event gap mean/std
    and the coefficient of variation (CV > 1 ⇒ bursty, CV ≈ 1 ⇒
    Poisson-like — the bot-vs-human signal). Gaps via lag over the
    per-user order; moments decimal-staged with gap² at whole-second
    granularity so the unscaled sums stay under 2^53 (decimal→double
    casts are correctly rounded on both engines only below that); one
    user_id exchange serves the lag window and the aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
        .cast("bigint") / F.lit(1000000.0)
    )
    g = e.select("user_id", gap.alias("gap_s")).filter(F.col("gap_s").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        (
            F.sum(F.round(F.col("gap_s"), 6).cast("decimal(18,6)")).cast("double")
            / F.count("gap_s")
        ).alias("mean_gap"),
        # gap² staged at 0 dp: the 6-dp staging's unscaled sums exceed
        # 2^53, where DuckDB's decimal→double cast double-rounds and
        # diverges from Spark (caught at both SFs once output rounding
        # was removed); 1 s² granularity keeps sums exactly castable
        (
            F.sum(
                F.round(F.col("gap_s") * F.col("gap_s")).cast("decimal(38,0)")
            ).cast("double")
            / F.count("gap_s")
        ).alias("msq"),
    )
    # no final rounding: the doubles are identical on both engines by
    # construction (staged sums), and round()'s half-digit tie-breaks
    # are the one thing the engines do differently (caught at sf0.1)
    std = F.sqrt(F.col("msq") - F.col("mean_gap") * F.col("mean_gap"))
    return s.select(
        "user_id",
        "n_gaps",
        F.col("mean_gap").alias("mean_gap_s"),
        std.alias("std_gap_s"),
        (std / F.col("mean_gap")).alias("burstiness_cv"),
    )


@query(
    "order_lines_histogram",
    oracle="""
    WITH n AS (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem
               GROUP BY l_orderkey)
    SELECT CAST(n_lines AS INTEGER) AS n_lines,
           COUNT(*) AS n_orders
    FROM n GROUP BY n_lines
    """,
)
def order_lines_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size distribution (lines per order) — the fan-out profile
    that sizes join estimates and skew expectations. Two partial-agg
    passes; output is at most max-lines rows."""
    li = load_table(spark, sf_dir, "lineitem")
    n = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    return n.groupBy(F.col("n_lines").cast("int").alias("n_lines")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    base AS (
      SELECT o_custkey,
             CAST(date_diff('day', MAX(o_orderdate), mx.maxd) AS INTEGER)
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS monetary
      FROM orders CROSS JOIN mx GROUP BY o_custkey, mx.maxd),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey)
                  AS INTEGER) AS r_quartile,
             CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey)
                  AS INTEGER) AS f_quartile,
             CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
                  AS INTEGER) AS m_quartile
      FROM base)
    SELECT o_custkey, recency_days, frequency, monetary,
           r_quartile, f_quartile, m_quartile,
           CAST(r_quartile AS VARCHAR) || CAST(f_quartile AS VARCHAR)
             || CAST(m_quartile AS VARCHAR) AS rfm_segment
    FROM scored
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (the classic CRM model): per customer, days
    since last order, order count, decimal-staged lifetime spend, and
    quartile codes for each (best = 1), concatenated into the
    '111'-style segment label. Deterministic ntile via explicit
    tie-breaks. The three quartile assignments avoid the global
    unpartitioned window (single-task over the whole customer table):
    each runs the distributed exact-rank (range shards from
    approx-percentile cut points + per-shard row_number + broadcast
    offsets, operators.windows.global_row_number) and derives the
    ANSI ntile bucket from (rank, total) arithmetically — bit-equal
    to the oracle's global ntile(4). DESC orders rank the negated
    measure."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "maxd")
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("maxd"), F.col("lastd")).cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from epe_data_wrangling_spark.operators.windows import (
        exact_ntile_from_rank,
        global_row_number,
    )

    base = base.localCheckpoint(eager=True)  # three rank passes reuse it
    scored = base
    for qcol, value in (
        ("r_quartile", F.col("recency_days")),
        ("f_quartile", -F.col("frequency")),
        ("m_quartile", -F.col("monetary")),
    ):
        scored, total = global_row_number(scored, value, "o_custkey", out="_rank")
        scored = scored.withColumn(
            qcol, exact_ntile_from_rank("_rank", total, 4)
        ).drop("_rank")
    scored = scored.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        "r_quartile", "f_quartile", "m_quartile",
    )
    return scored.withColumn(
        "rfm_segment",
        F.concat(
            F.col("r_quartile").cast("string"),
            F.col("f_quartile").cast("string"),
            F.col("m_quartile").cast("string"),
        ),
    )


@query(
    "supplier_concentration_hhi",
    oracle="""
    WITH s AS (
      SELECT n.n_name, l.l_suppkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,6))) AS rev
      FROM lineitem l
      JOIN supplier su ON l.l_suppkey = su.s_suppkey
      JOIN nation n ON su.s_nationkey = n.n_nationkey
      GROUP BY n.n_name, l.l_suppkey),
    t AS (SELECT n_name, l_suppkey, rev,
                 SUM(rev) OVER (PARTITION BY n_name) AS tot
          FROM s)
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(round(
                 (CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE))
                 * (CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE)), 12)
               AS DECIMAL(18,12))) AS DOUBLE) AS hhi
    FROM t GROUP BY n_name
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue within
    each nation (1/n = perfectly even, →1 = monopoly) — the
    market-structure metric, all rational arithmetic: revenues staged
    losslessly at decimal(18,6) (the ≤4-dp products cast exactly),
    exact decimal window total, squared shares re-staged at 12 dp
    before the final sum (unscaled ≪ 2^53)."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    s = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(
            # stage at 6 dp WITHOUT rounding: the 2dp-price x 2dp-discount
            # product has at most 4 decimals, so the decimal cast is exact
            # (rounding to 2 dp hit per-row half-ties that differ between
            # engines and shifted every share in the low bits)
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(18,6)")
            ).alias("rev")
        )
    )
    t = s.withColumn("tot", F.sum("rev").over(Window.partitionBy("n_name")))
    share = F.col("rev").cast("double") / F.col("tot").cast("double")
    return t.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.round(share * share, 12).cast("decimal(18,12)"))
        .cast("double")
        .alias("hhi"),
    )


MAD_K = 0.6745  #: Φ⁻¹(0.75): scales MAD to σ-equivalent units
MAD_THRESHOLD = 3.5  #: |modified z| flag level (Iglewicz-Hoaglin)


@query(
    "anomaly_mad_events",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type),
    mad AS (
      SELECT e.event_type, med.med,
             quantile_cont(abs(e.value - med.med), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      WHERE e.value IS NOT NULL GROUP BY e.event_type, med.med)
    SELECT e.event_id, e.event_type, e.value,
           round({MAD_K} * (e.value - m.med) / m.mad, 6) AS robust_z
    FROM events e JOIN mad m USING (event_type)
    WHERE e.value IS NOT NULL AND m.mad > 0
      AND abs({MAD_K} * (e.value - m.med) / m.mad) > {MAD_THRESHOLD}
    """,
)
def anomaly_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier flagging — the modified z-score
    |{MAD_K}·(x−med)/MAD| > {MAD_THRESHOLD} (Iglewicz–Hoaglin), the
    variant production monitoring uses because mean/σ (the
    anomaly_zscore_events twin) are themselves dragged by the
    outliers being hunted. Two grouped EXACT percentile passes (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, both linear
    interpolation — the parity `agg_percentiles_priority` pins), each
    a per-group sort of |event_type| groups; the med/MAD table is
    group-count-sized and broadcast back, so the flagging pass is a
    narrow fact scan with no fact shuffle. Zero-MAD groups (>50%
    ties) are excluded on both sides rather than dividing by zero; at
    100 TB swap the exact percentiles for approx_percentile and keep
    the identical flagging expression."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    rz = F.lit(MAD_K) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        e.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(rz) > MAD_THRESHOLD))
        .select(
            "event_id", "event_type", "value", F.round(rz, 6).alias("robust_z")
        )
    )


def _snapshot_versions(o: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two deterministic versions of orders for the snapshot-diff /
    changeset-apply pair (one carving, shared so the queries cannot
    drift): v2 adds keys ≡3 mod 7, drops keys ≡5 mod 11, flips
    o_orderstatus to 'X' on keys ≡0 mod 13. Money is staged to
    integer cents here so no double ever renders to text."""
    base = o.select(
        "o_orderkey",
        "o_custkey",  # carried for the delta-JOIN view; hash/projection-invariant
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderstatus",
        "o_orderpriority",
    )
    v1 = base.filter(F.col("o_orderkey") % 7 != 3)
    v2 = base.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 13 == 0, "X").otherwise(
            F.col("o_orderstatus")
        ),
    ).filter(F.col("o_orderkey") % 11 != 5)
    return v1, v2


def _snapshot_version3(v2: DataFrame) -> DataFrame:
    """Third deterministic version for the end-to-end CDC pipeline
    (``streaming_cdc_retraction_pipeline``): from v2, drop keys ≡1
    mod 17, flip o_orderstatus to 'Y' on keys ≡0 mod 19 (moves rows
    ACROSS groups — a wrong retraction sign cannot cancel), and bump
    cents by 500 on keys ≡0 mod 23 (a value-only update: the group's
    count nets to zero while its sum must not)."""
    return (
        v2.withColumn(
            "cents",
            F.when(
                F.col("o_orderkey") % 23 == 0, F.col("cents") + 500
            ).otherwise(F.col("cents")),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 19 == 0, "Y").otherwise(
                F.col("o_orderstatus")
            ),
        )
        .filter(F.col("o_orderkey") % 17 != 1)
    )


def _with_row_hash(df: DataFrame) -> DataFrame:
    """Key + md5 row digest over the business columns + the columns
    the changeset consumers read (status, cents).

    DO NOT swap the concat_ws digest for the sinks' field-safe
    ``_row_digest``: snapshot_diff_keyed's DuckDB oracle mirrors THIS
    exact formula, so both engines must keep it. The concat_ws
    hazards (NULL-skip, delimiter shift) are inert here because the
    carved columns are provably non-null integers/strings with no
    '|' in any rendering."""
    return df.select(
        "o_orderkey",
        F.md5(
            F.concat_ws(
                "|",
                F.col("cents").cast("string"),
                "o_orderstatus",
                "o_orderpriority",
            )
        ).alias("rh"),
        "o_orderstatus",
        "cents",
    )


@query(
    "snapshot_diff_keyed",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderstatus, o_orderpriority
      FROM orders),
    h1 AS (
      SELECT o_orderkey,
             md5(concat_ws('|', CAST(cents AS VARCHAR),
                           o_orderstatus, o_orderpriority)) AS rh
      FROM base WHERE o_orderkey % 7 != 3),
    v2 AS (
      SELECT o_orderkey, cents,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             o_orderpriority
      FROM base WHERE o_orderkey % 11 != 5),
    h2 AS (
      SELECT o_orderkey,
             md5(concat_ws('|', CAST(cents AS VARCHAR),
                           o_orderstatus, o_orderpriority)) AS rh,
             o_orderstatus
      FROM v2)
    SELECT COALESCE(h1.o_orderkey, h2.o_orderkey) AS o_orderkey,
           CASE WHEN h1.o_orderkey IS NULL THEN 'added'
                WHEN h2.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           h2.o_orderstatus AS new_status
    FROM h1 FULL OUTER JOIN h2 ON h1.o_orderkey = h2.o_orderkey
    WHERE h1.o_orderkey IS NULL OR h2.o_orderkey IS NULL
       OR h1.rh != h2.rh
    """,
)
def snapshot_diff_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff — derive a CDC changeset (added / removed /
    changed + the new image) between two versions of a table by
    full-outer-joining on the key and comparing a per-row md5 over
    the business columns. This is the operator that turns two plain
    parquet snapshots into the delta a downstream IVM refresh
    (``ivm_incremental_agg_merge`` / ``streaming_ivm_agg_merge``) or
    audit consumes, without any table-format change log. Versions are
    carved deterministically from orders (v2 adds keys ≡3 mod 7,
    drops keys ≡5 mod 11, flips status on keys ≡0 mod 13). Hash
    discipline: doubles never render to text (money goes through
    integer cents; bigint→varchar renders identically on both
    engines), and md5 is the shared cross-engine digest. Scale: one
    shuffle per side on the key — zero exchanges when both snapshots
    are bucketed on it — and the row-hash comparison reduces the
    change detection to one narrow column regardless of table width;
    unchanged keys (the overwhelming majority at 100 TB) are
    filtered before anything leaves the join."""
    v1, v2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    h1, h2 = _with_row_hash(v1), _with_row_hash(v2)
    a, b = h1.alias("a"), h2.alias("b")
    return (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .filter(
            F.col("a.o_orderkey").isNull()
            | F.col("b.o_orderkey").isNull()
            | (F.col("a.rh") != F.col("b.rh"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("a.o_orderkey").isNull(), "added")
            .when(F.col("b.o_orderkey").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            F.col("b.o_orderstatus").alias("new_status"),
        )
    )


@query(
    "ivm_apply_changeset",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderstatus
      FROM orders),
    v2 AS (
      SELECT o_orderkey, cents,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM base WHERE o_orderkey % 11 != 5)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM v2 GROUP BY o_orderstatus
    """,
)
def ivm_apply_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM with RETRACTIONS — the missing half of the incremental
    story: ``ivm_incremental_agg_merge`` / ``streaming_ivm_agg_merge``
    prove insert-only merges; this query proves delta application
    with DELETES and UPDATES, by feeding ``snapshot_diff_keyed``'s
    changeset into the additive state as signed rows (old image −1,
    new image +1 — an update is a retraction plus an insertion). The
    aggregate groups by o_orderstatus, which the v1→v2 carving
    MOVES rows across (status flips on keys ≡0 mod 13), so a wrong
    sign or a missed retraction cannot cancel out. Certified
    identity: merge(state(v1), Σ±changeset) ≡ recompute(v2) — the
    oracle computes v2's aggregate directly; groups whose count
    reaches zero are dropped from the view. Integer cents
    end-to-end: counts and sums are exact, order-free, and
    driver-safe as BIGINT. Scale: state(v1) is |groups| rows; the
    changeset is change-sized, not table-sized (unchanged keys are
    filtered by row-hash inside the diff join); the apply is a
    groups-sized outer join — per refresh, work tracks the delta."""
    v1, v2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    state1 = v1.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    a, b = _with_row_hash(v1).alias("a"), _with_row_hash(v2).alias("b")
    j = a.join(
        b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    retract = j.filter(
        F.col("a.o_orderkey").isNotNull()
        & (F.col("b.o_orderkey").isNull() | (F.col("a.rh") != F.col("b.rh")))
    ).select(
        F.lit(-1).alias("sign"),
        F.col("a.o_orderstatus").alias("o_orderstatus"),
        F.col("a.cents").alias("cents"),
    )
    insert = j.filter(
        F.col("b.o_orderkey").isNotNull()
        & (F.col("a.o_orderkey").isNull() | (F.col("a.rh") != F.col("b.rh")))
    ).select(
        F.lit(1).alias("sign"),
        F.col("b.o_orderstatus").alias("o_orderstatus"),
        F.col("b.cents").alias("cents"),
    )
    delta = (
        retract.unionByName(insert)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * F.col("cents")).alias("ds"),
        )
    )
    st, d = state1.alias("st"), delta.alias("d")
    return (
        st.join(d, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            (
                F.coalesce(F.col("st.n"), F.lit(0)) + F.coalesce(F.col("d.dn"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("st.s"), F.lit(0)) + F.coalesce(F.col("d.ds"), F.lit(0))
            ).alias("total_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )


def _dim_versions(c: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two deterministic versions of the customer dim for the
    delta-JOIN maintenance query (one carving, shared with its test):
    s1 drops keys ≡2 mod 9; s2 restores them, drops keys ≡5 mod 9,
    and moves keys ≡0 mod 8 into segment 'MACHINERY' — the dim side
    gets adds, deletes, AND cross-group attribute updates, so a
    missed dim retraction cannot cancel out."""
    base = c.select("c_custkey", "c_mktsegment")
    s1 = base.filter(F.col("c_custkey") % 9 != 2)
    s2 = base.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 8 == 0, "MACHINERY").otherwise(
            F.col("c_mktsegment")
        ),
    ).filter(F.col("c_custkey") % 9 != 5)
    return s1, s2


def _signed_delta(old: DataFrame, new: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """Signed multiset delta new − old over ``key``: removed/changed
    rows emit their OLD image with sign −1, added/changed rows their
    NEW image with sign +1; unchanged keys (the overwhelming majority
    at scale) die inside the join before anything is emitted. One
    keyed shuffle per side — the same shape as snapshot_diff_keyed."""
    a, b = old.alias("a"), new.alias("b")
    changed = F.lit(False)
    for c in cols:
        # null-SAFE inequality: a plain != yields NULL against a NULL
        # operand and the filter would silently drop a NULL↔value
        # change (no current carving carries NULLs, but the helper
        # must not depend on that)
        changed = changed | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    j = a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer").filter(
        F.col(f"a.{key}").isNull() | F.col(f"b.{key}").isNull() | changed
    )
    minus = j.filter(F.col(f"a.{key}").isNotNull()).select(
        F.col(f"a.{key}").alias(key),
        *[F.col(f"a.{c}").alias(c) for c in cols],
        F.lit(-1).alias("sign"),
    )
    plus = j.filter(F.col(f"b.{key}").isNotNull()).select(
        F.col(f"b.{key}").alias(key),
        *[F.col(f"b.{c}").alias(c) for c in cols],
        F.lit(1).alias("sign"),
    )
    return minus.unionByName(plus)


@query(
    "ivm_join_delta_maintenance",
    oracle="""
    WITH r2 AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 11 != 5),
    s2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 8 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 9 != 5)
    SELECT s2.c_mktsegment, r2.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(r2.cents) AS BIGINT) AS cents_sum
    FROM r2 JOIN s2 ON r2.o_custkey = s2.c_custkey
    GROUP BY 1, 2
    """,
)
def ivm_join_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the step beyond the
    aggregate-only IVM family (``ivm_apply_changeset`` /
    ``streaming_ivm_agg_merge`` maintain Σ over ONE evolving input;
    real materialized views join first): the view is
    γ(orders ⋈ customer) grouped by (c_mktsegment, o_orderstatus),
    and BOTH sides evolve — orders via the shared v1→v2 carving
    (adds ≡3 mod 7, deletes ≡5 mod 11, status flips ≡0 mod 13) and
    the customer dim via ``_dim_versions`` (adds, deletes, segment
    moves). The refresh applies the bilinear delta-join expansion
    (DBToaster / differential-dataflow textbook form)

        Δ(R ⋈ S) = ΔR ⋈ S₁  +  R₁ ⋈ ΔS  +  ΔR ⋈ ΔS

    with SIGNED multiset deltas (update = retraction + insertion;
    join terms multiply signs), then merges the signed group deltas
    into the v1 state — ΔR ⋈ S₁ against the OLD dim image, the
    classic off-by-one-version trap. Certified identity:
    merge(γ(R₁⋈S₁), Σ± Δ-terms) ≡ recompute(γ(R₂⋈S₂)) — the oracle
    computes the v2 join directly from parquet; zero-count groups
    must vanish. Integer cents end-to-end (counts and sums exact and
    order-free). Scale: the three Δ-terms each join a DELTA (tracking
    the day's change volume, not the table) against one base scan or
    another delta — broadcast-eligible; base sides are scanned once
    each; every join and the final merge are keyed shuffles; state
    merge is |groups|-sized."""
    r1, r2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    r1 = r1.select("o_custkey", "cents", "o_orderstatus", F.col("o_orderkey"))
    r2 = r2.select("o_custkey", "cents", "o_orderstatus", F.col("o_orderkey"))
    s1, s2 = _dim_versions(load_table(spark, sf_dir, "customer"))

    # materialize each delta ONCE (change-volume-sized): ΔR feeds the
    # t1 and t3 terms, ΔS feeds t2 and t3 — without the barrier the
    # diff full-outer join (the dominant cost at scale) runs twice per
    # delta; same localCheckpoint idiom as split_by_dedup_cluster
    dR = _signed_delta(
        r1, r2, "o_orderkey", ["o_custkey", "cents", "o_orderstatus"]
    ).localCheckpoint(eager=True)
    dS = _signed_delta(s1, s2, "c_custkey", ["c_mktsegment"]).localCheckpoint(
        eager=True
    )

    # v1 state: γ over the old join image (at steady state this is the
    # standing materialized view, never recomputed)
    state1 = (
        r1.join(s1, r1.o_custkey == s1.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
        )
    )

    sgn = lambda df, s: df.select(  # noqa: E731
        "c_mktsegment", "o_orderstatus", "cents", s.alias("sign")
    )
    term1 = sgn(
        dR.join(s1, dR.o_custkey == s1.c_custkey), F.col("sign")
    )
    term2 = sgn(
        r1.join(dS, r1.o_custkey == dS.c_custkey), F.col("sign")
    )
    dr, ds_ = dR.alias("dr"), dS.alias("ds")
    term3 = dr.join(ds_, F.col("dr.o_custkey") == F.col("ds.c_custkey")).select(
        F.col("ds.c_mktsegment").alias("c_mktsegment"),
        F.col("dr.o_orderstatus").alias("o_orderstatus"),
        F.col("dr.cents").alias("cents"),
        (F.col("dr.sign") * F.col("ds.sign")).alias("sign"),
    )

    delta = (
        term1.unionByName(term2)
        .unionByName(term3)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * F.col("cents")).alias("ds_"),
        )
    )
    st, d = state1.alias("st"), delta.alias("d")
    return (
        st.join(d, ["c_mktsegment", "o_orderstatus"], "full_outer")
        .select(
            "c_mktsegment",
            "o_orderstatus",
            (
                F.coalesce(F.col("st.n"), F.lit(0))
                + F.coalesce(F.col("d.dn"), F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(F.col("st.s"), F.lit(0))
                + F.coalesce(F.col("d.ds_"), F.lit(0))
            ).alias("cents_sum"),
        )
        .filter(F.col("n_rows") > 0)
    )


#: Bucket count for the key-partitioned stored fact base of the
#: pruned IVM refresh. 64 keeps the sf0.01 demo's partition dirs
#: cheap; a 100 TB deployment sizes it so one bucket ≈ a few GB.
IVM_BASE_BUCKETS = 64


def ivm_pruned_join_refresh(
    spark: SparkSession,
    base: DataFrame,
    dR: DataFrame,
    s1: DataFrame,
    dS: DataFrame,
    *,
    n_buckets: int = IVM_BASE_BUCKETS,
):
    """The R₁⋈ΔS-pruned bilinear refresh, factored so the catalog
    query and the plan-assert test share one implementation. ``base``
    is the STORED fact image read from a parquet dir partitioned by
    ``_kb = pmod(o_custkey, n_buckets)``; the refresh pushes ΔS's key
    set into that scan as a partition filter — collect ΔS's touched
    buckets (≤ n_buckets rows, dim-change-sized) and plan
    ``_kb IN (touched)``, so Catalyst prunes unaffected partitions at
    PLANNING time and the dominant term's base I/O is
    |touched buckets| / n_buckets of the table instead of all of it.
    ΔS itself is broadcast (change-volume-sized), so the term shuffles
    nothing. Returns ``(delta_view, term2)`` — the signed per-group
    delta ready to merge into the stored view state, and the pruned
    term's DataFrame for plan inspection."""
    touched = sorted(
        r["b"]
        for r in dS.select(
            F.pmod(F.col("c_custkey"), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    )
    pruned = base.filter(F.col("_kb").isin([int(b) for b in touched]))

    term1 = dR.join(s1, dR.o_custkey == s1.c_custkey).select(
        "c_mktsegment", "o_orderstatus", "cents", "sign"
    )
    pr, ds_ = pruned.alias("pr"), dS.alias("ds")
    term2 = pr.join(
        F.broadcast(ds_), F.col("pr.o_custkey") == F.col("ds.c_custkey")
    ).select(
        F.col("ds.c_mktsegment").alias("c_mktsegment"),
        F.col("pr.o_orderstatus").alias("o_orderstatus"),
        F.col("pr.cents").alias("cents"),
        F.col("ds.sign").alias("sign"),
    )
    dr = dR.alias("dr")
    term3 = dr.join(ds_, F.col("dr.o_custkey") == F.col("ds.c_custkey")).select(
        F.col("ds.c_mktsegment").alias("c_mktsegment"),
        F.col("dr.o_orderstatus").alias("o_orderstatus"),
        F.col("dr.cents").alias("cents"),
        (F.col("dr.sign") * F.col("ds.sign")).alias("sign"),
    )
    delta = (
        term1.unionByName(term2)
        .unionByName(term3)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * F.col("cents")).alias("ds_"),
        )
    )
    return delta, term2


@query(
    "ivm_join_delta_pruned_base",
    oracle="""
    WITH r2 AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 11 != 5),
    s2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 8 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 9 != 5)
    SELECT s2.c_mktsegment, r2.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(r2.cents) AS BIGINT) AS cents_sum
    FROM r2 JOIN s2 ON r2.o_custkey = s2.c_custkey
    GROUP BY 1, 2
    """,
)
def ivm_join_delta_pruned_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ivm_join_delta_maintenance`` with its one admitted scale gap
    closed (same carving, SAME oracle — the variant must not change
    semantics): the bilinear R₁⋈ΔS term there scans the ENTIRE stored
    fact base every refresh, which at 100 TB dwarfs the delta-sized
    work of the other two terms. Here the base is STORED the way a
    standing materialized-view input should be — a parquet dir
    partitioned by ``_kb = pmod(o_custkey, {IVM_BASE_BUCKETS})``, the
    join key's bucket — and the refresh pushes ΔS's key set into the
    scan: collect the dim delta's touched buckets (≤ bucket-count
    rows) and plan ``_kb IN (touched)`` so partition pruning drops
    every unaffected bucket at planning time, then broadcast ΔS for
    the exact equi-join. Refresh I/O on the dominant term is
    |touched buckets|/{IVM_BASE_BUCKETS} of the base ∝ |ΔS keys| —
    the r8 carving's dense dim delta touches every bucket (pruning
    passes all 64; the MECHANISM is what this query certifies), and
    the sparse-delta pytest + SCALE.md row show the bite: runtime
    scan metrics prove only the touched buckets' files are read.
    γ(R₁⋈S₁) bootstrap state is computed from the store once here; at
    steady state it IS the stored view and is never recomputed. The
    demo materializes the partitioned base into a temp dir (the
    fixture's stand-in for the standing table) and cleans it up."""
    import os
    import shutil
    import tempfile

    r1, r2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    r1 = r1.select("o_custkey", "cents", "o_orderstatus", "o_orderkey")
    r2 = r2.select("o_custkey", "cents", "o_orderstatus", "o_orderkey")
    s1, s2 = _dim_versions(load_table(spark, sf_dir, "customer"))

    work = tempfile.mkdtemp(prefix="ivm_pruned_")
    base_dir = os.path.join(work, "orders_base")
    try:
        # the standing fact store: key-bucket partitioned (fixture-side
        # write; at scale this table already exists)
        r1.withColumn(
            "_kb", F.pmod(F.col("o_custkey"), F.lit(IVM_BASE_BUCKETS))
        ).write.partitionBy("_kb").parquet(base_dir)
        base = spark.read.parquet(base_dir)

        dR = _signed_delta(
            r1, r2, "o_orderkey", ["o_custkey", "cents", "o_orderstatus"]
        ).localCheckpoint(eager=True)
        dS = _signed_delta(s1, s2, "c_custkey", ["c_mktsegment"]).localCheckpoint(
            eager=True
        )

        # bootstrap of the standing view (read from the store; at
        # steady state this is a stored table, not a recompute)
        state1 = (
            base.join(s1, base.o_custkey == s1.c_custkey)
            .groupBy("c_mktsegment", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        )
        delta, _ = ivm_pruned_join_refresh(spark, base, dR, s1, dS)
        st, d = state1.alias("st"), delta.alias("d")
        rows = (
            st.join(d, ["c_mktsegment", "o_orderstatus"], "full_outer")
            .select(
                "c_mktsegment",
                "o_orderstatus",
                (
                    F.coalesce(F.col("st.n"), F.lit(0))
                    + F.coalesce(F.col("d.dn"), F.lit(0))
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("st.s"), F.lit(0))
                    + F.coalesce(F.col("d.ds_"), F.lit(0))
                ).alias("cents_sum"),
            )
            .filter(F.col("n_rows") > 0)
            .collect()
        )
        return spark.createDataFrame(
            rows,
            "c_mktsegment STRING, o_orderstatus STRING, n_rows BIGINT, "
            "cents_sum BIGINT",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "ivm_outer_join_maintenance",
    oracle="""
    WITH r2 AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 11 != 5),
    s2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 8 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 9 != 5)
    SELECT COALESCE(s2.c_mktsegment, '(none)') AS c_mktsegment,
           r2.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(r2.cents) AS BIGINT) AS cents_sum
    FROM r2 LEFT JOIN s2 ON r2.o_custkey = s2.c_custkey
    GROUP BY 1, 2
    """,
)
def ivm_outer_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an OUTER-join view — the classic
    'counting problem' (Gupta–Mumick) that makes materialized views
    with outer joins harder than inner ones: in γ(R ⟕ S), an R row
    MIGRATES between the null-padded group and a matched group
    whenever its dim key appears in or disappears from S — a plain
    bilinear refresh misses those migrations. With S's join key
    unique (an FK dim), support counting degenerates to key-set
    membership and the delta decomposes exactly:

        Δγ(R ⟕ S) = γ±( Δ(R ⋈ S)                      [bilinear, as
                                        ivm_join_delta_maintenance]
                       + ΔR ∖ₖ K₂                     [delta rows that
                                         land unmatched, sign kept]
                       + R₁ ⋈ (K₁∖K₂) as +1           [keys leaving S:
                                      their R rows ENTER the ∅-group]
                       + R₁ ⋈ (K₂∖K₁) as −1 )         [keys entering S:
                                          their R rows LEAVE it]

    where K₁/K₂ are S's key sets and the key transitions fall out of
    ΔS's net sign per key (removed ≡ Σsign = −1, added ≡ +1; an
    attribute-only change nets 0 and is fully handled by the bilinear
    part). Certified identity: merge(γ(R₁⟕S₁), Σ±) ≡ recompute
    (γ(R₂⟕S₂)) — the oracle computes the final LEFT JOIN directly;
    the carvings make every migration direction non-empty (dim keys
    ≡2 mod 9 ENTER S and ≡5 mod 9 LEAVE it between versions).
    Scale: everything the inner query shuffles plus two
    key-transition joins whose build side is the dim CHANGE
    (broadcast-eligible); the ∅-filter on ΔR is one anti-join against
    the dim key set."""
    r1, r2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    r1 = r1.select("o_custkey", "cents", "o_orderstatus", "o_orderkey")
    r2 = r2.select("o_custkey", "cents", "o_orderstatus", "o_orderkey")
    s1, s2 = _dim_versions(load_table(spark, sf_dir, "customer"))
    NONE = "(none)"

    dR = _signed_delta(
        r1, r2, "o_orderkey", ["o_custkey", "cents", "o_orderstatus"]
    ).localCheckpoint(eager=True)
    dS = _signed_delta(s1, s2, "c_custkey", ["c_mktsegment"]).localCheckpoint(
        eager=True
    )

    # v1 state: γ over the old LEFT join
    state1 = (
        r1.join(s1, r1.o_custkey == s1.c_custkey, "left")
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit(NONE)).alias("c_mktsegment"),
            "o_orderstatus",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )

    # --- matched part: the inner-join bilinear terms ---
    out = lambda df, seg, sgn: df.select(  # noqa: E731
        seg.alias("c_mktsegment"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        F.col("cents").alias("cents"),
        sgn.alias("sign"),
    )
    t1 = out(
        dR.join(s1, dR.o_custkey == s1.c_custkey),
        F.col("c_mktsegment"),
        F.col("sign"),
    )
    dr, ds_ = dR.alias("dr"), dS.alias("ds")
    t2 = r1.alias("ro").join(
        ds_, F.col("ro.o_custkey") == F.col("ds.c_custkey")
    ).select(
        F.col("ds.c_mktsegment").alias("c_mktsegment"),
        F.col("ro.o_orderstatus").alias("o_orderstatus"),
        F.col("ro.cents").alias("cents"),
        F.col("ds.sign").alias("sign"),
    )
    t3 = dr.join(ds_, F.col("dr.o_custkey") == F.col("ds.c_custkey")).select(
        F.col("ds.c_mktsegment").alias("c_mktsegment"),
        F.col("dr.o_orderstatus").alias("o_orderstatus"),
        F.col("dr.cents").alias("cents"),
        (F.col("dr.sign") * F.col("ds.sign")).alias("sign"),
    )

    # --- unmatched part: ΔR landing outside K₂, plus the migrations
    # driven by key transitions (net dim sign per key) ---
    k2 = s2.select("c_custkey")
    t4 = out(
        dR.join(k2, dR.o_custkey == k2.c_custkey, "left_anti"),
        F.lit(NONE),
        F.col("sign"),
    )
    net = dS.groupBy("c_custkey").agg(F.sum("sign").alias("net"))
    removed = net.filter(F.col("net") == -1).select("c_custkey")
    added = net.filter(F.col("net") == 1).select("c_custkey")
    t5 = out(
        r1.join(removed, r1.o_custkey == removed.c_custkey),
        F.lit(NONE),
        F.lit(1),
    )
    t6 = out(
        r1.join(added, r1.o_custkey == added.c_custkey),
        F.lit(NONE),
        F.lit(-1),
    )

    delta = (
        t1.unionByName(t2)
        .unionByName(t3)
        .unionByName(t4)
        .unionByName(t5)
        .unionByName(t6)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * F.col("cents")).alias("ds_"),
        )
    )
    st, d = state1.alias("st"), delta.alias("d")
    return (
        st.join(d, ["c_mktsegment", "o_orderstatus"], "full_outer")
        .select(
            "c_mktsegment",
            "o_orderstatus",
            (
                F.coalesce(F.col("st.n"), F.lit(0))
                + F.coalesce(F.col("d.dn"), F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(F.col("st.s"), F.lit(0))
                + F.coalesce(F.col("d.ds_"), F.lit(0))
            ).alias("cents_sum"),
        )
        .filter(F.col("n_rows") > 0)
    )


@query(
    "ivm_minmax_support",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 11 != 5)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM v2 GROUP BY o_orderstatus
    """,
)
def ivm_minmax_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for MIN/MAX — the remaining textbook non-distributive case
    (completing the family: additive sums, top-k affected-group,
    COUNT(DISTINCT) support-transition, outer-join counting): a
    deletion only moves a group's MIN/MAX when it evicts the CURRENT
    extremum, and the replacement is whatever survives — information
    the view itself no longer holds. The standard refresh keeps a
    SUPPORT MULTISET γ(group, value → cnt), additive like any count,
    and re-derives extrema from it: per refresh the changeset
    aggregates to signed support deltas (delta-sized), only the
    TOUCHED groups' support rows merge them (semi-join — untouched
    groups' support is unchanged and unread), untouched groups keep
    their stored view rows (anti-join), and touched groups recompute
    MIN/MAX/COUNT from their merged support — |touched groups| ×
    |distinct values per group| work, never corpus-sized, and far
    smaller than the affected-group-recompute fallback
    (``ivm_topk_affected_groups``) which must re-read base rows. The
    shared v1→v2 carving makes both hazards load-bearing: deletes
    (keys ≡5 mod 11) evict extrema and status flips (≡0 mod 13)
    migrate rows across groups; the oracle recomputes v2's MIN/MAX
    directly, so a refresh that kept a stale extremum cannot hash
    green. Certified identity: refresh(view(v1), Δ) ≡ recompute(v2)."""
    v1, v2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    v1 = v1.select("o_orderkey", "cents", "o_orderstatus")
    v2 = v2.select("o_orderkey", "cents", "o_orderstatus")

    delta = _signed_delta(
        v1, v2, "o_orderkey", ["cents", "o_orderstatus"]
    ).localCheckpoint(eager=True)

    # level-1 state: the support multiset; level-2: the stored view
    # (both standing tables at steady state — built once here)
    sup1 = (
        v1.groupBy("o_orderstatus", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    view1 = sup1.groupBy("o_orderstatus").agg(
        F.sum("cnt").alias("n"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
    )

    dsup = (
        delta.groupBy("o_orderstatus", "cents")
        .agg(F.sum("sign").alias("dc"))
        .filter(F.col("dc") != 0)
        .localCheckpoint(eager=True)  # feeds the touched set AND the merge
    )
    touched = dsup.select("o_orderstatus").distinct()

    kept = view1.join(touched, "o_orderstatus", "left_anti").select(
        "o_orderstatus",
        F.col("n").alias("n_rows"),
        F.col("mn").alias("min_cents"),
        F.col("mx").alias("max_cents"),
    )
    sup_t, d = (
        sup1.join(touched, "o_orderstatus", "left_semi").alias("sp"),
        dsup.alias("d"),
    )
    merged_sup = sup_t.join(
        d,
        (F.col("sp.o_orderstatus") == F.col("d.o_orderstatus"))
        & (F.col("sp.cents") == F.col("d.cents")),
        "full_outer",
    ).select(
        F.coalesce(F.col("sp.o_orderstatus"), F.col("d.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("sp.cents"), F.col("d.cents")).alias("cents"),
        (
            F.coalesce(F.col("sp.cnt"), F.lit(0)) + F.coalesce(F.col("d.dc"), F.lit(0))
        ).alias("cnt"),
    )
    recomputed = (
        merged_sup.filter(F.col("cnt") > 0)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    return kept.unionByName(recomputed).filter(F.col("n_rows") > 0)


@query(
    "ivm_median_support",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 11 != 5),
    ranked AS (
      SELECT o_orderstatus, cents,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM v2)
    SELECT o_orderstatus,
           CAST(n AS BIGINT) AS n_rows,
           CAST(cents AS BIGINT) AS median_cents
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def ivm_median_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for an ORDER STATISTIC — the same support multiset that
    maintains MIN/MAX (``ivm_minmax_support``) answers ANY exact
    quantile without ever re-reading base rows: per group the support
    is already (value → cnt), so the lower median is the smallest
    value whose running support count reaches ⌈n/2⌉ — a cumulative
    window over |distinct values per group| SUPPORT rows, not over
    the group's rows. The refresh is the standard two-path split:
    signed deltas aggregate to support deltas (delta-sized), only
    TOUCHED groups' support merges them and re-derives the median,
    untouched groups keep their stored view rows unread. The shared
    v1→v2 carving makes both hazards load-bearing (deletes shift
    medians, status flips migrate rows across groups); the oracle
    recomputes v2's per-status lower median directly via an explicit
    rank expression (deterministic for ties — equal cents at the
    median position give the same value regardless of tie order), so
    a refresh that kept one stale median cannot hash green. Scale:
    the median re-derivation is |touched groups| × |distinct values
    per group| — the regime where a sorted-run recompute over raw
    rows would be group-sized, the support form is
    distinct-value-sized, and at 100 TB the support is the standing
    table the streaming MIN/MAX sink already maintains bucketed (this
    query certifies the algebra; the sink stores the state)."""
    v1, v2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    v1 = v1.select("o_orderkey", "cents", "o_orderstatus")
    v2 = v2.select("o_orderkey", "cents", "o_orderstatus")

    delta = _signed_delta(
        v1, v2, "o_orderkey", ["cents", "o_orderstatus"]
    ).localCheckpoint(eager=True)

    sup1 = (
        v1.groupBy("o_orderstatus", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )

    def median_from_support(sup: DataFrame) -> DataFrame:
        w_cum = (
            Window.partitionBy("o_orderstatus")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("o_orderstatus")
        c = sup.select(
            "o_orderstatus",
            "cents",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        # lower median: smallest value whose cumulative count reaches
        # (n+1) div 2 — INTEGER division (Spark's `/` is float and
        # would round even-n groups up to the UPPER median); rows are
        # support entries, so the window is |distinct values per
        # group|-sized
        hits = c.filter(F.col("cum") >= F.floor((F.col("n") + 1) / 2))
        return hits.groupBy("o_orderstatus").agg(
            F.max("n").cast("bigint").alias("n_rows"),
            F.min("cents").cast("bigint").alias("median_cents"),
        )

    view1 = median_from_support(sup1)

    dsup = (
        delta.groupBy("o_orderstatus", "cents")
        .agg(F.sum("sign").alias("dc"))
        .filter(F.col("dc") != 0)
        .localCheckpoint(eager=True)
    )
    touched = dsup.select("o_orderstatus").distinct()

    kept = view1.join(touched, "o_orderstatus", "left_anti")
    sup_t, d = (
        sup1.join(touched, "o_orderstatus", "left_semi").alias("sp"),
        dsup.alias("d"),
    )
    merged_sup = sup_t.join(
        d,
        (F.col("sp.o_orderstatus") == F.col("d.o_orderstatus"))
        & (F.col("sp.cents") == F.col("d.cents")),
        "full_outer",
    ).select(
        F.coalesce(F.col("sp.o_orderstatus"), F.col("d.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("sp.cents"), F.col("d.cents")).alias("cents"),
        (
            F.coalesce(F.col("sp.cnt"), F.lit(0)) + F.coalesce(F.col("d.dc"), F.lit(0))
        ).alias("cnt"),
    )
    recomputed = median_from_support(merged_sup.filter(F.col("cnt") > 0))
    return kept.unionByName(recomputed).filter(F.col("n_rows") > 0)


def _sparse_version(o: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Sparse second version for the non-distributive IVM query: v2
    bumps cents on keys ≡0 mod 97 (an update that can INSERT a row
    into a group's top-k) and drops keys ≡1 mod 197 (a delete that
    can EVICT one) — ~1.5% of keys change, so the affected-group set
    is a small fraction of all groups, the regime where
    affected-group recompute beats full recompute."""
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    v2 = base.withColumn(
        "cents",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("cents") + 100000
        ).otherwise(F.col("cents")),
    ).filter(F.col("o_orderkey") % 197 != 1)
    return base, v2


@query(
    "ivm_topk_affected_groups",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 97 = 0 THEN 100000 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 197 != 1)
    SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk, o_orderkey, cents
    FROM (
      SELECT o_custkey, o_orderkey, cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY cents DESC, o_orderkey) AS rnk
      FROM v2) t
    WHERE rnk <= 3
    """,
)
def ivm_topk_affected_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for a NON-DISTRIBUTIVE aggregate — the case the additive
    family (counts/sums, ``ivm_apply_changeset``) cannot express: a
    per-customer top-3-orders-by-cents view. Deletes are not
    subtractable from a top-k (evicting the current #1 needs the #4
    the view no longer holds), so the standard practical refresh is
    AFFECTED-GROUP RECOMPUTE: diff the versions, mark only the groups
    the changeset touches (old AND new group of every changed row),
    keep the stored view's rows for every untouched group
    (anti-join), and recompute just the touched groups from the new
    base (semi-join → rank window). The sparse carving changes ~1.5%
    of keys, so ~97% of the output flows through the KEPT path — the
    oracle recomputes the whole view directly, so a wrong keep/
    recompute split cannot hash green. Updates that push a row INTO
    the top-3 and deletes that EVICT from it are both present by
    construction. Scale: refresh cost is |affected groups| × group
    size + one changeset diff — not corpus-sized; the rank window
    partitions by customer (no global sort), and at 100 TB the
    stored view is read, not rebuilt (the demo materializes state1
    once via localCheckpoint to stand in for the stored table)."""
    v1, v2 = _sparse_version(load_table(spark, sf_dir, "orders"))

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("cents").desc(), F.col("o_orderkey")
    )

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "o_custkey",
                F.row_number().over(w).cast("bigint").alias("rnk"),
                "o_orderkey",
                "cents",
            )
            .filter(F.col("rnk") <= 3)
        )

    # the standing view (at scale: a stored table, scanned not rebuilt)
    state1 = topk(v1).localCheckpoint(eager=True)

    # changeset diff → the affected-group set (old + new group of every
    # changed key; here the group key never changes, but the union form
    # is the general contract)
    delta = _signed_delta(v1, v2, "o_orderkey", ["o_custkey", "cents"])
    affected = delta.select("o_custkey").distinct().localCheckpoint(eager=True)

    kept = state1.join(affected, "o_custkey", "left_anti")
    recomputed = topk(v2.join(affected, "o_custkey", "left_semi"))
    return kept.unionByName(recomputed)


@query(
    "ivm_distinct_count_support",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 11 != 5)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_cust
    FROM v2 GROUP BY o_orderstatus
    """,
)
def ivm_distinct_count_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for a DUPLICATE-SENSITIVE aggregate — COUNT(DISTINCT) is
    not additive (a retraction only lowers the distinct count when it
    removes the LAST supporting row), so the textbook refresh keeps
    TWO levels of state: a support table γ(group, value → n), which
    IS additive and absorbs signed deltas like any count, and the
    view, whose distinct-count moves only on support 0↔positive
    TRANSITIONS. Per refresh: the changeset aggregates to signed
    support deltas (delta-sized), each touched support joins its old
    count, and the view delta per group is Σ(+1 for 0→>0, −1 for
    >0→0) with the row count moving additively — work tracks the
    CHANGE, never the corpus; the v1→v2 carving moves rows across
    groups (status flips) so both transition directions and the
    group migrations are load-bearing. Certified identity:
    merge(view(v1), Σ± transitions) ≡ recompute(v2) — the oracle
    computes v2's COUNT(DISTINCT) directly. Scale: one keyed diff +
    one (group,value) partial-agg shuffle over the delta + a
    touched-support-sized join against the stored support table
    (index-friendly: equi on (group, value)); the view merge is
    |groups|-row."""
    v1, v2 = _snapshot_versions(load_table(spark, sf_dir, "orders"))
    v1 = v1.select("o_orderkey", "o_custkey", "o_orderstatus")
    v2 = v2.select("o_orderkey", "o_custkey", "o_orderstatus")

    delta = _signed_delta(
        v1, v2, "o_orderkey", ["o_custkey", "o_orderstatus"]
    ).localCheckpoint(eager=True)

    # level-1 state: additive supports; level-2 state: the view
    # (each support row is ≥1 distinct customer by construction)
    sup1 = v1.groupBy("o_orderstatus", "o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=True)
    view1 = sup1.groupBy("o_orderstatus").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("d"),
    )

    dsup = (
        delta.groupBy("o_orderstatus", "o_custkey")
        .agg(F.sum("sign").alias("dc"))
        .filter(F.col("dc") != 0)
    )
    ds_, sp = dsup.alias("ds"), sup1.alias("sp")
    trans = ds_.join(
        sp,
        (F.col("ds.o_orderstatus") == F.col("sp.o_orderstatus"))
        & (F.col("ds.o_custkey") == F.col("sp.o_custkey")),
        "left",
    ).select(
        F.col("ds.o_orderstatus").alias("o_orderstatus"),
        F.coalesce(F.col("sp.cnt"), F.lit(0)).alias("old"),
        (F.coalesce(F.col("sp.cnt"), F.lit(0)) + F.col("ds.dc")).alias("new"),
        F.col("ds.dc").alias("dc"),
    )
    ddelta = trans.groupBy("o_orderstatus").agg(
        F.sum("dc").alias("dn"),
        F.sum(
            F.when((F.col("new") > 0) & (F.col("old") == 0), 1)
            .when((F.col("new") == 0) & (F.col("old") > 0), -1)
            .otherwise(0)
        ).alias("dd"),
    )
    vw, d = view1.alias("vw"), ddelta.alias("d")
    return (
        vw.join(d, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            (
                F.coalesce(F.col("vw.n"), F.lit(0))
                + F.coalesce(F.col("d.dn"), F.lit(0))
            ).alias("n_rows"),
            (
                F.coalesce(F.col("vw.d"), F.lit(0))
                + F.coalesce(F.col("d.dd"), F.lit(0))
            ).alias("n_distinct_cust"),
        )
        .filter(F.col("n_rows") > 0)
    )
