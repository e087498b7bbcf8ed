"""User-journey analytics over the events stream: first-order Markov
transition matrix, session path signatures, time-weighted averages
(trapezoidal-style integration over event time), and the forward
as-of join ("time to next X").

The reference has no event data at all — this suite extends SURVEY
§2.6/§2.7 (windows) and §2.4 (as-of joins) with the product-analytics
vocabulary a training-data/feature pipeline needs (funnel/retention
cousins live in ``evolve_q``/``pipeline_q``).

Scale notes (100 TB posture): every query here partitions by
``user_id`` — per-user windows sort locally after ONE shuffle, no
global sort anywhere. Transition counting and path signatures reduce
per-user sequences to (state, next) pairs / bounded path strings
before the second (tiny) aggregation shuffle. The forward as-of join
is the union+window idiom from ``operators.joins`` — one shuffle on
the key, versus the quadratic per-left-row range join. Session paths
are bounded by the 30-minute gap rule, so no path string grows with
corpus size.

Determinism: per-user ordering ties broken by ``event_id``
everywhere; probabilities/averages are plain double divisions with
identical operand trees on both engines, rounded at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.operators.joins import asof_join_forward
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

SESSION_GAP_US = 1_800_000_000  #: 30-minute inactivity gap (microseconds)
PATH_TOPK = 25
ASOF_TOL_SECONDS = 3600  #: forward as-of tolerance: next purchase within 1 h


@query(
    "markov_event_transitions",
    oracle="""
    WITH nxt AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (SELECT event_type, next_type, COUNT(*) AS n
          FROM nxt WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type)
    SELECT event_type, next_type, n,
           round(n / CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT), 10) AS p
    FROM c
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    (state, next-state) pair, the observed count and the row-
    normalized transition probability. The lead() is per-user (one
    shuffle, local sort); the |states|² matrix is a tiny second
    aggregate. At 100 TB the pair stream is already reduced map-side
    by partial aggregation — nothing user-sized ever concentrates."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 10).alias("p"),
    )


@query(
    "session_path_signatures",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US} THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged),
    paths AS (
      SELECT user_id, session_no,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM numbered GROUP BY user_id, session_no)
    SELECT path, COUNT(*) AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT {PATH_TOPK}
    """,
)
def session_path_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common whole-session event-type paths ('view>click>
    purchase'): sessionize with the 30-minute gap rule (gaps-and-
    islands — the same session definition ``sessionize_events`` pins
    against session_window), concatenate each session's ordered event
    types, count signatures. Paths are bounded by session length, so
    the signature aggregate's keys stay small; the heavy work is the
    per-user window, one shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > SESSION_GAP_US, 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn("session_no", F.sum("new_session").over(run))
    paths = (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return paths.orderBy(F.desc("n_sessions"), "path").limit(PATH_TOPK)


@query(
    "time_weighted_avg_value",
    oracle="""
    WITH d AS (
      SELECT user_id, value, epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_us
      FROM events),
    iv AS (SELECT user_id, value, (next_us - us) AS dur_us
           FROM d WHERE next_us IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           round(CAST(SUM(dur_us) AS BIGINT) / 1000000.0, 6) AS total_sec,
           round(CAST(SUM(CAST(round(value * (dur_us / 1000000.0), 6)
                               AS DECIMAL(28,6))) AS DOUBLE)
                 / (CAST(SUM(dur_us) AS BIGINT) / 1000000.0), 8) AS tw_avg
    FROM iv GROUP BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user: each reading is
    held until the next event (step interpolation), so the average
    weights each value by its holding duration — the standard
    irregular-time-series statistic a plain AVG gets wrong. Per-user
    lead() = one shuffle; weighted terms are rounded to 6 dp and
    decimal-summed so both engines add exactly, then one double
    division at the end."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).where(F.col("next_us").isNotNull())
    iv = d.select("user_id", "value", (F.col("next_us") - F.col("us")).alias("dur_us"))
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum("dur_us") / F.lit(1000000.0), 6).alias("total_sec"),
        F.round(
            F.sum(
                F.round(F.col("value") * (F.col("dur_us") / F.lit(1000000.0)), 6).cast(
                    "decimal(28,6)"
                )
            ).cast("double")
            / (F.sum("dur_us") / F.lit(1000000.0)),
            8,
        ).alias("tw_avg"),
    )


@query(
    "asof_forward_error_purchase",
    oracle=f"""
    WITH err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
    pur AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT e.event_id, e.user_id,
           p.event_id AS pur_event_id,
           round((epoch_us(p.ts) - epoch_us(e.ts)) / 1000000.0, 6) AS wait_sec,
           p.value AS pur_value
    FROM err e LEFT JOIN LATERAL (
      SELECT event_id, ts, value FROM pur p
      WHERE p.user_id = e.user_id AND p.ts >= e.ts
        AND epoch_us(p.ts) - epoch_us(e.ts) <= {ASOF_TOL_SECONDS * 1_000_000}
      ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE
    """,
)
def asof_forward_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every error event, the user's next
    purchase within one hour (event id, wait seconds, value) — "does
    an error precede conversion, and how fast". Uses
    ``operators.joins.asof_join_forward`` (union + per-key
    current→following window): one shuffle on user_id, versus the
    per-error range join the lateral-subquery formulation would plan.
    The DuckDB oracle IS that independent lateral formulation, so the
    check is cross-shape, not just cross-engine."""
    e = load_table(spark, sf_dir, "events")
    err = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    pur = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join_forward(
        err,
        pur.withColumnRenamed("event_id", "pe_id").withColumnRenamed("value", "pv"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["pe_id", "pv"],
        right_tie="pe_id",
        tolerance_seconds=ASOF_TOL_SECONDS,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_pe_id").alias("pur_event_id"),
        F.round((F.unix_micros("asof_ts") - F.unix_micros("ts")) / F.lit(1000000.0), 6).alias(
            "wait_sec"
        ),
        F.col("asof_pv").alias("pur_value"),
    )


HAZARD_HORIZON = 14  #: day offsets reported (0..H)


@query(
    "journey_conversion_hazard",
    oracle=f"""
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > v.t_view
          GROUP BY e.user_id),
    delay AS (SELECT v.user_id,
                     CAST(date_diff('day', CAST(v.t_view AS DATE),
                                    CAST(p.t_purchase AS DATE)) AS INTEGER)
                       AS d
              FROM v LEFT JOIN p USING (user_id)),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM delay),
    days AS (SELECT unnest(generate_series(0, {HAZARD_HORIZON})) AS day),
    ev AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS n_events
           FROM delay WHERE d IS NOT NULL AND d <= {HAZARD_HORIZON}
           GROUP BY d),
    cum AS (SELECT days.day,
                   (SELECT COALESCE(SUM(e2.n_events), 0) FROM ev e2
                    WHERE e2.day < days.day) AS converted_before
            FROM days)
    SELECT c.day,
           COALESCE(e.n_events, 0) AS n_converting,
           -- BIGINT cast: converted_before is a SUM → HUGEINT in
           -- DuckDB, and int128 finals hit the driver-canonicalization
           -- hazard (the r5 red class)
           CAST(n.total - c.converted_before AS BIGINT) AS n_at_risk,
           round(CAST(COALESCE(e.n_events, 0) AS DOUBLE)
                 / (n.total - c.converted_before), 6) AS hazard
    FROM cum c LEFT JOIN ev e USING (day) CROSS JOIN n
    WHERE n.total - c.converted_before > 0
    """,
)
def journey_conversion_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete time-to-conversion hazard (the survival-analysis view
    of the funnel): for each day offset d since a user's first view,
    how many converted exactly then (first purchase strictly after
    the view) out of everyone still unconverted — h(d) = events(d) /
    at-risk(d), never-converters staying at risk through the
    {HAZARD_HORIZON}-day horizon; days whose risk set has emptied are
    excluded (hazard undefined — and an ANSI-mode division-by-zero
    otherwise: the driver's session runs ANSI, so the guard is a
    correctness requirement, not cosmetics). All counts are integers
    and the hazard one rounded division, so cross-engine parity is exact
    with no cumulative-product float hazard (at-risk is total minus
    conversions BEFORE d, a dominance sum over the bounded
    {HAZARD_HORIZON + 1}-row day spine — no unpartitioned window).
    Scale: two per-user aggregates (key-only shuffles) and a
    spine-sized broadcast join; the fact table is scanned twice."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    delay = v.join(p, "user_id", "left").select(
        "user_id",
        F.datediff(
            F.col("t_purchase").cast("date"), F.col("t_view").cast("date")
        ).cast("int").alias("d"),
    )
    total = delay.agg(F.count(F.lit(1)).alias("total"))
    ev = (
        delay.filter(F.col("d").isNotNull() & (F.col("d") <= HAZARD_HORIZON))
        .groupBy(F.col("d").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)  # spine-sized; reused by 2 joins
    )
    days = spark.range(0, HAZARD_HORIZON + 1).select(F.col("id").cast("int").alias("day"))
    cum = (
        days.alias("a")
        .join(F.broadcast(ev.alias("b")), F.col("b.day") < F.col("a.day"), "left")
        .groupBy(F.col("a.day").alias("day"))
        .agg(F.coalesce(F.sum("b.n_events"), F.lit(0)).alias("converted_before"))
    )
    return (
        cum.join(F.broadcast(ev), "day", "left")
        .crossJoin(F.broadcast(total))
        .filter(F.col("total") - F.col("converted_before") > 0)
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_converting"),
            (F.col("total") - F.col("converted_before")).alias("n_at_risk"),
            F.round(
                F.coalesce("n_events", F.lit(0)).cast("double")
                / (F.col("total") - F.col("converted_before")),
                6,
            ).alias("hazard"),
        )
    )


ATTR_LOOKBACK_MIN = 30  #: touch window before each purchase


@query(
    "attribution_position_weighted",
    oracle=f"""
    WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts, value
               FROM events WHERE event_type = 'purchase'),
    t AS (SELECT event_id AS t_id, user_id, ts AS t_ts, event_type
          FROM events WHERE event_type IN ('view', 'click', 'signup')),
    touch AS (
      SELECT p.p_id, p.value, t.event_type, t.t_ts, t.t_id
      FROM p JOIN t ON p.user_id = t.user_id
        AND t.t_ts >= p.p_ts - INTERVAL {ATTR_LOOKBACK_MIN} MINUTE
        AND t.t_ts < p.p_ts),
    ranked AS (
      SELECT p_id, value, event_type,
             row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS pos,
             COUNT(*) OVER (PARTITION BY p_id) AS n
      FROM touch),
    w AS (
      SELECT event_type, value,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN pos = 1 OR pos = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS wt
      FROM ranked)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(CAST(round(value * wt, 6) AS DECIMAL(18,6))) AS DOUBLE)
             AS attributed_value
    FROM w GROUP BY event_type
    """,
)
def attribution_position_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    purchase's value is split across the view/click/signup touches in
    its {ATTR_LOOKBACK_MIN}-minute lookback — 40% to first touch, 40%
    to last, 20% shared by the middles (1.0 / 0.5-0.5 for 1- and
    2-touch paths) — and attributed value rolls up per touch type.
    The standard marketing-attribution shape between last-touch
    (``join_asof_last_error``) and Markov (``markov_event_transitions``).
    Parity: weights are CASE rationals with the identical operand
    tree on both engines; per-touch contributions are rounded to 6 dp
    then decimal-summed (order-free). Scale: ONE shuffle on user_id
    for the touch join (equi-key + time-range predicate — never a
    cartesian), per-purchase windows partition by purchase id; the
    report is |touch types| rows."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = e.filter(F.col("event_type").isin("view", "click", "signup")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    touch = p.join(t, "user_id").filter(
        (F.col("t_ts") >= F.col("p_ts") - F.expr(f"interval {ATTR_LOOKBACK_MIN} minutes"))
        & (F.col("t_ts") < F.col("p_ts"))
    )
    wpos = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    ranked = touch.select(
        "p_id",
        "value",
        "event_type",
        F.row_number().over(wpos).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("p_id")).alias("n"),
    )
    wt = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        ranked.select("event_type", "value", wt.alias("wt"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(
                F.round(F.col("value") * F.col("wt"), 6).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("attributed_value"),
        )
    )
