"""Reshape + multidimensional aggregation suite: unpivot (the
reference's core R1/R2 ops), pivot reconstruction (R6), ROLLUP/CUBE
(re-deriving the TOTAL rows the reference strips — SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from epe_data_wrangling_spark.catalog import CatalogQuery, make_registrar
from epe_data_wrangling_spark.catalog.core import dec
from epe_data_wrangling_spark.operators.reshape import pivot_wide, unpivot_regex
from epe_data_wrangling_spark.sources.tables import load_table

QUERIES: dict[str, CatalogQuery] = {}
query = make_registrar(QUERIES)

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH long AS (
      SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
    SELECT measure, COUNT(*) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM long GROUP BY measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (pivot_longer parity, `tratamento_epe.R:148` —
    R1) then aggregate. unpivot is a narrow op: no shuffle until the
    3-group aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    long = unpivot_regex(
        l.select("l_orderkey", "l_quantity", "l_discount", "l_tax"),
        id_cols=["l_orderkey"],
        name_pattern=r"^l_(quantity|discount|tax)$",
        var_name="measure",
        value_name="val",
    )
    return (
        long.groupBy("measure")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("val")).alias("_t"))
        .select("measure", "n", F.col("_t").cast("double").alias("total"))
    )


@query(
    "pivot_event_type_counts",
    oracle=f"""
    SELECT user_id % 10 AS user_bucket,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY user_id % 10
    """,
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with an explicit value list (R6; explicit
    values avoid the distinct discovery scan at scale)."""
    e = load_table(spark, sf_dir, "events").withColumn("user_bucket", F.col("user_id") % 10)
    return pivot_wide(
        e,
        group_cols=["user_bucket"],
        pivot_col="event_type",
        value_col="event_id",
        values=EVENT_TYPES,
        agg="count",
    )


@query(
    "rollup_region_nation_revenue",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP re-derives the hierarchy TOTAL rows the reference
    deletes from its source (`tratamento_epe.R:133-138` strips
    pre-computed totals so consumers recompute them — this is that
    recomputation, one shuffle, grouping-sets expansion map-side)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(dec("o_totalprice")).alias("_r"))
        .select("r_name", "n_name", "n_orders", F.col("_r").cast("double").alias("revenue"))
    )


@query(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims — all 4 grouping sets in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("o_totalprice")).alias("_r"))
        .select("o_orderstatus", "o_orderpriority", "n", F.col("_r").cast("double").alias("revenue"))
    )


@query(
    "pivot_multi_measure",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) END)
                AS DOUBLE) AS F_total,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
             AS F_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) END)
                AS DOUBLE) AS O_total,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT)
             AS O_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) END)
                AS DOUBLE) AS P_total,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT)
             AS P_n
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_multi_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure pivot (R6 extended): order status pivoted wide
    with TWO aggregates per cell (decimal-staged total + count),
    explicit pivot values so no discovery scan. Spark names pivot
    columns <value>_<agg-alias>; the oracle states the same cells as
    conditional aggregation — the spec, while pivot is the plan."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.col("F_total").cast("double").alias("F_total"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("F_n"),
        F.col("O_total").cast("double").alias("O_total"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("O_n"),
        F.col("P_total").cast("double").alias("P_total"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("P_n"),
    )
