"""Bucketed co-located join: pre-partitioning both sides on the join
key at write time removes the join-time shuffle entirely — the
SURVEY §4.4 'reuse a partitioning across stages' story, proven on the
physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epe_data_wrangling_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    names = ("b_orders", "b_lineitem")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    (
        load_table(spark, SF_DIR, "orders")
        .write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .saveAsTable("b_lineitem")
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    joined = o.join(
        li, o.o_orderkey == li.l_orderkey
    ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty"))
    # force sort-merge so the bucket layout (not a broadcast) carries
    # the join, as it would at fact×fact scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin")[1]
    assert "Exchange hashpartitioning" not in join_part, join_part[:2000]

    # and it computes the right thing
    expect = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))
