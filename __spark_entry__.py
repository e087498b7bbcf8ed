"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``epe_data_wrangling_spark.catalog``: every
implemented operator from SURVEY.md §2 (plus the north-star
extensions) is a named catalog query with a paired DuckDB oracle;
this module re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from epe_data_wrangling_spark.catalog import all_queries, resolve_oracle

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "join_broadcast_star"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star join (orders ⨝ customer ⨝ nation ⨝ region, dims broadcast)
    with revenue aggregation — the shape the engine is optimized for.
    """
    return all_queries()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted ⇒ rows-only check)."""
    return {
        name: resolve_oracle(q)
        for name, q in all_queries().items()
        if q.oracle is not None
    }
