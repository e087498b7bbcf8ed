"""Window-shaped operators: LOCF fill, grouped top-k, sessionization.

``locf`` is the engine form of the reference's only window operator
(zoo::na.locf0, `tratamento_epe.R:100,140` — W1/W2 in SURVEY §2.6):
forward-fill the last non-null value down an explicitly ordered,
partitioned frame; leading nulls remain null (locf0 semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def locf(
    col: Column | str,
    *,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
) -> Column:
    """Last-observation-carried-forward over an ordered window.

    Partitioning is mandatory: an unpartitioned LOCF would force a
    global sort through a single task. In the EPE pipeline the
    partition key is ``_sheet`` (SURVEY §4.3.1), so each sheet fills
    independently and in parallel.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = F.col(col) if isinstance(col, str) else col
    return F.last(c, ignorenulls=True).over(w)


def topk_per_group(
    df: DataFrame,
    *,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number. Callers must pass a
    deterministic (tie-broken) order_by."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    *,
    ts_col: str,
    key_cols: Sequence[str],
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign gap-based sessions and aggregate per session. Uses the
    native session_window operator — the identical code path works
    under Structured Streaming with a watermark."""
    return (
        df.groupBy(*key_cols, F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(*key_cols, "session_start", "session_end", "n_events")
    )
