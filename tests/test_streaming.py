"""Streaming ≡ batch: each streaming operator applied to the same
events data as a readStream must produce exactly the rows of its
batch twin (one logical plan, two execution modes)."""

from __future__ import annotations

from epe_data_wrangling_spark.sources.tables import load_table
from epe_data_wrangling_spark.streaming import ops
from epe_data_wrangling_spark.streaming.sources import stream_events

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_tumbling_stream_matches_batch(spark):
    batch = ops.tumbling_counts(load_table(spark, SF_DIR, "events"))
    stream = ops.run_to_memory(
        ops.tumbling_counts(stream_events(spark, SF_DIR)), "t_tumbling"
    )
    assert _rows(stream) == _rows(batch)


def test_session_stream_matches_batch(spark):
    batch = ops.session_counts(load_table(spark, SF_DIR, "events"))
    stream = ops.run_to_memory(
        ops.session_counts(stream_events(spark, SF_DIR)), "t_sessions"
    )
    assert _rows(stream) == _rows(batch)


def test_dedup_stream_matches_batch(spark):
    events = load_table(spark, SF_DIR, "events")
    batch = ops.dedup_keys_within_watermark(events, ["user_id", "event_type"])
    stream = ops.run_to_memory(
        ops.dedup_keys_within_watermark(
            stream_events(spark, SF_DIR), ["user_id", "event_type"]
        ),
        "t_dedup",
        output_mode="append",
    )
    assert _rows(stream) == _rows(batch)


def test_stateful_user_stats_matches_groupby(spark):
    from pyspark.sql import functions as F

    events = load_table(spark, SF_DIR, "events")
    batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("max_ts")
    )
    stream = ops.run_to_memory(
        ops.user_stats_stateful(stream_events(spark, SF_DIR)).select(
            "user_id", "n_events", "max_ts"
        ),
        "t_user_stats",
        output_mode="update",
    )
    assert _rows(stream) == _rows(batch)
