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


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once incremental ingest: restarting a file-source query
    on the same checkpoint skips files already committed and processes
    only newly arrived ones."""
    import os

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    events_file = os.path.join(SF_DIR, "events.parquet")
    os.symlink(events_file, src / "e1.parquet")

    out = str(tmp_path / "out")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_file).schema

    def run_once() -> int:
        stream = spark.readStream.schema(schema).parquet(str(src)).select("event_id")
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(out).count()

    n_total = spark.read.parquet(events_file).count()
    assert run_once() == n_total  # first run: everything

    os.symlink(events_file, src / "e2.parquet")  # a "new" file arrives
    # second run, same checkpoint: only the new file is appended
    # (2N, not 3N — e1 is committed in the checkpoint and skipped)
    assert run_once() == 2 * n_total
