"""Structured Streaming over the events table.

The reference is a pure batch pipeline (SURVEY.md §2.10) — the
engine's exact-resume posture mirrors Structured Streaming's
commit-log pattern via sources/lineage.py. This module demonstrates
the genuine streaming surface for users who feed clips/events
incrementally:

  - windowed_event_counts: tumbling event-time window + watermark agg
  - run_stream_once: drive a parquet-directory stream to completion
    synchronously (memory sink) — the local smoke-test harness

The same transformations run identically in batch (see
queries_catalog.q_time_buckets, the batch twin of the windowed agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling window agg with late-data watermark; works on both a
    streaming and a batch DataFrame."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_stream_once(spark: SparkSession, events_dir: str, query_name: str = "ev_out") -> DataFrame:
    """Drive a file-source stream to completion (one pass over the
    directory) and return the materialized result."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
