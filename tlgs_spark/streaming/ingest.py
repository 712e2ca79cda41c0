"""Structured Streaming ingestion of transcript turns.

The reference crawls on a timer (systemd Wed/Sun,
systemd/tlgs_crawler.timer:5); the Spark-native equivalent is a
micro-batch stream over the landing area. Two provided jobs:

- turn_rate_stream: windowed turns/minute per role with a watermark
  (late turns beyond 10 min dropped) — the standard streaming-agg
  shape, used by tests via trigger(availableNow) for determinism.
- land_new_turns: file-source stream that appends raw turns into a
  landing parquet, checkpointed — the upstream of
  incremental_update(), giving end-to-end "crawl → index refresh".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import TRANSCRIPT_SCHEMA


def read_turn_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def turn_rate_stream(turns: DataFrame) -> DataFrame:
    """Tumbling 1-minute turn counts per role, 10-min watermark."""
    return (
        turns.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"), F.sum(F.length("text")).alias("chars"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "chars",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, out_table: str):
    """Drain everything currently available (deterministic for tests),
    complete-mode into an in-memory table."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def land_new_turns(spark: SparkSession, source_dir: str, landing_dir: str, checkpoint: str):
    """File-stream append into the landing area (exactly-once via the
    streaming checkpoint + parquet sink transaction log)."""
    turns = read_turn_stream(spark, source_dir)
    q = (
        turns.writeStream.outputMode("append")
        .format("parquet")
        .option("path", landing_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
