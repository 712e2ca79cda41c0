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
- stream_refresh_index: foreachBatch stream where every micro-batch
  IS a changelog for apply_changes() — index refresh with no
  full-corpus scan anywhere, idempotent across trigger retries.
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


def conversation_sessions_stream(turns: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``
    — the streaming twin of the batch sessionization entry
    (events_sessions): per-conversation running state (turn count,
    chars, first/last event time) accumulates across micro-batches;
    when the event-time watermark passes ``gap_minutes`` beyond a
    conversation's last turn, its session summary is emitted and the
    state cleared. State is flat longs (epoch ms) — no Python objects
    in the state store; each group's update touches only its Arrow
    batch. This is the (c)-tier custom-operator route the built-in
    windowed aggregates can't express (per-key gap semantics with
    explicit state lifecycle)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "conv_id string, n_turns long, n_chars long, "
        "first_ts timestamp, last_ts timestamp"
    )
    state_schema = "n_turns long, n_chars long, first_ms long, last_ms long"
    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, c, f, l = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "n_chars": [c],
                    "first_ts": [pd.to_datetime(f, unit="ms")],
                    "last_ts": [pd.to_datetime(l, unit="ms")],
                }
            )
            return
        n = c = 0
        f = l = None
        if state.exists:
            n, c, f, l = state.get
        for pdf in pdfs:
            if len(pdf) == 0:  # Arrow chunking may deliver empty frames
                continue
            n += len(pdf)
            c += int(pdf["text"].str.len().sum())
            ms = (pdf["ts"].astype("int64") // 1_000_000)
            mn, mx = int(ms.min()), int(ms.max())
            f = mn if f is None or mn < f else f
            l = mx if l is None or mx > l else l
        if l is None:  # nothing new this batch — keep state + timeout as-is
            return
        state.update((n, c, f, l))
        # end the session once the watermark passes last_ts + gap
        state.setTimeoutTimestamp(l + gap_ms)

    return (
        turns.withWatermark("ts", "10 minutes")
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_refresh_index(
    spark: SparkSession, source_dir: str, index_dir: str, checkpoint: str
) -> list[dict]:
    """Stream → changelog → index refresh, end to end: every micro-batch
    of newly-arrived turn files IS a changelog batch for
    ``apply_changes`` — the index stays current without a full-corpus
    scan anywhere (the ``incremental_update`` flow re-hashes the whole
    landing area per refresh; this path touches only the new rows plus
    one metadata scan of the committed docs).

    Effectively exactly-once: the streaming checkpoint replays a batch
    only if the trigger died before committing, and re-applying an
    already-applied batch is a NO-OP (``apply_changes`` drops upserts
    identical to the committed rows), so the crash window between the
    index's pointer commit and the stream's checkpoint commit converges
    to the same index state. Upstream must emit one row per
    (conv_id, turn_idx) per batch — duplicate keys fail loudly.

    Returns the per-batch apply_changes results (deterministic with
    trigger(availableNow); empty when no new files arrived).
    """
    from .incremental import apply_changes

    results: list[dict] = []

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        res = apply_changes(batch_df.sparkSession, batch_df, index_dir)
        res["batch_id"] = batch_id
        results.append(res)

    q = (
        read_turn_stream(spark, source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return results


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
