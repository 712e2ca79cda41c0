"""Incremental re-index (change detection) + Structured Streaming
ingestion."""

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tlgs_spark.corpus import generate_pandas
from tlgs_spark.indexer.build import build_index
from tlgs_spark.indexer.storage import IndexStorage


def _spark_df(spark, pdf):
    return spark.createDataFrame(pdf)


def test_incremental_update_rebuilds_only_changed_shards(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx")
    pdf = generate_pandas(20)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=6, lineage="v1")

    # v2: edit the text of ONE conversation (≈ one doc range region)
    pdf2 = pdf.copy()
    mask = pdf2.conv_id == "conv000003"
    pdf2.loc[mask, "text"] = pdf2.loc[mask, "text"] + " edited"
    res = incremental_update(spark, _spark_df(spark, pdf2), idx, n_shards=6)
    assert res["changed"] and res["reused"]
    assert len(res["changed"]) < 6  # not a full rebuild

    # final index must equal a fresh full build byte-for-byte
    fresh = str(tmp_path / "fresh")
    build_index(spark, _spark_df(spark, pdf2), fresh, n_shards=6, lineage="v2")
    a = (
        IndexStorage(idx).read(spark, "postings")
        .select("shard", "term", "df", "postings")
        .toPandas().sort_values(["shard", "term"]).reset_index(drop=True)
    )
    b = (
        IndexStorage(fresh).read(spark, "postings")
        .select("shard", "term", "df", "postings")
        .toPandas().sort_values(["shard", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # ledger records reuse vs rebuild
    led = IndexStorage(idx).read(spark, "ledger").toPandas()
    assert set(led[led.status == "reused"].shard) == set(res["reused"])


def test_incremental_noop_reuses_everything(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx2")
    pdf = generate_pandas(10)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=4)
    res = incremental_update(spark, _spark_df(spark, pdf), idx, n_shards=4)
    assert res["changed"] == []
    assert len(res["reused"]) == 4
    # regression (r2 ADVICE, high): the all-reused path must still
    # finalize — term_stats present, no -1 placeholders, index opens
    st = IndexStorage(idx)
    assert st.exists("term_stats")
    stats = st.read(spark, "collection_stats").collect()[0]
    assert stats.n_terms > 0 and stats.n_postings > 0
    from tlgs_spark.query.engine import SearchIndex

    si = SearchIndex(spark, idx)
    hits = si.search("the conversation", k=3)
    assert list(hits.columns[:2]) == ["doc_id", "score"]


def test_finalize_self_heals_minus_one_stats(spark, tmp_path):
    """Kill window between the term_stats write and the
    collection_stats rewrite: resume with built==0 must still rerun
    finalize (r2 ADVICE, medium)."""
    idx = str(tmp_path / "idx_heal")
    pdf = generate_pandas(10)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=2)
    st = IndexStorage(idx)
    # simulate the kill: reset collection_stats to the in-flight
    # placeholder while term_stats (already written) survives
    row = st.read(spark, "collection_stats").collect()[0]
    placeholder = spark.createDataFrame(
        [(int(row.n_docs), int(row.total_dl), -1, -1, float(row.avgdl))],
        "n_docs long, total_dl long, n_terms long, n_postings long, avgdl double",
    )
    st.write(placeholder, "collection_stats")
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=2, resume=True)
    healed = st.read(spark, "collection_stats").collect()[0]
    assert healed.n_terms == row.n_terms and healed.n_postings == row.n_postings


def test_streaming_windowed_counts(spark, tmp_path):
    from tlgs_spark.streaming.ingest import read_turn_stream, run_available_now, turn_rate_stream

    src = str(tmp_path / "src")
    pdf = generate_pandas(8)
    _spark_df(spark, pdf).write.mode("overwrite").parquet(src)
    stream = turn_rate_stream(read_turn_stream(spark, src))
    run_available_now(stream, str(tmp_path / "ckpt"), "turn_rates")
    got = spark.sql("SELECT * FROM turn_rates").toPandas()
    # batch equivalence: same agg computed statically
    exp = (
        _spark_df(spark, pdf)
        .groupBy(F.window("ts", "1 minute").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"), F.sum(F.length("text")).alias("chars"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns", "chars")
        .toPandas()
    )
    g = got[["window_start", "role", "n_turns", "chars"]].sort_values(
        ["window_start", "role"]).reset_index(drop=True)
    e = exp.sort_values(["window_start", "role"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)


def test_streaming_landing_exactly_once(spark, tmp_path):
    from tlgs_spark.streaming.ingest import land_new_turns

    src = str(tmp_path / "src2")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt2")
    pdf = generate_pandas(5)
    _spark_df(spark, pdf).write.mode("overwrite").parquet(src)
    land_new_turns(spark, src, landing, ckpt)
    n1 = spark.read.parquet(landing).count()
    assert n1 == len(pdf)
    # re-running with the same checkpoint must NOT duplicate rows
    land_new_turns(spark, src, landing, ckpt)
    assert spark.read.parquet(landing).count() == n1
    # new files get picked up incrementally
    pdf2 = generate_pandas(3, start=100)
    _spark_df(spark, pdf2).write.mode("append").parquet(src)
    land_new_turns(spark, src, landing, ckpt)
    assert spark.read.parquet(landing).count() == n1 + len(pdf2)


def test_incremental_reuses_zero_posting_shard(spark, tmp_path):
    """A reused shard whose doc range produced zero postings (no
    partition dir) must not crash the copy step."""
    import pyspark.sql.functions as F

    from tlgs_spark.indexer.build import build_index
    from tlgs_spark.streaming.incremental import incremental_update

    rows = []
    for i in range(20):
        text = f"alpha tok{i}" if i < 10 else "the and of a"  # shard 1 empty
        rows.append((f"c{i:04d}", 0, "user", text, None))
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    # pinned ts: the delta diff is metadata-aware — current_timestamp()
    # re-evaluates per action and would classify every row as edited
    idx = str(tmp_path / "idx_inc0")
    build_index(spark, sdf, idx, n_shards=2)
    res = incremental_update(spark, sdf, idx, n_shards=2)
    assert res["reused"] == [0, 1] and res["changed"] == []


def test_incremental_reuse_is_metadata_level(spark, tmp_path):
    """r2: no staging-dir copy, no os.rename — a reused shard's
    postings files must be the SAME files (path + inode + mtime)
    after the update, and no .staging/.prev dirs may appear."""
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_meta")
    pdf = generate_pandas(20)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=6, lineage="v1")

    def snap(shard):
        d = os.path.join(idx, "postings", f"shard={shard}")
        return {
            f: (os.stat(os.path.join(d, f)).st_ino, os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }

    pdf2 = pdf.copy()
    mask = pdf2.conv_id == "conv000003"
    pdf2.loc[mask, "text"] = pdf2.loc[mask, "text"] + " edited"
    # snapshot every shard's files pre-update; diff after
    pre = {s: snap(s) for s in range(6) if os.path.isdir(os.path.join(idx, "postings", f"shard={s}"))}
    res = incremental_update(spark, _spark_df(spark, pdf2), idx, n_shards=6)
    assert res["changed"] and res["reused"]
    for s in res["reused"]:
        if s in pre:
            assert snap(s) == pre[s], f"reused shard {s} files were rewritten/copied"
    parent = os.path.dirname(idx)
    assert not any(".staging" in d or ".prev" in d for d in os.listdir(parent))


def test_stateful_session_stream_emits_on_gap(spark, tmp_path):
    """applyInPandasWithState sessionizer: a conversation whose last
    turn is gap+watermark behind the stream's max event time emits its
    summary with exact turn/char counts, then its state is gone."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F811

    from tlgs_spark.streaming.ingest import conversation_sessions_stream

    src = str(tmp_path / "sess_src")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def frame(rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )

    # file 1: conversation A, two turns at t0 and t0+1min
    frame([
        ("convA", 0, "user", "hello there", None, t0),
        ("convA", 1, "assistant", "hi", None, t0 + dt.timedelta(minutes=1)),
    ]).coalesce(1).write.mode("overwrite").parquet(src)
    # files 2,3: conversation B hours later — advances the watermark
    # far past A's gap, and gives the engine a batch AFTER the
    # watermark move in which A's timeout fires
    frame([("convB", 0, "user", "late batch", None, t0 + dt.timedelta(hours=2))]) \
        .coalesce(1).write.mode("append").parquet(src)
    frame([("convB", 1, "user", "even later", None, t0 + dt.timedelta(hours=3))]) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = conversation_sessions_stream(stream, gap_minutes=30)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.conv_id: r for r in spark.sql("SELECT * FROM sessions_out").collect()}
    assert "convA" in rows
    a = rows["convA"]
    assert a.n_turns == 2 and a.n_chars == len("hello there") + len("hi")
    assert a.first_ts == t0 and a.last_ts == t0 + dt.timedelta(minutes=1)


def test_stream_to_incremental_index_refresh(spark, tmp_path):
    """End-to-end 'crawl → index refresh': file-stream lands turns
    exactly-once, the index builds from the landing area, new files
    land, incremental_update picks up ONLY the changed shards, and
    the refreshed index serves the new content."""
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.streaming.incremental import incremental_update
    from tlgs_spark.streaming.ingest import land_new_turns

    src = str(tmp_path / "e2e_src")
    landing = str(tmp_path / "e2e_landing")
    ckpt = str(tmp_path / "e2e_ckpt")
    idx = str(tmp_path / "e2e_idx")

    pdf = generate_pandas(12)
    _spark_df(spark, pdf).write.mode("overwrite").parquet(src)
    land_new_turns(spark, src, landing, ckpt)
    build_index(spark, spark.read.parquet(landing), idx, n_shards=4)

    # new conversation arrives on the stream
    extra = generate_pandas(1, start=500)
    extra["text"] = extra["text"] + " freshmarker"
    _spark_df(spark, extra).write.mode("append").parquet(src)
    land_new_turns(spark, src, landing, ckpt)

    res = incremental_update(spark, spark.read.parquet(landing), idx, n_shards=4)
    assert res["reused"]  # most shards untouched
    si = SearchIndex(spark, idx)
    hits = si.search("freshmarker", k=5)
    assert len(hits) > 0
