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
        spark.read.parquet(os.path.join(idx, "postings"))
        .select("shard", "term", "df", "postings")
        .toPandas().sort_values(["shard", "term"]).reset_index(drop=True)
    )
    b = (
        spark.read.parquet(os.path.join(fresh, "postings"))
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
    ).withColumn("ts", F.current_timestamp())
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
