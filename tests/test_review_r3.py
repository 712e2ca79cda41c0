"""Round-3 self-review regressions: manifest consistency for direct
rebuilds, loud failures for corrupt snapshots / bad input keys, and
robust Spark byte-size conf parsing."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tlgs_spark.indexer.build import build_index
from tlgs_spark.indexer.storage import IndexStorage
from tlgs_spark.query.engine import SearchIndex
from tlgs_spark.streaming.incremental import incremental_update
from tlgs_spark.utils import parse_byte_size


def _corpus(spark, marker: str):
    rows = []
    for c in range(8):
        for t in range(6):
            rows.append((f"c{c:04d}", t, "user", f"alpha tok{t:02d} {marker}", None))
    # fixed ts: the delta diff is metadata-aware (a changed ts IS a changed
    # doc), so current_timestamp() here would mark every row edited on the
    # second generation and leave nothing to reuse
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.lit("2025-01-01 00:00:00")))


def test_parse_byte_size():
    assert parse_byte_size("134217728") == 134217728
    assert parse_byte_size("128m") == 128 << 20
    assert parse_byte_size("64MB") == 64 << 20
    assert parse_byte_size("1g") == 1 << 30
    assert parse_byte_size(" 5 kb ") == 5 << 10
    assert parse_byte_size("7b") == 7
    assert parse_byte_size("garbage", -1) == -1
    assert parse_byte_size("12q") is None
    assert parse_byte_size(None, 9) == 9


def test_fresh_rebuild_reconciles_stale_manifest(spark, tmp_path):
    """VERDICT-style scenario: incremental_update leaves a committed
    manifest mapping reused shards to old version dirs; a later DIRECT
    fresh rebuild into the same dir must remap the manifest to the
    shards it rewrote — otherwise readers/finalize silently serve the
    superseded postings against the new docs table."""
    idx = str(tmp_path / "idx_reconcile")
    build_index(spark, _corpus(spark, "roundone"), idx, n_shards=4)

    # incremental edit → versioned postings + manifest with reused refs
    edited = _corpus(spark, "roundone").withColumn(
        "text",
        F.when(F.col("conv_id") == "c0000", F.concat(F.col("text"), F.lit(" edit1")))
        .otherwise(F.col("text")),
    )
    res = incremental_update(spark, edited, idx)
    assert res["reused"], "expected reused shards to set up the manifest"
    st = IndexStorage(idx)
    man_before = st.read_postings_manifest()
    assert man_before is not None

    # DIRECT full rebuild with completely new text
    build_index(spark, _corpus(spark, "roundtwo"), idx, n_shards=4, resume=False)

    st2 = IndexStorage(idx)
    man_after = st2.read_postings_manifest()
    cur_rel = os.path.relpath(
        st2.table_dir("postings", st2.postings_version()), idx
    )
    assert man_after is not None
    assert all(rel.startswith(cur_rel) for rel in man_after.values()), man_after

    si = SearchIndex(spark, idx)
    assert len(si.search("roundtwo", k=5)) == 5
    assert len(si.search("roundone", k=5)) == 0  # old corpus fully gone
    # finalize stats rebuilt from the new postings, not the stale refs
    stats = st2.read(spark, "collection_stats").collect()[0]
    assert int(stats.n_docs) == 48 and int(stats.n_terms) > 0


def test_placeholder_arms_finalize_selfheal(spark, tmp_path):
    """A direct rebuild killed between the ledger append and finalize
    leaves every table present but stale; the -1 collection_stats
    placeholder (written before postings change) must make the next
    resume re-run finalize."""
    idx = str(tmp_path / "idx_heal")
    build_index(spark, _corpus(spark, "healme"), idx, n_shards=4)
    st = IndexStorage(idx)
    before = st.read(spark, "collection_stats").collect()[0]
    # simulate the kill window: placeholder present, tables otherwise fine
    st.write(
        spark.createDataFrame(
            [(-1, -1, -1, -1, 0.0)],
            "n_docs long, total_dl long, n_terms long, n_postings long, avgdl double",
        ),
        "collection_stats",
    )
    build_index(spark, _corpus(spark, "healme"), idx, n_shards=4, resume=True)
    after = IndexStorage(idx).read(spark, "collection_stats").collect()[0]
    assert int(after.n_terms) == int(before.n_terms) > 0
    assert int(after.n_docs) == int(before.n_docs)


def test_missing_manifest_shard_is_loud(spark, tmp_path):
    idx = str(tmp_path / "idx_loud")
    build_index(spark, _corpus(spark, "loudcheck"), idx, n_shards=4)
    edited = _corpus(spark, "loudcheck").withColumn(
        "text",
        F.when(F.col("conv_id") == "c0000", F.concat(F.col("text"), F.lit(" e")))
        .otherwise(F.col("text")),
    )
    incremental_update(spark, edited, idx)
    st = IndexStorage(idx)
    man = st.read_postings_manifest()
    assert man is not None
    # corrupt the snapshot: delete one referenced partition dir
    victim = os.path.join(idx, man[min(man)])
    assert os.path.isdir(victim)
    shutil.rmtree(victim)
    with pytest.raises(FileNotFoundError, match="manifest references missing"):
        st.read_postings(spark).count()
    # SearchIndex refuses the corrupt snapshot already at open
    with pytest.raises(FileNotFoundError, match="missing shard"):
        SearchIndex(spark, idx)


def test_one_file_per_shard_conf_parsing(spark, tmp_path):
    idx = str(tmp_path / "idx_conf")
    build_index(spark, _corpus(spark, "confcheck"), idx, n_shards=3)
    key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key)
    try:
        # '64m' is valid Spark syntax; the old int() parse fell back to
        # a hardcoded 128 MB and could mis-gate the single-stage scorer
        spark.conf.set(key, "64m")
        si = SearchIndex(spark, idx)
        assert si._one_file_per_shard is True  # tiny files < 64 MB
        assert si.search_df("confcheck", k=3).count() == 3
    finally:
        spark.conf.set(key, prev)

    # Spark validates conf values at set-time, so an unparseable value
    # only reaches the gate through a syntax our parser doesn't know —
    # simulate that with a stubbed conf and verify the gate fails CLOSED
    import types

    si2 = SearchIndex(spark, idx)
    si2.spark = types.SimpleNamespace(
        conf=types.SimpleNamespace(get=lambda *_: "1.5gib")
    )
    assert si2._one_file_per_shard is False
    si3 = SearchIndex(spark, idx)  # real conf: the fast path re-engages
    assert si3._one_file_per_shard is True


def test_duplicate_turn_keys_fail_loudly(spark, tmp_path):
    dup = _corpus(spark, "dupkeys")
    dup = dup.unionByName(dup.limit(3))  # 3 duplicated (conv_id, turn_idx)
    with pytest.raises(Exception, match="expected|duplicate"):
        build_index(spark, dup, str(tmp_path / "idx_dup"), n_shards=4)


def test_stale_ledger_cleared_on_fresh_rebuild(spark, tmp_path):
    """A resume=False rebuild killed mid-postings must NOT let the next
    resume trust the PREVIOUS build's ledger rows: the old rows mark
    every shard complete, so without clearing them the resume would
    skip the rebuild and pair old-corpus postings with the new docs
    table — permanently and silently (finalize would then clear the
    placeholder over the mixed state)."""
    idx = str(tmp_path / "idx_ledger")
    build_index(spark, _corpus(spark, "genone"), idx, n_shards=4)
    # fresh rebuild with NEW corpus, killed after one shard
    build_index(
        spark, _corpus(spark, "gentwo"), idx, n_shards=4,
        resume=False, max_shards_to_build=1, shard_batch=1,
    )
    # the plain resume (what an operator retries with) must rebuild the
    # remaining shards from the NEW corpus
    build_index(spark, _corpus(spark, "gentwo"), idx, n_shards=4, resume=True)
    si = SearchIndex(spark, idx)
    assert len(si.search("gentwo", k=50)) == 48
    assert len(si.search("genone", k=50)) == 0
    stats = IndexStorage(idx).read(spark, "collection_stats").collect()[0]
    assert int(stats.n_docs) == 48 and int(stats.n_terms) > 0


def test_claim_mode_skips_shared_placeholder_write(spark, tmp_path):
    """Concurrent claim-mode builders must not race overwrite jobs on
    the shared collection_stats table: the kill-window placeholder is a
    single-writer artifact (direct builds only)."""
    idx = str(tmp_path / "idx_claim")
    build_index(spark, _corpus(spark, "claimcheck"), idx, n_shards=4)
    before = IndexStorage(idx).read(spark, "collection_stats").collect()[0]
    build_index(
        spark, _corpus(spark, "claimcheck"), idx, n_shards=4,
        claim_owner="b1", force_shards={0},
    )
    after = IndexStorage(idx).read(spark, "collection_stats").collect()[0]
    # same corpus, so the stats must still be the valid originals —
    # neither a -1 placeholder nor a torn overwrite
    assert int(after.n_terms) == int(before.n_terms) > 0


def test_open_incomplete_fresh_index_is_loud(spark, tmp_path):
    """No-manifest (fresh) format-2 indexes have one partition dir per
    in-grid shard by construction; opening a snapshot with one missing
    must raise, not silently serve partial results."""
    idx = str(tmp_path / "idx_fresh_loud")
    build_index(spark, _corpus(spark, "freshloud"), idx, n_shards=4)
    st = IndexStorage(idx)
    victims = [d for d in os.listdir(st.path("postings")) if d.startswith("shard=")]
    shutil.rmtree(os.path.join(st.path("postings"), sorted(victims)[-1]))
    with pytest.raises(FileNotFoundError, match="missing shard"):
        SearchIndex(spark, idx)


def test_resolve_sql_degrades_fixture_errors_only():
    from tlgs_spark.entry_queries import resolve_sql

    def missing_fixture(sf):
        raise FileNotFoundError(sf)

    def bad_fixture(sf):
        raise ValueError("no vec_id==0 row")

    def real_bug(sf):
        raise TypeError("broken generator")

    with pytest.warns(UserWarning):
        assert resolve_sql(missing_fixture, "/nope") is None
    with pytest.warns(UserWarning):
        assert resolve_sql(bad_fixture, "/nope") is None
    with pytest.raises(TypeError):
        resolve_sql(real_bug, "/nope")
