"""Snapshot isolation for the postings table (r2 VERDICT ask #1).

The reference gets reader/writer concurrency from PostgreSQL MVCC
(crawler runs while the server serves, tlgs/crawler/crawler.cpp:132-139,
README.md:62). Here: an incremental update writes changed postings
partitions into a fresh versioned dir, carries unchanged partitions by
manifest reference, and flips one pointer — so a SearchIndex opened on
the old pointer returns bit-identical pre-update results THROUGH the
update, a reopen sees post-update results, and vacuum retires only
unreferenced partition files after the grace window.
"""

import json
import os

import pandas as pd

from tlgs_spark.corpus import generate_pandas
from tlgs_spark.indexer.build import build_index
from tlgs_spark.indexer.storage import IndexStorage
from tlgs_spark.query.engine import SearchIndex
from tlgs_spark.streaming.incremental import incremental_update


def _spark_df(spark, pdf):
    return spark.createDataFrame(pdf)


def _cold(si: SearchIndex) -> SearchIndex:
    """Drop every result/postings cache so the next search re-reads
    the actual files of the snapshot this index was opened on."""
    si._raw_cache.clear()
    si._filtered_cache.clear()
    si._meta_cache.clear()
    if hasattr(si, "_term_cache"):
        si._term_cache.clear()
    return si


QUERY = "tok0000 tok0001"


def test_reader_sees_consistent_snapshot_through_update(spark, tmp_path):
    idx = str(tmp_path / "idx_snap")
    pdf = generate_pandas(16)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=5)

    si_old = SearchIndex(spark, idx)
    before = si_old.search(QUERY, k=15, mode="or")

    # the update edits one conversation → ≥1 changed shard
    pdf2 = pdf.copy()
    mask = pdf2.conv_id == "conv000002"
    pdf2.loc[mask, "text"] = pdf2.loc[mask, "text"] + " tok0000 extra edit"
    res = incremental_update(spark, _spark_df(spark, pdf2), idx, n_shards=5)
    assert res["changed"] and res["reused"]

    # manifest landed: changed shards in the v1 dir, reused in the old
    st = IndexStorage(idx)
    man = st.read_postings_manifest()
    assert man is not None and set(man) == set(res["changed"] + res["reused"])
    for s in res["changed"]:
        assert "__v" in man[s]
    for s in res["reused"]:
        assert "__v" not in man[s]

    # pre-update reader, caches dropped: bit-identical old results
    after_old = _cold(si_old).search(QUERY, k=15, mode="or")
    pd.testing.assert_frame_equal(before, after_old)

    # fresh reader: post-update results == a from-scratch build
    si_new = SearchIndex(spark, idx)
    got = si_new.search(QUERY, k=15, mode="or")
    fresh = str(tmp_path / "fresh")
    build_index(spark, _spark_df(spark, pdf2), fresh, n_shards=5)
    want = SearchIndex(spark, fresh).search(QUERY, k=15, mode="or")
    pd.testing.assert_frame_equal(got, want)
    assert not got.equals(before)  # the edit actually moved the ranking

    # postings tables match byte-for-byte via the manifest-aware scan
    a = (
        st.read(spark, "postings").select("shard", "term", "df", "postings")
        .toPandas().sort_values(["shard", "term"]).reset_index(drop=True)
    )
    b = (
        IndexStorage(fresh).read(spark, "postings").select("shard", "term", "df", "postings")
        .toPandas().sort_values(["shard", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_vacuum_retires_only_unreferenced_partitions(spark, tmp_path):
    idx = str(tmp_path / "idx_vac")
    pdf = generate_pandas(16)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=5)
    v0_base = IndexStorage(idx).path("postings")

    pdf2 = pdf.copy()
    mask = pdf2.conv_id == "conv000002"
    pdf2.loc[mask, "text"] = pdf2.loc[mask, "text"] + " edited"
    res = incremental_update(spark, _spark_df(spark, pdf2), idx, n_shards=5)

    st = IndexStorage(idx)
    man = st.read_postings_manifest()
    # deferred: superseded old partitions of changed shards still on disk
    for s in res["changed"]:
        assert os.path.isdir(os.path.join(v0_base, f"shard={s}"))

    removed = st.vacuum(grace_s=0.0)
    for s in res["changed"]:
        assert os.path.join(v0_base, f"shard={s}") in removed
        assert not os.path.isdir(os.path.join(v0_base, f"shard={s}"))
    # reused partitions survive: still referenced by the manifest
    for s in res["reused"]:
        p = os.path.join(idx, man[s])
        assert os.path.isdir(p), f"reused shard {s} was vacuumed"
    # the old base dir survives while it still holds reused shards,
    # and its entry stays queued for a later retry
    assert os.path.isdir(v0_base)
    pending = json.load(open(os.path.join(idx, "gc_pending.json")))
    assert any(e["path"] == v0_base for e in pending)

    # post-vacuum index still serves identically to a fresh build
    got = SearchIndex(spark, idx).search(QUERY, k=10, mode="or")
    fresh = str(tmp_path / "fresh_vac")
    build_index(spark, _spark_df(spark, pdf2), fresh, n_shards=5)
    want = SearchIndex(spark, fresh).search(QUERY, k=10, mode="or")
    pd.testing.assert_frame_equal(got, want)


def test_second_update_chains_manifests(spark, tmp_path):
    """Two successive updates: the manifest may reference THREE
    generations (v0 reused, v1 reused, v2 changed); results stay equal
    to a fresh build and the distributed path agrees."""
    idx = str(tmp_path / "idx_chain")
    pdf = generate_pandas(16)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=5)

    pdf2 = pdf.copy()
    m2 = pdf2.conv_id == "conv000002"
    pdf2.loc[m2, "text"] = pdf2.loc[m2, "text"] + " first edit"
    incremental_update(spark, _spark_df(spark, pdf2), idx, n_shards=5)

    pdf3 = pdf2.copy()
    m3 = pdf3.conv_id == "conv000014"
    pdf3.loc[m3, "text"] = pdf3.loc[m3, "text"] + " second edit"
    res3 = incremental_update(spark, _spark_df(spark, pdf3), idx, n_shards=5)
    assert res3["changed"] and res3["reused"]

    si = SearchIndex(spark, idx)
    fresh = str(tmp_path / "fresh_chain")
    build_index(spark, _spark_df(spark, pdf3), fresh, n_shards=5)
    si_f = SearchIndex(spark, fresh)
    got = si.search(QUERY, k=15, mode="or")
    want = si_f.search(QUERY, k=15, mode="or")
    pd.testing.assert_frame_equal(got, want)
    # distributed path reads the same union
    gd = si.search_df(QUERY, k=15, mode="or").toPandas()
    wd = si_f.search_df(QUERY, k=15, mode="or").toPandas()
    pd.testing.assert_frame_equal(gd, wd)
