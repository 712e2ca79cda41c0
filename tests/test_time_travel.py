"""Snapshot-log time travel (Iceberg ``VERSION AS OF`` analog).

``commit_versions`` appends each committed version map to
``snapshot_log.json``; ``IndexStorage(..., at_snapshot=n)`` /
``SearchIndex(..., at_snapshot=n)`` pin every read to that state
(0 = the implicit fresh-build state). ``vacuum(retain_snapshots=K)``
protects the newest K snapshots' files and expires older log entries,
so reads inside the retention window survive vacuum and reads outside
it fail loudly at open.
"""

import os

import pandas as pd
import pytest

from tlgs_spark.corpus import generate_pandas
from tlgs_spark.indexer.build import build_index
from tlgs_spark.indexer.storage import IndexStorage
from tlgs_spark.query.engine import SearchIndex
from tlgs_spark.streaming.incremental import incremental_update

QUERY = "tok0000 tok0001"


def _edit(pdf, conv, suffix):
    out = pdf.copy()
    m = out.conv_id == conv
    out.loc[m, "text"] = out.loc[m, "text"] + " " + suffix
    return out


def _search(spark, idx, at_snapshot=None):
    return SearchIndex(spark, idx, at_snapshot=at_snapshot).search(QUERY, k=15, mode="or")


def test_time_travel_reads_past_snapshots(spark, tmp_path):
    idx = str(tmp_path / "idx_tt")
    pdf0 = generate_pandas(16)
    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5)
    want0 = _search(spark, idx)

    pdf1 = _edit(pdf0, "conv000002", "tok0000 first edit")
    incremental_update(spark, spark.createDataFrame(pdf1), idx)
    want1 = _search(spark, idx)

    pdf2 = _edit(pdf1, "conv000014", "tok0001 second edit")
    incremental_update(spark, spark.createDataFrame(pdf2), idx)

    st = IndexStorage(idx)
    assert [e["snapshot_id"] for e in st.snapshots()] == [1, 2]

    # each snapshot reads as the state at its commit
    pd.testing.assert_frame_equal(_search(spark, idx, at_snapshot=0), want0)
    pd.testing.assert_frame_equal(_search(spark, idx, at_snapshot=1), want1)
    pd.testing.assert_frame_equal(_search(spark, idx, at_snapshot=2), _search(spark, idx))
    assert not want1.equals(want0)

    # unknown snapshot fails loudly at open
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=99)

    # a pinned storage is read-only
    pinned = IndexStorage(idx, at_snapshot=1)
    with pytest.raises(RuntimeError):
        pinned.write_meta({})
    with pytest.raises(RuntimeError):
        pinned.vacuum(0.0)
    with pytest.raises(RuntimeError):
        pinned.commit_versions({"docs": 9})

    # fielded search refuses (field sub-indexes are unversioned caches)
    si = SearchIndex(spark, idx, at_snapshot=1)
    with pytest.raises(RuntimeError):
        si.field_index()


def test_vacuum_retention_window(spark, tmp_path):
    idx = str(tmp_path / "idx_ret")
    pdf0 = generate_pandas(16)
    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5)

    pdf1 = _edit(pdf0, "conv000002", "first edit")
    incremental_update(spark, spark.createDataFrame(pdf1), idx)
    want1 = _search(spark, idx)

    pdf2 = _edit(pdf1, "conv000014", "second edit")
    res2 = incremental_update(spark, spark.createDataFrame(pdf2), idx)
    assert res2["changed"]

    # retain the last two snapshots: snapshot 1 survives the vacuum
    st = IndexStorage(idx)
    man1 = {
        os.path.join(idx, rel)
        for rel in IndexStorage(idx, at_snapshot=1).read_postings_manifest().values()
    }
    removed = st.vacuum(grace_s=0.0, retain_snapshots=2)
    assert not (set(removed) & man1), "vacuum removed a retained snapshot's partition"
    assert [e["snapshot_id"] for e in st.snapshots()] == [1, 2]
    pd.testing.assert_frame_equal(_search(spark, idx, at_snapshot=1), want1)

    # shrink the window to 1: snapshot 1 expires from the log and its
    # superseded partitions become vacuumable
    removed = IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=1)
    st = IndexStorage(idx)
    assert [e["snapshot_id"] for e in st.snapshots()] == [2]
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=1)

    # the current snapshot still serves identically to a fresh build
    got = _search(spark, idx)
    fresh = str(tmp_path / "fresh_ret")
    build_index(spark, spark.createDataFrame(pdf2), fresh, n_shards=5)
    pd.testing.assert_frame_equal(got, _search(spark, fresh))


def test_direct_rebuild_expires_snapshot_log(spark, tmp_path):
    """A DIRECT build into an updated dir rewrites the committed
    versions' files in place — logged snapshots are physically gone, so
    the log must expire up front (loud KeyError, never silent reads of
    rewritten partitions)."""
    idx = str(tmp_path / "idx_direct")
    pdf0 = generate_pandas(16)
    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5)
    pdf1 = _edit(pdf0, "conv000002", "first edit")
    incremental_update(spark, spark.createDataFrame(pdf1), idx)
    assert [e["snapshot_id"] for e in IndexStorage(idx).snapshots()] == [1]

    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5, resume=False)
    assert IndexStorage(idx).snapshots() == []
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=1)
    # the rebuilt current state serves correctly
    fresh = str(tmp_path / "fresh_direct")
    build_index(spark, spark.createDataFrame(pdf0), fresh, n_shards=5)
    pd.testing.assert_frame_equal(_search(spark, idx), _search(spark, fresh))
