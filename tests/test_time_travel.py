"""Snapshot-log time travel (Iceberg ``VERSION AS OF`` analog).

``commit_versions`` appends each committed version map to
``snapshot_log.json`` (the FIRST commit also records the pre-commit
fresh-build state, id 0 for the first generation); ``IndexStorage(...,
at_snapshot=n)`` / ``SearchIndex(..., at_snapshot=n)`` pin every read
to that state. ``vacuum(retain_snapshots=K)`` protects the newest K
snapshots' files; older entries stay addressable until their commit
age passes the grace window, then expire — and snapshot ids are never
reused (high-water mark survives log resets), so a stale pin fails
loudly instead of silently rebinding to a later state.
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


def _ids(idx):
    return [e["snapshot_id"] for e in IndexStorage(idx).snapshots()]


def test_time_travel_reads_past_snapshots(spark, tmp_path):
    idx = str(tmp_path / "idx_tt")
    pdf0 = generate_pandas(16)
    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5)
    want0 = _search(spark, idx)

    # before any commit there is no past state to address
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=0)

    pdf1 = _edit(pdf0, "conv000002", "tok0000 first edit")
    incremental_update(spark, spark.createDataFrame(pdf1), idx)
    want1 = _search(spark, idx)

    pdf2 = _edit(pdf1, "conv000014", "tok0001 second edit")
    incremental_update(spark, spark.createDataFrame(pdf2), idx)

    # first commit recorded the fresh-build state as snapshot 0
    assert _ids(idx) == [0, 1, 2]

    # admin status surfaces the snapshot log and the vacuum backlog
    from tlgs_spark.indexer.storage import index_status

    stat = index_status(spark, idx)
    assert [s["snapshot_id"] for s in stat["snapshots"]] == [0, 1, 2]
    assert stat["gc_pending"] > 0

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
    assert _ids(idx) == [0, 1, 2]

    # a long grace keeps even out-of-window snapshots addressable AND
    # their files protected (addressability never outlives liveness)
    st = IndexStorage(idx)
    removed = st.vacuum(grace_s=3600.0, retain_snapshots=1)
    assert removed == []
    assert _ids(idx) == [0, 1, 2]
    pd.testing.assert_frame_equal(_search(spark, idx, at_snapshot=1), want1)

    # retain the last two snapshots at zero grace: snapshot 0 expires,
    # snapshot 1 survives with every referenced partition intact
    man1 = {
        os.path.join(idx, rel)
        for rel in IndexStorage(idx, at_snapshot=1).read_postings_manifest().values()
    }
    removed = IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=2)
    assert not (set(removed) & man1), "vacuum removed a retained snapshot's partition"
    assert _ids(idx) == [1, 2]
    pd.testing.assert_frame_equal(_search(spark, idx, at_snapshot=1), want1)
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=0)

    # shrink the window to 1: snapshot 1 expires and its superseded
    # partitions become vacuumable
    IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=1)
    assert _ids(idx) == [2]
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=1)

    # the current snapshot still serves identically to a fresh build
    got = _search(spark, idx)
    fresh = str(tmp_path / "fresh_ret")
    build_index(spark, spark.createDataFrame(pdf2), fresh, n_shards=5)
    pd.testing.assert_frame_equal(got, _search(spark, fresh))


def test_lost_log_append_still_protected(spark, tmp_path):
    """Crash window: pointer flipped but the log append was lost. The
    pointer state is unioned into the live set directly, and the log's
    newest (stale) entry stays protected by the retention window."""
    idx = str(tmp_path / "idx_crash")
    pdf0 = generate_pandas(16)
    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5)
    pdf1 = _edit(pdf0, "conv000002", "first edit")
    incremental_update(spark, spark.createDataFrame(pdf1), idx)
    want1 = _search(spark, idx)
    pdf2 = _edit(pdf1, "conv000014", "second edit")
    incremental_update(spark, spark.createDataFrame(pdf2), idx)
    want2 = _search(spark, idx)

    # simulate the lost append: drop the newest log entry (id 2); the
    # committed pointer still points at state 2
    st = IndexStorage(idx)
    log = st.snapshots()
    st._write_snapshot_log(log[:-1])
    assert _ids(idx) == [0, 1]

    IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=1)
    # retained entry 1 AND the pointer state both keep serving
    pd.testing.assert_frame_equal(_search(spark, idx, at_snapshot=1), want1)
    pd.testing.assert_frame_equal(_search(spark, idx), want2)


def test_direct_rebuild_expires_log_and_never_reuses_ids(spark, tmp_path):
    """A DIRECT build into an updated dir rewrites the committed
    versions' files in place — logged snapshots are physically gone, so
    the log expires (loud KeyError). The high-water mark survives the
    reset: later commits allocate FRESH ids, so a stale pin can never
    silently rebind to a new state that reused its id."""
    idx = str(tmp_path / "idx_direct")
    pdf0 = generate_pandas(16)
    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5)
    pdf1 = _edit(pdf0, "conv000002", "first edit")
    incremental_update(spark, spark.createDataFrame(pdf1), idx)
    assert _ids(idx) == [0, 1]

    # a build that dies BEFORE its first destructive write must not
    # destroy addressability of the still-intact snapshots
    bad = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a"], "turn_idx": [0]})  # no text column
    )
    with pytest.raises(Exception):
        build_index(spark, bad, idx, n_shards=5, resume=False)
    assert _ids(idx) == [0, 1]
    assert len(_search(spark, idx, at_snapshot=0)) > 0  # snapshot 0 still serves

    build_index(spark, spark.createDataFrame(pdf0), idx, n_shards=5, resume=False)
    assert IndexStorage(idx).snapshots() == []
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=1)

    # next update continues above the old high-water mark (1): the
    # pre-state entry and the new state get ids 2 and 3 — never 0/1
    pdf1b = _edit(pdf0, "conv000005", "post-reset edit")
    incremental_update(spark, spark.createDataFrame(pdf1b), idx)
    assert _ids(idx) == [2, 3]
    with pytest.raises(KeyError):
        SearchIndex(spark, idx, at_snapshot=1)

    # the rebuilt current state serves correctly
    fresh = str(tmp_path / "fresh_direct")
    build_index(spark, spark.createDataFrame(pdf1b), fresh, n_shards=5)
    pd.testing.assert_frame_equal(_search(spark, idx), _search(spark, fresh))


def test_corrupt_snapshot_log_fails_loudly(tmp_path):
    """A truncated/corrupt snapshot_log.json must raise, not silently
    reset the never-reuse high-water mark (a reset would let the next
    commit re-allocate ids a stale at_snapshot pin may still hold)."""
    idx = str(tmp_path / "idx_corrupt")
    os.makedirs(idx)
    st = IndexStorage(idx)
    assert st.snapshots() == []  # absent log is a legitimate empty state
    with open(os.path.join(idx, "snapshot_log.json"), "w") as f:
        f.write('{"last_id": 2, "entr')  # truncated mid-write/mid-copy
    with pytest.raises(RuntimeError, match="corrupt snapshot log"):
        st.snapshots()
