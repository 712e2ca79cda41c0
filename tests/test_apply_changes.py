"""Changelog maintenance (`apply_changes`): bring the index up to date
from a DataFrame of per-turn changes with NO full-corpus scan anywhere
— the 10^12-turn API (`incremental_update` must at least hash every
input row's text; a changelog batch touches only the changed rows plus
one metadata-column scan of the committed docs).

Contracts pinned here:
- a changelog batch produces an index IDENTICAL (postings + docs + meta
  + search results) to `incremental_update` fed the full edited corpus
- inserts landing in the committed TAIL shard keep that shard's
  untouched docs (the committed-text read must cover the insert-range
  shards, not just shards holding deleted/edited docs)
- redundant upserts (same text AND metadata) and missing-key deletes
  are no-ops: nothing staged, nothing committed
- duplicate keys in one batch fail loudly
- `purge_index` deletes matching conversations with no corpus at all
- a non-delta-capable index (stale analyzer) raises instead of
  guessing
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tlgs_spark.corpus import generate_pandas
from tlgs_spark.indexer.build import build_index
from tlgs_spark.indexer.storage import IndexStorage


def _sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def _table_pdf(spark, idx, table, cols):
    return (
        IndexStorage(idx)
        .read(spark, table)
        .select(*cols)
        .toPandas()
        .sort_values(cols[: min(3, len(cols))])
        .reset_index(drop=True)
    )


def _search_fingerprint(spark, idx, queries=("tok0000 tok0001", "tok0002", "marker000")):
    from tlgs_spark.query.engine import SearchIndex

    si = SearchIndex(spark, idx)
    out = []
    for q in queries:
        for mode in ("and", "or"):
            r = si.search(q, k=10, mode=mode)
            rows = sorted(
                zip(r["score"].tolist(), r["conv_id"].tolist(), r["turn_idx"].tolist()),
                key=lambda x: (-x[0], x[1], x[2]),
            )
            out.append((q, mode, tuple(rows)))
    return out


def _delete_rows(pdf_like: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
    """Changelog delete rows: the keys plus every other transcript
    column as NULL (text IS NULL marks a delete)."""
    dl = keys.copy()
    for c in pdf_like.columns:
        if c in ("conv_id", "turn_idx"):
            continue
        dl[c] = pd.NaT if str(pdf_like[c].dtype).startswith("datetime") else None
    return dl[pdf_like.columns]


def test_changelog_matches_full_corpus_update(spark, tmp_path):
    """One batch with an edit + an insert + a delete ends bit-identical
    to incremental_update over the full edited corpus."""
    import shutil

    from tlgs_spark.streaming.incremental import apply_changes, incremental_update

    base = str(tmp_path / "idx_base")
    pdf = generate_pandas(20)
    build_index(spark, _sdf(spark, pdf), base, n_shards=6, lineage="v1")

    # edited corpus: conv3 text edited, conv4 deleted, conv500 inserted
    pdf2 = pdf.copy()
    mask = pdf2.conv_id == "conv000003"
    pdf2.loc[mask, "text"] = pdf2.loc[mask, "text"] + " editedmarker"
    ins = generate_pandas(1, start=500)
    full = pd.concat(
        [pdf2[pdf2.conv_id != "conv000004"], ins], ignore_index=True
    )

    # the changelog for exactly that delta
    changes = pd.concat(
        [
            pdf2[mask],
            ins,
            _delete_rows(pdf, pdf[pdf.conv_id == "conv000004"][["conv_id", "turn_idx"]]),
        ],
        ignore_index=True,
    )

    idx_cl = str(tmp_path / "idx_cl")
    idx_fc = str(tmp_path / "idx_fc")
    shutil.copytree(base, idx_cl)
    shutil.copytree(base, idx_fc)

    res_cl = apply_changes(spark, _sdf(spark, changes), idx_cl)
    res_fc = incremental_update(spark, _sdf(spark, full), idx_fc)
    assert res_cl["mode"] == "delta" and res_fc["mode"] == "delta"
    assert res_cl["changed"] == res_fc["changed"]
    assert res_cl["n_inserted"] == res_fc["n_inserted"]
    assert res_cl["n_deleted"] == res_fc["n_deleted"]

    # identical index content: postings bytes, docs rows, meta
    for table, cols in (
        ("postings", ["shard", "term", "df", "postings"]),
        ("docs", ["doc_id", "conv_id", "turn_idx", "text_hash", "tool"]),
        ("doc_lengths", ["doc_id", "dl"]),
    ):
        pd.testing.assert_frame_equal(
            _table_pdf(spark, idx_cl, table, cols),
            _table_pdf(spark, idx_fc, table, cols),
        )
    m_cl, m_fc = IndexStorage(idx_cl).read_meta(), IndexStorage(idx_fc).read_meta()
    assert (m_cl["n_docs"], m_cl["doc_ceiling"]) == (m_fc["n_docs"], m_fc["doc_ceiling"])
    assert _search_fingerprint(spark, idx_cl) == _search_fingerprint(spark, idx_fc)

    # and both match a fresh dense build of the edited corpus
    fresh = str(tmp_path / "fresh")
    build_index(spark, _sdf(spark, full), fresh, n_shards=6)
    assert _search_fingerprint(spark, idx_cl) == _search_fingerprint(spark, fresh)


def test_tail_shard_insert_keeps_untouched_docs(spark, tmp_path):
    """An insert-only changelog whose ids land in the committed tail
    shard must carry that shard's untouched docs into the rebuilt
    partition — postings end byte-identical to a fresh build on the
    same grid."""
    from tlgs_spark.streaming.incremental import apply_changes

    idx = str(tmp_path / "idx_tail")
    pdf = generate_pandas(12)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=4)
    meta0 = IndexStorage(idx).read_meta()
    # the committed tail shard is partially filled unless the corpus
    # size happens to divide evenly — assert the premise
    assert meta0["doc_ceiling"] % meta0["shard_size"] != 0, "fixture must leave a partial tail shard"

    extra = generate_pandas(2, start=500)  # keys sort after every existing conv
    res = apply_changes(spark, _sdf(spark, extra), idx)
    assert res["mode"] == "delta" and res["n_inserted"] == len(extra)
    assert res["reused"], "interior shards must be reused"

    fresh = str(tmp_path / "fresh_tail")
    full = pd.concat([pdf, extra], ignore_index=True)
    build_index(spark, _sdf(spark, full), fresh, shard_size=meta0["shard_size"])
    for table, cols in (
        ("postings", ["shard", "term", "df", "postings"]),
        ("docs", ["doc_id", "conv_id", "turn_idx", "text_hash"]),
    ):
        pd.testing.assert_frame_equal(
            _table_pdf(spark, idx, table, cols),
            _table_pdf(spark, fresh, table, cols),
        )


def test_redundant_and_empty_changelogs_are_noops(spark, tmp_path):
    from tlgs_spark.streaming.incremental import apply_changes

    idx = str(tmp_path / "idx_noop")
    pdf = generate_pandas(8)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=3)
    versions_before = dict(IndexStorage(idx).versions())

    # upserts identical to committed rows + a delete of a missing key
    changes = pd.concat(
        [
            pdf[pdf.conv_id == "conv000002"],
            _delete_rows(pdf, pd.DataFrame({"conv_id": ["convNOPE"], "turn_idx": [0]})),
        ],
        ignore_index=True,
    )
    res = apply_changes(spark, _sdf(spark, changes), idx)
    assert res["changed"] == [] and res["n_changes"] == len(changes)
    assert dict(IndexStorage(idx).versions()) == versions_before

    res0 = apply_changes(spark, _sdf(spark, pdf).limit(0), idx)
    assert res0["changed"] == [] and res0["n_changes"] == 0
    assert dict(IndexStorage(idx).versions()) == versions_before


def test_metadata_only_upsert_updates_docs_not_postings(spark, tmp_path):
    from tlgs_spark.streaming.incremental import apply_changes

    idx = str(tmp_path / "idx_meta")
    pdf = generate_pandas(10)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=4)
    posts_before = _table_pdf(spark, idx, "postings", ["shard", "term", "df", "postings"])

    ch = pdf[pdf.conv_id == "conv000003"].copy()
    ch["tool"] = "editedtool"
    res = apply_changes(spark, _sdf(spark, ch), idx)
    assert res["mode"] == "delta" and res["changed"]

    docs = IndexStorage(idx).read(spark, "docs")
    vals = {r.tool for r in docs.filter(F.col("conv_id") == "conv000003").collect()}
    assert vals == {"editedtool"}
    pd.testing.assert_frame_equal(
        posts_before, _table_pdf(spark, idx, "postings", ["shard", "term", "df", "postings"])
    )


def test_duplicate_keys_raise(spark, tmp_path):
    from tlgs_spark.streaming.incremental import apply_changes

    idx = str(tmp_path / "idx_dup")
    pdf = generate_pandas(6)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=2)
    dup = pd.concat([pdf.head(1)] * 2, ignore_index=True)
    with pytest.raises(ValueError, match="duplicate"):
        apply_changes(spark, _sdf(spark, dup), idx)


def test_purge_index_needs_no_corpus(spark, tmp_path):
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.streaming.incremental import purge_index

    idx = str(tmp_path / "idx_purge")
    pdf = generate_pandas(20)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=6)
    st = IndexStorage(idx)
    man_pre = st.read_manifest("docs")

    res = purge_index(spark, idx, "conv000005")
    assert res["purged_pattern"] == "conv000005"
    assert res["mode"] == "delta" and res["reused"]
    n_purged = int((pdf.conv_id == "conv000005").sum())
    assert res["n_deleted"] == n_purged

    hits = SearchIndex(spark, idx).search("tok0000", k=50, mode="or")
    assert "conv000005" not in set(hits["conv_id"])
    meta = IndexStorage(idx).read_meta()
    assert meta["n_docs"] == len(pdf) - n_purged
    # reused shards carried by reference (committed entries unchanged)
    man_post = IndexStorage(idx).read_manifest("docs")
    if man_pre:
        for s in res["reused"]:
            if s in man_pre:
                assert man_post[s] == man_pre[s]


def test_apply_changes_refuses_non_delta_index(spark, tmp_path):
    import json

    from tlgs_spark.streaming.incremental import apply_changes

    idx = str(tmp_path / "idx_an")
    pdf = generate_pandas(6)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=2)
    st = IndexStorage(idx)
    meta = st.read_meta()
    meta["tokenizer"] = "tlgs_spark.tokenizer v2 (s-stem)"  # stale analyzer
    with open(st._meta_file(st.versions().get("index_meta", 0)), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="delta-capable"):
        apply_changes(spark, _sdf(spark, pdf.head(1)), idx)


def test_stream_refresh_index_via_changelog(spark, tmp_path):
    """foreachBatch stream → apply_changes per micro-batch: already-
    indexed files replay as redundant upserts (no-op — the idempotence
    that makes the checkpoint-retry window exactly-once in effect), new
    files insert and serve, an empty trigger applies nothing."""
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.streaming.ingest import stream_refresh_index

    src = str(tmp_path / "sr_src")
    ckpt = str(tmp_path / "sr_ckpt")
    idx = str(tmp_path / "sr_idx")

    pdf = generate_pandas(12)
    _sdf(spark, pdf).write.mode("overwrite").parquet(src)
    build_index(spark, spark.read.parquet(src), idx, n_shards=4)

    # a fresh checkpoint replays the initial files: all redundant
    # upserts, so every batch is a no-op and nothing is staged
    versions_before = dict(IndexStorage(idx).versions())
    res1 = stream_refresh_index(spark, src, idx, ckpt)
    assert res1 and all(r["changed"] == [] for r in res1)
    assert dict(IndexStorage(idx).versions()) == versions_before

    # a new conversation arrives on the stream
    extra = generate_pandas(1, start=500)
    extra["text"] = extra["text"] + " streammarker"
    _sdf(spark, extra).write.mode("append").parquet(src)
    res2 = stream_refresh_index(spark, src, idx, ckpt)
    assert sum(r.get("n_inserted", 0) for r in res2) == len(extra)
    hits = SearchIndex(spark, idx).search("streammarker", k=5)
    assert len(hits) > 0 and set(hits["conv_id"]) == {"conv000500"}

    # nothing new → no batches fire
    assert stream_refresh_index(spark, src, idx, ckpt) == []


def test_missing_columns_raise(spark, tmp_path):
    from tlgs_spark.streaming.incremental import apply_changes

    idx = str(tmp_path / "idx_cols")
    pdf = generate_pandas(6)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=2)
    with pytest.raises(ValueError, match="missing transcript columns"):
        apply_changes(spark, _sdf(spark, pdf[["conv_id", "turn_idx", "text"]].head(1)), idx)
