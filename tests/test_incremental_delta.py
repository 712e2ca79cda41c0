"""Delta incremental prepare (r3 VERDICT #1): an edit must touch
O(changed) docs partitions — never rewrite the whole docs table — and
the refreshed index must answer queries identically to a from-scratch
build of the edited corpus.

Contracts pinned here:
- pure text edit: byte-identical postings vs a fresh build (doc ids
  unchanged), docs files of UNTOUCHED shards not rewritten (inode+mtime)
- append-only growth: ids allocate above the high-water mark == the
  fresh build's dense rank when new keys sort last, so postings stay
  byte-identical there too
- mid-key insert / delete: doc ids GAP instead of re-densifying;
  search results (hydrated to conv_id/turn_idx + float scores) match a
  fresh build exactly even though ids differ
- deleted ids are never reallocated (doc_ceiling is monotone)
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


def _docs_file_snap(st: IndexStorage, spark):
    """shard -> {file: (inode, mtime_ns)} over the RESOLVED docs
    partitions (manifest-aware)."""
    out = {}
    man = st.read_manifest("docs")
    if man is None:
        base = st.path("docs")
        dirs = {
            int(d.split("=", 1)[1]): os.path.join(base, d)
            for d in os.listdir(base)
            if d.startswith("shard=")
        }
    else:
        dirs = {s: os.path.join(st.index_dir, rel) for s, rel in man.items()}
    for s, d in dirs.items():
        out[s] = {
            f: (os.stat(os.path.join(d, f)).st_ino, os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        }
    return out


def _search_fingerprint(spark, idx, queries=("tok0000 tok0001", "tok0002", "marker000")):
    """Hydrated results keyed by (conv_id, turn_idx) + exact float
    scores — id-layout-independent comparison between two indexes."""
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


def test_pure_edit_touches_only_changed_docs_partitions(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx")
    pdf = generate_pandas(20)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=6, lineage="v1")
    st = IndexStorage(idx)
    pre = _docs_file_snap(st, spark)

    pdf2 = pdf.copy()
    mask = pdf2.conv_id == "conv000003"
    pdf2.loc[mask, "text"] = pdf2.loc[mask, "text"] + " editedmarker"
    res = incremental_update(spark, _sdf(spark, pdf2), idx)
    assert res["changed"] and res["reused"]
    assert res.get("mode") == "delta"

    # THE r4 contract: docs partitions of unchanged shards are the
    # same physical files (no full-corpus docs rewrite per update)
    post = _docs_file_snap(IndexStorage(idx), spark)
    for s in res["reused"]:
        assert post[s] == pre[s], f"reused shard {s} docs files were rewritten"
    for s in res["changed"]:
        assert post[s] != pre.get(s), f"changed shard {s} docs not rewritten"

    # byte-identity vs fresh build still holds for pure edits
    fresh = str(tmp_path / "fresh")
    build_index(spark, _sdf(spark, pdf2), fresh, n_shards=6)
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


def test_metadata_only_edit_rewrites_its_docs_partition(spark, tmp_path):
    """Same text, new tool value: the diff's row signature covers the
    metadata columns, so the edit marks its shards changed and the
    committed docs serve the NEW metadata — while postings (a function
    of text alone) stay byte-identical to the pre-edit index."""
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_meta")
    pdf = generate_pandas(20)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=6)
    st = IndexStorage(idx)
    pre = _docs_file_snap(st, spark)

    def _postings(st_):
        return (
            st_.read(spark, "postings")
            .select("shard", "term", "df", "postings")
            .toPandas().sort_values(["shard", "term"]).reset_index(drop=True)
        )

    posts_before = _postings(st)

    pdf2 = pdf.copy()
    mask = pdf2.conv_id == "conv000003"
    pdf2.loc[mask, "tool"] = "editedtool"
    res = incremental_update(spark, _sdf(spark, pdf2), idx)
    assert res.get("mode") == "delta"
    assert res["changed"], "metadata-only edit must mark its shards changed"

    post = _docs_file_snap(IndexStorage(idx), spark)
    for s in res["reused"]:
        assert post[s] == pre[s], f"reused shard {s} docs files were rewritten"
    docs = IndexStorage(idx).read(spark, "docs")
    vals = {
        r.tool for r in docs.filter(F.col("conv_id") == "conv000003").collect()
    }
    assert vals == {"editedtool"}, "committed docs must carry the new metadata"
    pd.testing.assert_frame_equal(posts_before, _postings(IndexStorage(idx)))


def test_append_only_growth_stays_byte_identical(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_app")
    pdf = generate_pandas(12)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=4)
    extra = generate_pandas(2, start=500)  # keys sort after every existing conv
    pdf2 = pd.concat([pdf, extra], ignore_index=True)
    res = incremental_update(spark, _sdf(spark, pdf2), idx)
    assert res.get("mode") == "delta"
    assert res["reused"], "append should reuse interior shards"

    fresh = str(tmp_path / "fresh_app")
    # byte-identity needs the SAME shard grid: the delta pins the
    # committed shard_size (growth appends trailing shards), so the
    # fresh comparison build must pin it too
    build_index(spark, _sdf(spark, pdf2), fresh,
                shard_size=IndexStorage(idx).read_meta()["shard_size"])
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


def test_delete_leaves_gaps_and_search_matches_fresh_build(spark, tmp_path):
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_del")
    pdf = generate_pandas(20)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=6)
    meta0 = IndexStorage(idx).read_meta()

    kept = pdf[pdf.conv_id != "conv000004"].reset_index(drop=True)
    res = incremental_update(spark, _sdf(spark, kept), idx)
    assert res.get("mode") == "delta"
    assert res["reused"], "a one-conv delete must reuse most shards"

    meta1 = IndexStorage(idx).read_meta()
    n_del = int((pdf.conv_id == "conv000004").sum())
    assert meta1["n_docs"] == meta0["n_docs"] - n_del  # live count shrinks
    assert meta1["doc_ceiling"] == meta0.get("doc_ceiling", meta0["n_docs"])  # ids never reused

    # search parity vs a fresh (dense-id) build of the same corpus
    fresh = str(tmp_path / "fresh_del")
    build_index(spark, _sdf(spark, kept), fresh, n_shards=6)
    assert _search_fingerprint(spark, idx) == _search_fingerprint(spark, fresh)
    # the deleted conversation is gone end to end
    si = SearchIndex(spark, idx)
    hits = si.search("tok0000", k=50, mode="or")
    assert "conv000004" not in set(hits["conv_id"])


def test_midkey_insert_allocates_above_ceiling(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_ins")
    pdf = generate_pandas(10)
    # drop one conv from the initial build, re-add it later = a
    # MID-KEY insert (its key sorts inside the existing range)
    first = pdf[pdf.conv_id != "conv000002"].reset_index(drop=True)
    build_index(spark, _sdf(spark, first), idx, n_shards=4)
    meta0 = IndexStorage(idx).read_meta()

    res = incremental_update(spark, _sdf(spark, pdf), idx)
    assert res.get("mode") == "delta"
    meta1 = IndexStorage(idx).read_meta()
    n_ins = int((pdf.conv_id == "conv000002").sum())
    assert meta1["doc_ceiling"] == meta0.get("doc_ceiling", meta0["n_docs"]) + n_ins
    assert meta1["n_docs"] == meta0["n_docs"] + n_ins

    # inserted docs live ABOVE the old ceiling (interior shards reused)
    st = IndexStorage(idx)
    docs = st.read(spark, "docs").select("doc_id", "conv_id")
    ins_ids = [r.doc_id for r in docs.filter(F.col("conv_id") == "conv000002").collect()]
    assert ins_ids and min(ins_ids) >= meta0.get("doc_ceiling", meta0["n_docs"])

    # search parity vs fresh dense build
    fresh = str(tmp_path / "fresh_ins")
    build_index(spark, _sdf(spark, pdf), fresh, n_shards=4)
    assert _search_fingerprint(spark, idx) == _search_fingerprint(spark, fresh)


def test_purge_is_partition_local_now(spark, tmp_path):
    """purge (S8/I5) rides the delta path: removing one conversation
    rewrites only its shards' docs/postings partitions instead of
    re-densifying every doc id after it."""
    from tlgs_spark.streaming.incremental import purge_conversations

    idx = str(tmp_path / "idx_purge")
    pdf = generate_pandas(20)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=6)
    st = IndexStorage(idx)
    pre = _docs_file_snap(st, spark)
    res = purge_conversations(spark, _sdf(spark, pdf), idx, "conv000005")
    assert res["purged_pattern"] == "conv000005"
    assert res.get("mode") == "delta"
    assert res["reused"]
    post = _docs_file_snap(IndexStorage(idx), spark)
    for s in res["reused"]:
        assert post[s] == pre[s]
    from tlgs_spark.query.engine import SearchIndex

    hits = SearchIndex(spark, idx).search("tok0000", k=50, mode="or")
    assert "conv000005" not in set(hits["conv_id"])


def test_fielded_search_correct_after_gapped_delete(spark, tmp_path):
    """A delta delete leaves id GAPS; the field sub-index rebuild must
    inherit the main index's committed ids (dense re-ranking would
    misaddress every doc after the gap) — fielded results must match a
    fresh dense build of the same corpus, compared by (conv, turn)."""
    from tlgs_spark.indexer.build import build_field_index
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_fgap")
    pdf = generate_pandas(20)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=6)
    build_field_index(spark, idx)

    kept = pdf[pdf.conv_id != "conv000003"].reset_index(drop=True)
    res = incremental_update(spark, _sdf(spark, kept), idx)
    assert res.get("mode") == "delta" and res["fields_rebuilt"] == ["first5"]
    meta = IndexStorage(idx).read_meta()
    assert meta["doc_ceiling"] > meta["n_docs"]  # really gapped

    fresh = str(tmp_path / "fresh_fgap")
    build_index(spark, _sdf(spark, kept), fresh, n_shards=6)
    build_field_index(spark, fresh)

    si_d, si_f = SearchIndex(spark, idx), SearchIndex(spark, fresh)

    def fp(si, q, mode):
        r = si.search_fielded(q, k=10, mode=mode)
        hyd = si.hydrate(r) if hasattr(si, "hydrate") else None
        if hyd is None:
            # map ids → (conv, turn) through the docs table
            ids = [int(d) for d in r["doc_id"]]
            rows = {
                int(x.doc_id): (x.conv_id, int(x.turn_idx))
                for x in si.st.read(si.spark, "docs")
                .filter(F.col("doc_id").isin(ids))
                .select("doc_id", "conv_id", "turn_idx")
                .collect()
            }
            return sorted(
                (s, *rows[i]) for i, s in zip(ids, r["score"].tolist())
            )
        raise AssertionError

    for q, mode in [("tok0000 tok0001", "or"), ("tok0002", "and")]:
        assert fp(si_d, q, mode) == fp(si_f, q, mode), (q, mode)


def test_noop_update_short_circuits(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_noop")
    pdf = generate_pandas(8)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=3)
    st = IndexStorage(idx)
    versions_before = dict(st.versions())
    res = incremental_update(spark, _sdf(spark, pdf), idx)
    assert res["changed"] == [] and len(res["reused"]) == 3
    # nothing staged, nothing committed — a no-op is free
    assert dict(IndexStorage(idx).versions()) == versions_before


def test_analyzer_mismatch_falls_back_to_full_rebuild(spark, tmp_path, monkeypatch):
    """The delta path must refuse to mix analyzers: a committed index
    built under a different ANALYZER_VERSION takes the full-rebuild
    path (mode != delta) and still ends correct."""
    import json

    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_an")
    pdf = generate_pandas(8)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=3)
    st = IndexStorage(idx)
    meta = st.read_meta()
    meta["tokenizer"] = "tlgs_spark.tokenizer v2 (s-stem)"  # stale analyzer
    with open(st._meta_file(st.versions().get("index_meta", 0)), "w") as f:
        json.dump(meta, f)
    res = incremental_update(spark, _sdf(spark, pdf), idx)
    assert res.get("mode") != "delta"
    from tlgs_spark.query.engine import SearchIndex

    hits = SearchIndex(spark, idx).search("tok0000", k=5)
    assert list(hits.columns[:2]) == ["doc_id", "score"]


def test_fielded_ids_correct_after_insert_only_delta(spark, tmp_path):
    """Insert-only delta whose new keys sort BEFORE every committed key:
    the id space stays dense (doc_ceiling == n_docs — no gaps), but the
    committed ids are NOT the dense rank of (conv_id, turn_idx) — the
    insert took ids above the old ceiling. The field sub-index rebuild
    must inherit the committed id map; a dense re-rank discriminated on
    doc_ceiling == n_docs would assign the inserted conv doc_id 0 and
    shift every other doc by +1, silently applying every title score to
    the wrong document (r4 review finding, confirmed by repro)."""
    from tlgs_spark.indexer.build import build_field_index, field_index_dir
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_fins")
    pdf = generate_pandas(6)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=3)
    build_field_index(spark, idx)

    ins = generate_pandas(1, start=7)
    ins["conv_id"] = "aaaa" + ins["conv_id"]  # sorts before every 'conv…'
    grown = pd.concat([pdf, ins], ignore_index=True)
    res = incremental_update(spark, _sdf(spark, grown), idx)
    assert res.get("mode") == "delta" and res["fields_rebuilt"] == ["first5"]
    meta = IndexStorage(idx).read_meta()
    assert meta["doc_ceiling"] == meta["n_docs"]  # dense — no gaps

    main = {
        (r.conv_id, int(r.turn_idx)): int(r.doc_id)
        for r in IndexStorage(idx).read(spark, "docs")
        .select("conv_id", "turn_idx", "doc_id").collect()
    }
    fld = {
        (r.conv_id, int(r.turn_idx)): int(r.doc_id)
        for r in IndexStorage(field_index_dir(idx)).read(spark, "docs")
        .select("conv_id", "turn_idx", "doc_id").collect()
    }
    assert fld == main


def test_delta_retry_discards_crashed_staged_ledger(spark, tmp_path):
    """A delta retry recomputes the same staged version; the crashed
    attempt's staged ledger rows must be discarded, not appended onto —
    ledger-derived metrics would double-count every reused shard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_retry")
    pdf = generate_pandas(8)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=3)
    st = IndexStorage(idx)

    # fake a crashed prior attempt: junk rows already sit in the staged
    # (committed+1) ledger dir the retry will recompute
    crashed = st.table_dir("ledger", st.versions().get("ledger", 0) + 1)
    os.makedirs(crashed, exist_ok=True)
    pq.write_table(
        pa.table({"shard": pa.array([0, 1], pa.int32())}),
        os.path.join(crashed, "part-crashed.parquet"),
    )

    pdf2 = pdf.copy()
    m = pdf2.conv_id == "conv000002"
    pdf2.loc[m, "text"] = pdf2.loc[m, "text"] + " retrymarker"
    res = incremental_update(spark, _sdf(spark, pdf2), idx)
    assert res["mode"] == "delta"

    led = IndexStorage(idx).read(spark, "ledger").toPandas()
    # crashed-attempt rows gone; one row per shard, no duplicates
    assert "part-crashed.parquet" not in "".join(os.listdir(crashed))
    assert not led.duplicated(subset=["shard"]).any()
    assert sorted(led.shard.astype(int)) == [0, 1, 2]


def test_delta_raises_on_missing_reused_norms_partition(spark, tmp_path):
    """A reused shard whose committed norms partition dir vanished is
    corruption: the delta must raise instead of committing a manifest
    whose absent shard silently reads as all-zero doc lengths."""
    import shutil as _sh

    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_missing")
    pdf = generate_pandas(8)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=3)
    st = IndexStorage(idx)
    # vandalize: drop shard 0's committed norms partition
    _sh.rmtree(os.path.join(st.path("norms"), "shard=0"))

    pdf2 = pdf.copy()
    m = pdf2.conv_id == "conv000007"  # lands in the last shard
    pdf2.loc[m, "text"] = pdf2.loc[m, "text"] + " corruptprobe"
    with pytest.raises(FileNotFoundError, match="norms.*shard 0"):
        incremental_update(spark, _sdf(spark, pdf2), idx)


def test_compact_index_redensifies_and_preserves_results(spark, tmp_path):
    """compact_index reclaims delta-era id gaps: after deletes +
    inserts leave doc_ceiling > n_docs, compaction restores
    doc_ceiling == n_docs with ids equal to a fresh dense build's, and
    search results (hydrated fingerprints) are unchanged. Corpus-free —
    it rebuilds from the committed docs' live rows."""
    from tlgs_spark.streaming.incremental import apply_changes, compact_index

    def _delete_rows(pdf_like, keys):
        # changelog delete rows: keys + every other column NULL
        dl = keys.copy()
        for c in pdf_like.columns:
            if c in ("conv_id", "turn_idx"):
                continue
            dl[c] = (
                pd.NaT if str(pdf_like[c].dtype).startswith("datetime") else None
            )
        return dl[pdf_like.columns]

    idx = str(tmp_path / "idx_compact")
    pdf = generate_pandas(12)
    build_index(spark, _sdf(spark, pdf), idx, n_shards=4)

    # delete 2 convs, insert 1 → gapped id space
    ins = generate_pandas(1, start=30)
    dels = pdf[pdf.conv_id.isin(["conv000002", "conv000009"])][
        ["conv_id", "turn_idx"]
    ]
    changes = pd.concat([ins, _delete_rows(pdf, dels)], ignore_index=True)
    res = apply_changes(spark, _sdf(spark, changes), idx)
    assert res["mode"] == "delta"
    meta = IndexStorage(idx).read_meta()
    assert meta["doc_ceiling"] > meta["n_docs"]  # really gapped

    before = _search_fingerprint(spark, idx)

    res_c = compact_index(spark, idx)
    assert res_c["mode"] == "compact"
    assert res_c["ceiling_before"] > res_c["ceiling_after"]
    meta2 = IndexStorage(idx).read_meta()
    assert meta2["doc_ceiling"] == meta2["n_docs"]

    # ids now equal the dense rank a fresh build assigns
    survivors = pd.concat(
        [pdf[~pdf.conv_id.isin(["conv000002", "conv000009"])], ins],
        ignore_index=True,
    )
    fresh = str(tmp_path / "fresh_compact")
    build_index(spark, _sdf(spark, survivors), fresh, n_shards=meta2["n_shards"])
    ids_c = {
        (r.conv_id, int(r.turn_idx)): int(r.doc_id)
        for r in IndexStorage(idx).read(spark, "docs")
        .select("conv_id", "turn_idx", "doc_id").collect()
    }
    ids_f = {
        (r.conv_id, int(r.turn_idx)): int(r.doc_id)
        for r in IndexStorage(fresh).read(spark, "docs")
        .select("conv_id", "turn_idx", "doc_id").collect()
    }
    assert ids_c == ids_f

    assert _search_fingerprint(spark, idx) == before

    # status surfaces the drift signal, now back to 1.0
    from tlgs_spark.indexer.storage import index_status

    stat = index_status(spark, idx)
    assert stat["id_space"]["ceiling_ratio"] == 1.0


def test_diff_dominance_hint_steers_to_apply_changes(spark, tmp_path, monkeypatch):
    """r4 VERDICT #7: when the corpus-proportional diff scan dominates
    the edit-proportional apply, incremental_update must say so — a
    'hint' return field plus a warning naming apply_changes. The
    threshold rule itself is pure (measured phase timings in, hint
    out), pinned on the real 63M profile; the plumbing is exercised on
    a real tiny-edit update with the ratio floored so the small-corpus
    test fires deterministically."""
    import warnings

    from tlgs_spark.streaming import incremental as inc

    # -- the decision rule, on real measured profiles --
    # 63M-turn 1-conv edit (BASELINE.md): diff 19.8 s vs ~30 s apply —
    # the apply still dominates, no hint
    p63 = {"diff": 19.8, "docs_write": 9.1, "postings_rebuild": 10.5,
           "finalize": 3.5, "commit": 0.007}
    assert inc._diff_dominance_hint(p63) is None
    # one corpus decade later the same edit's diff is ~10x while the
    # apply is unchanged — the scan is now the majority cost: hint
    p630 = dict(p63, diff=198.0)
    assert "apply_changes" in inc._diff_dominance_hint(p630)
    # no-edit-phase degenerate profile: diff-only always hints
    assert "apply_changes" in inc._diff_dominance_hint({"diff": 1.0})

    # -- the plumbing, on a real tiny-edit update --
    pdf = generate_pandas(12)
    idx = str(tmp_path / "idx_hint")
    build_index(spark, _sdf(spark, pdf), idx, n_shards=4)
    edited = pdf.copy()
    edited.loc[0, "text"] = edited.loc[0, "text"] + " hintmarker"
    monkeypatch.setattr(inc, "DIFF_DOMINANCE_HINT_RATIO", 0.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = inc.incremental_update(spark, _sdf(spark, edited), idx)
    assert res["mode"] == "delta"
    assert "apply_changes" in res.get("hint", "")
    assert any("apply_changes" in str(x.message) for x in w)
