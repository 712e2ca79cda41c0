"""Round-3 regression tests for the r2 ADVICE findings.

1. infirst:/intitle filter terms are analyzed (lowered + stemmed) like
   body terms — the reference runs intitle through the same tsquery
   stemmer (search.cpp:441,445).
2. incremental_update refuses to reuse postings shards across analyzer
   spec versions (mixed-analyzer index guard).
3. The incremental prepare pass must not read its own just-written
   meta in the dl-reuse hygiene guard (index_meta is staged/versioned
   now): flipping hygiene recomputes doc lengths.
4. _bm25_scored/_bm25_sql dedupe query terms after stemming.
5. Post-commit GC is deferred: a pre-update reader keeps working until
   vacuum() runs after its grace window.
"""

import json
import os

import pandas as pd
import pytest

from tlgs_spark.corpus import generate_pandas
from tlgs_spark.indexer.build import build_index
from tlgs_spark.indexer.storage import IndexStorage
from tlgs_spark.query.parser import SearchFilter, eval_filter_row
from tlgs_spark.tokenizer import ANALYZER_VERSION, s_stem, tokenize


def _spark_df(spark, pdf):
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------- 1 --

def test_eval_filter_row_stems_infirst_terms():
    filt = SearchFilter(infirst=[("windows", False)])
    # turn-0 text "the window closes" analyzes to {window, close} —
    # a plural filter term must still match
    terms = frozenset(tokenize("the window closes"))
    assert "window" in terms and "windows" not in terms
    assert eval_filter_row(filt, None, None, "c", 1, terms)
    # and a negated plural must correctly NOT match
    filt_n = SearchFilter(infirst=[("windows", True)])
    assert not eval_filter_row(filt_n, None, None, "c", 1, terms)


def test_first_turn_convs_analyzes_term(search_index):
    si = search_index
    stemmed = si.first_turn_convs("window")
    assert si.first_turn_convs("windows") == stemmed
    # sanity: the stored table only holds stemmed terms
    if si.st.exists("first_turn_terms"):
        rows = si.st.read(si.spark, "first_turn_terms").select("term").distinct().toPandas()
        assert all(s_stem(t) == t for t in rows["term"])


def test_search_df_infirst_matches_driver_path(spark, search_index):
    """Both paths resolve a PLURAL infirst term identically (and not
    to the empty set unless the singular is genuinely absent)."""
    si = search_index
    # tok0003 appears in many (not all) turn-0 texts; its plural stems
    # back to it, so 'infirst:tok0003s' must resolve identically
    sing = si.first_turn_convs("tok0003")
    assert sing, "corpus fixture changed: pick another turn-0 term"
    assert si.first_turn_convs("tok0003s") == sing
    drv = si.search("tok0010 infirst:tok0003s", k=5)
    dist = si.search_df("tok0010 infirst:tok0003s", k=5).toPandas()
    assert list(drv["doc_id"]) == list(dist["doc_id"])
    assert len(drv)  # the filter actually admits rows


# ---------------------------------------------------------------- 2 --

def test_incremental_full_rebuild_on_analyzer_change(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_analyzer")
    pdf = generate_pandas(12)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=4)
    st = IndexStorage(idx)
    meta = st.read_meta()
    assert meta["tokenizer"] == ANALYZER_VERSION
    meta["tokenizer"] = "tlgs_spark.tokenizer v1 (no stem)"
    st.write_meta(meta)
    res = incremental_update(spark, _spark_df(spark, pdf), idx, n_shards=4)
    assert res["reused"] == []  # same text, but analyzer changed → all rebuilt
    assert IndexStorage(idx).read_meta()["tokenizer"] == ANALYZER_VERSION


# ---------------------------------------------------------------- 3 --

def test_incremental_hygiene_flip_recomputes_doc_lengths(spark, tmp_path):
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_hyg")
    pdf = generate_pandas(6)
    # plant a junk separator line: hygiene=True drops it, so dl differs
    pdf = pdf.copy()
    pdf.loc[0, "text"] = "alpha beta\n=======\ngamma"
    victim_conv, victim_turn = pdf.loc[0, "conv_id"], pdf.loc[0, "turn_idx"]
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=2, hygiene=False)

    incremental_update(spark, _spark_df(spark, pdf), idx, n_shards=2, hygiene=True)
    st = IndexStorage(idx)
    assert st.read_meta()["hygiene"] is True
    docs = st.read(spark, "docs").select("doc_id", "conv_id", "turn_idx").toPandas()
    did = int(
        docs[(docs.conv_id == victim_conv) & (docs.turn_idx == victim_turn)].doc_id.iloc[0]
    )
    dl = st.read(spark, "doc_lengths").toPandas().set_index("doc_id")["dl"]
    # hygiene-on analysis of the planted text: the ===== line is gone
    assert int(dl.loc[did]) == len(tokenize("alpha beta\n=======\ngamma", hygiene=True))


# ---------------------------------------------------------------- 4 --

def test_bm25_helpers_dedupe_post_stem(spark):
    from tlgs_spark.oracle_sql import bm25_sql

    sql = bm25_sql(["window", "windows"], 5, "and")
    # one VALUES row and an AND-cardinality of 1, not 2
    assert sql.count("('window')") == 1
    assert "count(*) = 1" in sql


# ---------------------------------------------------------------- 5 --

def test_gc_deferred_until_vacuum(spark, tmp_path):
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx_gc")
    pdf = generate_pandas(10)
    build_index(spark, _spark_df(spark, pdf), idx, n_shards=3)
    old_docs_dir = IndexStorage(idx).path("docs")
    si_old = SearchIndex(spark, idx)
    before = si_old._meta_lookup(pd.Series([0, 1]).to_numpy())

    pdf2 = pdf.copy()
    pdf2.loc[pdf2.conv_id == pdf2.conv_id.iloc[0], "text"] = "edited text entirely"
    res = incremental_update(spark, _spark_df(spark, pdf2), idx, n_shards=3)
    assert res.get("mode") == "delta"
    changed_docs_dirs = [
        os.path.join(old_docs_dir, f"shard={s}") for s in res["changed"]
    ]
    reused_docs_dirs = [
        os.path.join(old_docs_dir, f"shard={s}") for s in res["reused"]
    ]

    # deferred: the superseded docs partitions are still on disk and
    # the old reader's resolved paths keep answering (its caches are
    # warm, but a fresh uncached lookup must also still succeed)
    assert all(os.path.isdir(d) for d in changed_docs_dirs)
    si_old._meta_cache.clear()
    si_old._arrow_cache.clear() if hasattr(si_old, "_arrow_cache") else None
    after = si_old._meta_lookup(pd.Series([0, 1]).to_numpy())
    pd.testing.assert_frame_equal(before, after)
    pending = json.load(open(os.path.join(idx, "gc_pending.json")))
    for d in changed_docs_dirs:
        assert any(e["path"] == d for e in pending)

    # a long grace keeps them; grace 0 retires the CHANGED partitions
    # only — the old base dir survives because the new manifest still
    # references its reused shard partitions (r4 delta semantics)
    st = IndexStorage(idx)
    assert st.vacuum(grace_s=3600.0) == []
    removed = st.vacuum(grace_s=0.0)
    for d in changed_docs_dirs:
        assert d in removed
        assert not os.path.isdir(d)
    for d in reused_docs_dirs:
        assert os.path.isdir(d)
    # the new committed index still reads fine
    si_new = SearchIndex(spark, idx)
    assert si_new.n_docs == len(pdf2)
