"""Score combine (F13/A7), result dedup (W4), engine cache (two-tier
TTL) — reference formulas from search.cpp:539-625,681-751."""

import math

import numpy as np
import pandas as pd
import pytest

from tlgs_spark.query.rerank import combine_scores, dedup_results


def test_combine_formula_exact():
    res = pd.DataFrame(
        {"doc_id": [1, 2, 3], "score": [1.0, 1.0, 1.0], "size": [100, 100, 100]}
    )
    link = {1: 2.0, 2: 1.0, 3: 0.0}
    out = combine_scores(res, link)
    # boost = exp(6.5 * salsa/max) (search.cpp:544)
    b1, b2, b3 = math.exp(6.5), math.exp(3.25), math.exp(0.0)
    exp_final = [2 * b * 1.0 / (b + 1.0) for b in (b1, b2, b3)]
    got = dict(zip(out.doc_id, out.final))
    assert got[1] == pytest.approx(exp_final[0], rel=1e-15)
    assert got[2] == pytest.approx(exp_final[1], rel=1e-15)
    assert got[3] == pytest.approx(exp_final[2], rel=1e-15)
    assert out.doc_id.tolist() == [1, 2, 3]  # sorted by final desc


def test_size_penalty_applied_above_48k():
    res = pd.DataFrame(
        {"doc_id": [1, 2], "score": [1.0, 1.0], "size": [48000, 51000]}
    )
    out = combine_scores(res, {})
    s = dict(zip(out.doc_id, out.final))
    # rank *= 1/ln(e + (size-48000)/3000) in size_t (search.cpp:549-551)
    pen = 1.0 / math.log(math.e + (51000 - 48000) // 3000)
    assert s[1] > s[2]
    text2 = 1.0 * pen
    b = 1.0  # exp(0) with empty link scores
    assert s[2] == pytest.approx(2 * b * text2 / (b + text2), rel=1e-12)


def test_size_penalty_integer_division_band():
    """48001..50999 bytes: (size-48000)//3000 == 0 → ln(e+0)=1 → NO
    penalty, exactly like the reference's size_t arithmetic."""
    res = pd.DataFrame(
        {"doc_id": [1, 2], "score": [1.0, 1.0], "size": [48000, 50999]}
    )
    out = combine_scores(res, {})
    s = dict(zip(out.doc_id, out.final))
    assert s[1] == pytest.approx(s[2], rel=0)


def test_boost_normalizer_spans_full_graph():
    """mx comes from the whole link-score vector, including nodes not
    present in the result frame (search.cpp:538)."""
    res = pd.DataFrame({"doc_id": [1], "score": [1.0], "size": [10]})
    out = combine_scores(res, {1: 0.3, 99: 0.9})
    assert out.boost.iloc[0] == pytest.approx(math.exp(6.5 * 0.3 / 0.9), rel=1e-12)


def test_dedup_keep_best_by_hash():
    res = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "score": [0.9, 0.7, 0.9, 0.5],
            "text_hash": [111, 111, 222, 222],
        }
    )
    out = dedup_results(res)
    assert out.doc_id.tolist() == [1, 3]  # max score per hash, min id on tie


def test_engine_dedup_and_cache(search_index):
    # duplicate texts exist? the synthetic corpus has no exact dups, so
    # dedup must be a no-op on doc sets — and the cache must hit.
    search_index._raw_cache.clear()
    search_index._filtered_cache.clear()
    h0 = search_index.cache_hits
    a = search_index.search("tok0000", k=10)
    b = search_index.search("tok0000", k=10)
    assert search_index.cache_hits >= h0 + 2  # raw + filtered tiers hit
    assert a.doc_id.tolist() == b.doc_id.tolist()
    c = search_index.search("tok0000", k=10, dedup=True)
    assert c.doc_id.tolist() == a.doc_id.tolist()  # no dups in corpus


def test_engine_dedup_collapses_real_duplicates(spark, tmp_path):
    from tlgs_spark.indexer.build import build_index
    from tlgs_spark.query.engine import SearchIndex

    rows = [
        ("c0", 0, "user", "needle alpha beta", None),
        ("c1", 0, "user", "needle alpha beta", None),  # exact dup
        ("c2", 0, "user", "needle gamma delta", None),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.Timestamp("2025-01-01")
    idx = str(tmp_path / "dd")
    build_index(spark, spark.createDataFrame(pdf), idx, n_shards=2)
    si = SearchIndex(spark, idx)
    plain = si.search("needle", k=10)
    deduped = si.search("needle", k=10, dedup=True)
    assert len(plain) == 3
    assert len(deduped) == 2
    assert 0 in deduped.doc_id.tolist() and 1 not in deduped.doc_id.tolist()
