"""End-to-end rank identity: Spark engine vs pure-Python oracle over
the reference query set (FIXTURES.md §3).

Every query must produce identical top-k doc_ids AND bit-identical
float64 BM25 scores on both the driver path and the distributed
per-shard path. This is the correctness contract of BASELINE.json.
"""

import numpy as np
import pytest

from tlgs_spark import oracle as O
from tlgs_spark.query.engine import EmptyQueryError
from tlgs_spark.query.parser import eval_filter_row, parse_search_query
from tlgs_spark.tokenizer import tokenize

# The reference query set lives in tests/fixtures/queries.jsonl
# (FIXTURES.md §3): hot/mid/rare single terms, multi-term AND, filters,
# negation, OR-within/AND-across, infirst, zero-result + pagination.
import json
import os

_QFILE = os.path.join(os.path.dirname(__file__), "fixtures", "queries.jsonl")
with open(_QFILE) as _f:
    QUERY_SET = [
        (d["qid"], d["query"], d["k"], d["mode"])
        for d in (json.loads(line) for line in _f if line.strip())
    ]


def oracle_result(oracle_index, corpus_pdf, query, k, mode, first_tokens):
    """Oracle with the same filter semantics applied post-rank."""
    text_query, filt = parse_search_query(query)
    full = O.search(oracle_index, text_query, k=len(corpus_pdf), mode=mode)
    if filt.is_empty():
        return full[:k]
    meta = corpus_pdf
    out = []
    for doc_id, score in full:
        m = meta.iloc[doc_id]
        if eval_filter_row(
            filt,
            m["tool"],
            m["role"],
            m["conv_id"],
            len(m["text"]),
            first_tokens.get(m["conv_id"], frozenset()),
        ):
            out.append((doc_id, score))
        if len(out) >= k:
            break
    return out[:k]


@pytest.fixture(scope="module")
def first_tokens(corpus_pdf):
    t0 = corpus_pdf[corpus_pdf.turn_idx == 0]
    return {r.conv_id: frozenset(tokenize(r.text)) for r in t0.itertuples()}


@pytest.mark.parametrize("qid,query,k,mode", QUERY_SET)
def test_driver_path_rank_identity(
    search_index, oracle_index, corpus_pdf, first_tokens, qid, query, k, mode
):
    expected = oracle_result(oracle_index, corpus_pdf, query, k, mode, first_tokens)
    res = search_index.search(query, k=k, mode=mode)
    got = list(zip(res.doc_id.tolist(), res.score.tolist()))
    assert got == expected, f"qid={qid} driver mismatch"


@pytest.mark.parametrize("qid,query,k,mode", QUERY_SET)
def test_distributed_path_rank_identity(
    search_index, oracle_index, corpus_pdf, first_tokens, qid, query, k, mode
):
    expected = oracle_result(oracle_index, corpus_pdf, query, k, mode, first_tokens)
    rows = search_index.search_df(query, k=k, mode=mode).collect()
    got = [(r.doc_id, r.score) for r in rows]
    assert got == expected, f"qid={qid} distributed mismatch"


def test_pagination_slices(search_index, oracle_index, corpus_pdf, first_tokens):
    full = oracle_result(oracle_index, corpus_pdf, "tok0000", 30, "and", first_tokens)
    for page in (0, 1, 2):
        res = search_index.search("tok0000", k=10, page=page)
        got = list(zip(res.doc_id.tolist(), res.score.tolist()))
        assert got == full[page * 10 : (page + 1) * 10], f"page={page}"


def test_filter_only_query_rejected(search_index):
    # reference rejects filter-only queries (doc_search.csp:28-29)
    with pytest.raises(EmptyQueryError):
        search_index.search("tool:bash")
    with pytest.raises(EmptyQueryError):
        search_index.search("")


def test_scores_are_float64_exact(search_index, oracle_index, corpus_pdf, first_tokens):
    """Not approximately equal — bit-identical (north rule: idf/tf
    pipeline must match the reference engine bit-for-bit)."""
    exp = oracle_result(oracle_index, corpus_pdf, "tok0001 tok0002", 10, "and", first_tokens)
    res = search_index.search("tok0001 tok0002", k=10)
    for (ed, es), (gd, gs) in zip(exp, zip(res.doc_id, res.score)):
        assert ed == gd
        assert np.float64(es).view(np.int64) == np.float64(gs).view(np.int64)


# --- property-based identity: random queries from the corpus vocab ---------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def vocab(corpus_pdf):
    """A spread of real corpus terms: hot head, mid, and rare tail."""
    from collections import Counter

    c = Counter()
    for t in corpus_pdf["text"]:
        c.update(set(tokenize(t)))
    ranked = [w for w, _ in c.most_common()]
    return ranked[:5] + ranked[len(ranked) // 2 : len(ranked) // 2 + 10] + ranked[-10:]


@given(data=st.data())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_query_rank_identity(
    data, search_index, oracle_index, corpus_pdf, first_tokens, vocab
):
    """Any term combination (hot/mid/rare mix), any k, both modes:
    driver-path results must equal the oracle exactly — ids AND
    float64 scores."""
    terms = data.draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=4))
    k = data.draw(st.integers(min_value=1, max_value=30))
    mode = data.draw(st.sampled_from(["and", "or"]))
    query = " ".join(terms)
    expected = oracle_result(oracle_index, corpus_pdf, query, k, mode, first_tokens)
    res = search_index.search(query, k=k, mode=mode)
    got = list(zip(res.doc_id.tolist(), res.score.tolist()))
    assert got == expected, (query, k, mode)


def test_distributed_path_norms_join_fallback(
    search_index, oracle_index, corpus_pdf, first_tokens
):
    """Corpora too large for a dl broadcast use the per-shard norms
    join — same results bit-for-bit."""
    old = search_index.dl_broadcast_max_docs
    try:
        search_index.dl_broadcast_max_docs = 0  # force the join branch
        for query, k, mode in [("tok0000 tok0001", 10, "and"), ("tok0002", 15, "or")]:
            expected = oracle_result(
                oracle_index, corpus_pdf, query, k, mode, first_tokens
            )
            rows = search_index.search_df(query, k=k, mode=mode).collect()
            assert [(r.doc_id, r.score) for r in rows] == expected, query
    finally:
        search_index.dl_broadcast_max_docs = old


def test_hygiene_index_rank_identity(spark, tmp_path):
    """Index built with hygiene=True must be rank-identical to the
    hygiene oracle (junk lines dropped before tokenization on both
    sides) — end-to-end, not just tokenizer-level."""
    import pyspark.sql.functions as F

    from tlgs_spark.indexer.build import build_index
    from tlgs_spark.query.engine import SearchIndex

    rows = []
    for i in range(24):
        text = f"alpha tok{i}\n────────\nbeta only here\nxxxx\ngamma tok{i%5}"
        rows.append((f"c{i:03d}", 0, "user", text, None))
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    idx = str(tmp_path / "idx_hyg")
    build_index(spark, sdf, idx, n_shards=3, hygiene=True)
    si = SearchIndex(spark, idx)
    docs = spark.read.parquet(f"{idx}/docs").select("doc_id", "text").orderBy("doc_id").collect()
    oidx = O.build_index([(r.doc_id, r.text) for r in docs], hygiene=True)
    for q in ["alpha beta", "gamma", "tok3"]:
        exp = O.search(oidx, q, k=10)
        res = si.search(q, k=10)
        assert list(zip(res.doc_id.tolist(), res.score.tolist())) == exp, q
        got_df = [(r.doc_id, r.score) for r in si.search_df(q, k=10).collect()]
        assert got_df == exp, ("df", q)
