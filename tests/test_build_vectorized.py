"""The vectorized whole-shard encoder must equal a naive per-term
reference implementation byte-for-byte."""

import numpy as np
import pandas as pd

from tlgs_spark import bm25
from tlgs_spark.indexer.build import _build_shard
from tlgs_spark.indexer.codec import decode_postings, encode_postings


def test_build_shard_matches_naive_reference():
    rng = np.random.default_rng(5)
    shard_size, base = 1000, 3000
    rows = []
    for term in [f"t{i}" for i in range(40)]:
        df = int(rng.integers(1, 400))
        ids = np.sort(rng.choice(shard_size, df, replace=False)) + base
        for d in ids:
            rows.append((int(d), term, int(rng.integers(1, 9))))
    pdf = pd.DataFrame(rows, columns=["doc_id", "term", "tf"]).sample(
        frac=1, random_state=1
    )
    out = _build_shard(pdf.copy(), shard_size)

    ref = pdf.sort_values(["term", "doc_id"])
    dl = ref.groupby("doc_id")["tf"].sum()
    norms_rows = out[out["term"].isnull()]
    out = out[out["term"].notnull()]
    assert sorted(out["term"]) == sorted(ref["term"].unique())
    for _, r in out.iterrows():
        g = ref[ref.term == r["term"]]
        d = g.doc_id.to_numpy()
        t = g.tf.to_numpy()
        assert bytes(r["postings"]) == encode_postings(d, t, base=base)
        assert r["df"] == len(d)
        dls = dl.loc[d].to_numpy()
        nb = (len(d) + 127) // 128
        # format 2: per-block (max tf, min dl) integer bounds
        assert len(r["block_tfmax"]) == nb and len(r["block_dlmin"]) == nb
        assert len(r["block_last"]) == nb
        for b in range(nb):
            sl = slice(b * 128, (b + 1) * 128)
            assert r["block_tfmax"][b] == t[sl].max()
            assert r["block_dlmin"][b] == dls[sl].min()
            assert r["block_last"][b] == d[min((b + 1) * 128, len(d)) - 1]
        dd, tt = decode_postings(bytes(r["postings"]), base=base)
        assert (dd == d).all() and (tt == t).all()
    # the norms pseudo row: one per shard, dls blob == exact doc lengths
    assert len(norms_rows) == 1
    nr = norms_rows.iloc[0]
    from tlgs_spark.indexer.codec import decode_varints

    dls_arr = decode_varints(bytes(nr["dls"]))
    assert len(dls_arr) == shard_size and nr["block_last"][0] == base
    assert int(nr["cf"]) == int(ref["tf"].sum())
    for doc, want in dl.items():
        assert dls_arr[doc - base] == want


def test_single_term_shard():
    pdf = pd.DataFrame({"doc_id": [10, 11, 12], "term": ["x"] * 3, "tf": [1, 2, 3]})
    out = _build_shard(pdf, 100)
    out_t = out[out["term"].notnull()]
    assert len(out_t) == 1 and len(out) == 2  # + the norms pseudo row
    d, t = decode_postings(bytes(out_t["postings"].iloc[0]), base=0)
    assert d.tolist() == [10, 11, 12] and t.tolist() == [1, 2, 3]


TRICKY_DOCS = [
    (0, "Hello WORLD the and hello"),  # case fold + stopwords + repeats
    (1, ""),  # empty
    (2, None),  # null text
    (3, "x" * 65 + " ok " + "y" * 64),  # length-64 boundary
    (4, "naïve café ümlaut 日本語 a1b2"),  # non-ASCII separators
    (5, "keep\n────────\nalso\nxxxx\nend"),  # hygiene: box + repeat lines
    (6, "tab\tsep,punct.and;more!tok"),
    (7, "İstanbul STRASSE ẞharp"),  # exotic lowercase mappings
    (8, "line with \x00 embedded nul and more"),
    (9, "0123 42abc"),
    (10, "keep\r\nxxxx\r\nend\r\n"),  # CRLF: junk line NOT dropped (spec: $ is \n-only)
]


def _counter_frame(hygiene):
    from tlgs_spark.tokenizer import term_freqs

    rows = []
    for doc_id, text in TRICKY_DOCS:
        for term, tf in sorted(term_freqs(text or "", hygiene=hygiene).items()):
            rows.append((doc_id, term, tf))
    return sorted(rows)


import pytest


@pytest.mark.parametrize("hygiene", [False, True])
def test_jvm_pandas_oracle_tokenize_equivalence(spark, hygiene):
    """The JVM-expression tokenizer, the Arrow/pandas tokenizer, and
    the pure-Python oracle spec must produce identical (doc_id, term,
    tf) on case folds, stopwords, nulls, NULs, non-ASCII, length
    boundaries and hygiene lines."""
    from tlgs_spark.indexer.build import tokenize_tokens, tokenize_tokens_jvm

    docs = spark.createDataFrame(TRICKY_DOCS, "doc_id long, text string")
    jvm = sorted(
        (r.doc_id, r.term, r.tf)
        for r in tokenize_tokens_jvm(docs, hygiene=hygiene).collect()
    )
    pan = sorted(
        (r.doc_id, r.term, r.tf)
        for r in tokenize_tokens(docs, hygiene=hygiene).collect()
    )
    oracle = _counter_frame(hygiene)
    assert jvm == pan == oracle


def test_tokenize_with_dl_rows(spark):
    """with_dl=True emits one term=NULL row per doc whose tf is the doc
    length (kept tokens), including zero-token docs."""
    from tlgs_spark.indexer.build import tokenize_tokens

    docs = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "the and of"), (2, None), (3, "gamma")],
        "doc_id long, text string",
    )
    rows = tokenize_tokens(docs, with_dl=True).collect()
    dl = {r.doc_id: r.tf for r in rows if r.term is None}
    terms = [(r.doc_id, r.term, r.tf) for r in rows if r.term is not None]
    assert dl == {0: 3, 1: 0, 2: 0, 3: 1}
    assert sorted(terms) == [(0, "alpha", 2), (0, "beta", 1), (3, "gamma", 1)]
