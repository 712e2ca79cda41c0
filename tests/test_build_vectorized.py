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
    avgdl = 57.3
    out = _build_shard(pdf.copy(), shard_size, avgdl)

    ref = pdf.sort_values(["term", "doc_id"])
    dl = ref.groupby("doc_id")["tf"].sum()
    assert sorted(out["term"]) == sorted(ref["term"].unique())
    for _, r in out.iterrows():
        g = ref[ref.term == r["term"]]
        d = g.doc_id.to_numpy()
        t = g.tf.to_numpy()
        assert bytes(r["postings"]) == encode_postings(d, t, base=base)
        assert r["df"] == len(d)
        dls = dl.loc[d].to_numpy().astype(float)
        tfn = t * (bm25.K1 + 1) / (t + bm25.K1 * (1 - bm25.B + bm25.B * dls / avgdl))
        assert abs(r["max_tfn"] - tfn.max()) < 1e-12
        nb = (len(d) + 127) // 128
        assert len(r["block_max"]) == nb and len(r["block_last"]) == nb
        for b in range(nb):
            blk = tfn[b * 128 : (b + 1) * 128]
            assert float(r["block_max"][b]) >= blk.max()  # admissible bound
            assert r["block_last"][b] == d[min((b + 1) * 128, len(d)) - 1]
        dd, tt = decode_postings(bytes(r["postings"]), base=base)
        assert (dd == d).all() and (tt == t).all()


def test_single_term_shard():
    pdf = pd.DataFrame({"doc_id": [10, 11, 12], "term": ["x"] * 3, "tf": [1, 2, 3]})
    out = _build_shard(pdf, 100, 2.0)
    assert len(out) == 1
    d, t = decode_postings(bytes(out["postings"].iloc[0]), base=0)
    assert d.tolist() == [10, 11, 12] and t.tolist() == [1, 2, 3]
