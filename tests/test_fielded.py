"""Field-weighted (title_vector analog) search: engine vs oracle
rank+score identity.

The field index is built by build_field_index over the SAME docs table
(first-5-token 'title' field, tlgs_ctl/main.cpp:33 analog); doc_ids
align by construction. oracle.search_fielded mirrors search.cpp:438-442
semantics (body-only candidate match, body + 50·title score).
"""

import os

import pytest

from tlgs_spark import oracle as O
from tlgs_spark.indexer.build import build_field_index, field_index_dir

QUERIES = [
    ("tok0000", "and"),
    ("tok0001", "or"),
    ("tok0000 tok0001", "and"),
    ("tok0002 tok0005", "or"),
    ("marker000", "and"),
    ("tok0003 tok0004 tok0010", "or"),
]


@pytest.fixture(scope="module")
def field_dir(spark, index_dir):
    d = field_index_dir(index_dir)
    if not os.path.exists(os.path.join(d, "index_meta.json")):
        build_field_index(spark, index_dir)
    return d


@pytest.fixture(scope="module")
def oracle_title_index(corpus_pdf):
    texts = [O.title_text(t) for t in corpus_pdf.text]
    return O.build_index(list(enumerate(texts)))


def test_field_index_aligns_with_body(spark, index_dir, field_dir, oracle_title_index):
    from tlgs_spark.indexer.storage import IndexStorage

    body_meta = IndexStorage(index_dir).read_meta()
    f_meta = IndexStorage(field_dir).read_meta()
    assert f_meta["n_docs"] == body_meta["n_docs"]
    assert f_meta["shard_size"] == body_meta["shard_size"]
    dl = {r.doc_id: r.dl for r in IndexStorage(field_dir).read(spark, "doc_lengths").collect()}
    assert dl == oracle_title_index.doc_lengths


@pytest.mark.parametrize("query,mode", QUERIES)
def test_fielded_rank_identity(query, mode, search_index, field_dir,
                               oracle_index, oracle_title_index):
    exp = O.search_fielded(oracle_index, oracle_title_index, query, k=10, mode=mode)
    got = search_index.search_fielded(query, k=10, mode=mode)
    got_pairs = list(zip((int(d) for d in got["doc_id"]), got["score"]))
    assert got_pairs == exp  # doc_ids AND float64 scores, bit-identical


@pytest.mark.parametrize("query,mode", QUERIES)
def test_fielded_distributed_path_identity(query, mode, search_index, field_dir,
                                           oracle_index, oracle_title_index):
    exp = O.search_fielded(oracle_index, oracle_title_index, query, k=10, mode=mode)
    rows = search_index.search_df_fielded(query, k=10, mode=mode).collect()
    assert [(r.doc_id, r.score) for r in rows] == exp


@pytest.mark.parametrize("query,mode", QUERIES[:3])
def test_fielded_distributed_norms_join_fallback(query, mode, search_index,
                                                 field_dir, oracle_index,
                                                 oracle_title_index):
    """Past dl_broadcast_max_docs the fielded path delivers doc lengths
    via the per-shard norms join (format-2 postings carry their own dls
    pseudo-column — the join must not collide). Same results bit-for-bit."""
    old = search_index.dl_broadcast_max_docs
    try:
        search_index.dl_broadcast_max_docs = 0  # force the join branch
        exp = O.search_fielded(oracle_index, oracle_title_index, query, k=10, mode=mode)
        rows = search_index.search_df_fielded(query, k=10, mode=mode).collect()
        assert [(r.doc_id, r.score) for r in rows] == exp
    finally:
        search_index.dl_broadcast_max_docs = old


def test_title_hit_outranks_body_only(search_index, field_dir, corpus_pdf):
    """A term appearing in a doc's first-5 tokens must outrank an
    equal-body-score doc without the title hit (weight 50 dominates)."""
    # find a term that is some doc's first token
    first_tok = O.title_text(corpus_pdf.text.iloc[0]).split(" ")[0]
    got = search_index.search_fielded(first_tok, k=5, mode="or")
    if len(got) >= 2:
        top = int(got["doc_id"].iloc[0])
        assert first_tok in O.title_text(corpus_pdf.text.iloc[top]).split(" ")


def test_incremental_rebuilds_field_index(spark, tmp_path):
    """Field sub-indexes live inside index_dir; the incremental swap
    must rebuild them so fielded search stays correct after an update."""
    from pyspark.sql import functions as F

    from tlgs_spark.corpus import generate_spark
    from tlgs_spark.indexer.build import build_index
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.streaming.incremental import incremental_update

    idx = str(tmp_path / "idx")
    sdf = generate_spark(spark, 12, partitions=2)
    build_index(spark, sdf, idx, n_shards=4)
    build_field_index(spark, idx)

    edited = sdf.withColumn(
        "text",
        F.when(F.col("conv_id") == "conv000000",
               F.concat(F.lit("zzedited "), F.col("text"))).otherwise(F.col("text")),
    )
    res = incremental_update(spark, edited, idx)
    assert res["fields_rebuilt"] == ["first5"]

    rows = sorted(edited.select("conv_id", "turn_idx", "text").collect(),
                  key=lambda r: (r.conv_id, r.turn_idx))
    body = O.build_index(list(enumerate(r.text for r in rows)))
    title = O.build_index(list(enumerate(O.title_text(r.text) for r in rows)))
    si = SearchIndex(spark, idx)
    for q in ["zzedited", "tok0000"]:
        exp = O.search_fielded(body, title, q, k=5, mode="or")
        got = si.search_fielded(q, k=5, mode="or")
        assert list(zip((int(d) for d in got["doc_id"]), got["score"])) == exp
    # the edited prefix is now a title hit for conv000000's turns
    assert len(si.search_fielded("zzedited", k=5)) > 0
