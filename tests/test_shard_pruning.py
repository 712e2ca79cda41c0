"""Term→shard scan pruning + the single-stage distributed scorer.

term_stats carries a shard-presence list for selective terms
(build-time, ≤ TERM_SHARDS_MAX shards); search_df intersects (AND) /
unions (OR) the lists and prunes the postings scan to those hive
partitions. Dense terms (NULL list) scan everything, and the
single-stage mapInPandas scorer still matches the driver path.
"""

import pandas as pd
from pyspark.sql import functions as F

from tlgs_spark.indexer.build import TERM_SHARDS_MAX, build_index
from tlgs_spark.indexer.storage import IndexStorage
from tlgs_spark.query.engine import SearchIndex


def _build(spark, tmp_path):
    rows = []
    # 12 convs × 10 turns; a unique marker term lives ONLY in conv 3
    for c in range(12):
        for t in range(10):
            text = f"alpha tok{t:02d} beta common"
            if c == 3 and t == 0:
                text += " rareterm"
            rows.append((f"c{c:04d}", t, "user", text, None))
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.current_timestamp())
    idx = str(tmp_path / "idx_prune")
    build_index(spark, sdf, idx, n_shards=6)
    return idx


def test_term_stats_carries_bounded_shard_lists(spark, tmp_path):
    idx = _build(spark, tmp_path)
    ts = IndexStorage(idx).read(spark, "term_stats").toPandas().set_index("term")
    assert "shards" in ts.columns
    # rareterm: exactly one shard listed
    assert list(ts.loc["rareterm"].shards) == [0] or len(ts.loc["rareterm"].shards) == 1
    # dense term: list present only because n_shards(6) <= TERM_SHARDS_MAX;
    # its list covers every shard
    assert TERM_SHARDS_MAX >= 6
    assert len(ts.loc["common"].shards) == 6


def test_query_shards_and_pruned_plan(spark, tmp_path):
    idx = _build(spark, tmp_path)
    si = SearchIndex(spark, idx)
    info = si._term_info(["rareterm", "common", "nosuchterm"])
    assert info["rareterm"][1] is not None and len(info["rareterm"][1]) == 1
    rare_shard = info["rareterm"][1][0]
    # AND with a dense term intersects down to the rare term's shard
    assert si._query_shards(["rareterm", "common"], info, "and") == [rare_shard]
    # OR unions; missing terms are skipped
    assert si._query_shards(["rareterm", "nosuchterm"], info, "or") == [rare_shard]
    # the pruned plan carries the shard predicate (hive partition
    # pruning) and still matches the driver path
    plan = si.search_df("rareterm common", k=5)._jdf.queryExecution().executedPlan().toString()
    assert f"shard#" in plan and str(rare_shard) in plan
    res = si.search_df("rareterm common", k=5).toPandas()
    drv = si.search("rareterm common", k=5)
    assert list(res.doc_id) == list(drv.doc_id)
    assert len(res) == 1  # only conv 3 turn 0 has rareterm


def test_empty_intersection_short_circuits(spark, tmp_path):
    idx = _build(spark, tmp_path)
    si = SearchIndex(spark, idx)
    # fake info with disjoint shard lists → AND prunes to nothing
    info = {"a": (1, [0]), "b": (1, [3])}
    assert si._query_shards(["a", "b"], info, "and") == []


def test_single_stage_path_matches_grouped_path(spark, tmp_path):
    idx = _build(spark, tmp_path)
    si = SearchIndex(spark, idx)
    assert si._one_file_per_shard
    queries = [("common alpha", "and"), ("tok00 tok05", "or"), ("rareterm", "and")]
    fast = {q: si.search_df(q, k=8, mode=m).toPandas() for q, m in queries}
    si._ofps = False  # force the grouped fallback
    for q, m in queries:
        slow = si.search_df(q, k=8, mode=m).toPandas()
        pd.testing.assert_frame_equal(fast[q], slow)


def test_driver_path_pruned_lookup_identical(spark, tmp_path):
    """The driver path (term_data → term_rows) restricts the postings
    pyarrow scan to the union of the query terms' presence lists; the
    fetched TermData must be complete (full per-term postings), so the
    results — ids AND scores — match an unpruned twin exactly, and the
    per-term cache stays valid across queries with different modes."""
    idx = _build(spark, tmp_path)
    si = SearchIndex(spark, idx)
    si_full = SearchIndex(spark, idx)
    si_full._query_shards = lambda *a, **k: None  # disable pruning
    for q, m in [("rareterm", "and"), ("rareterm common", "and"),
                 ("tok00 tok05", "or"), ("alpha", "or")]:
        a = si.search(q, k=8, mode=m)
        b = si_full.search(q, k=8, mode=m)
        pd.testing.assert_frame_equal(a, b)
    # cached TermData fetched under an AND query serves an OR query of
    # the same term with full postings (the restriction is per-term
    # coverage, not per-query intersection)
    td = si.term_data(["rareterm"])[0]
    assert td.df_global == 1
    td_common = si.term_data(["common"])[0]
    assert td_common.df_global == 120  # every turn


def test_big_corpus_route_matches_driver_path(spark, tmp_path):
    """Past driver_path_max_docs, search() routes its raw scoring
    through the distributed per-shard core (the 63M probe measured the
    driver pull at cold p50 ~20 s there). Results must be IDENTICAL to
    the in-process path — ids, float-exact scores, filters, pagination —
    since only the physical scoring strategy changes."""
    from tlgs_spark.corpus import generate_pandas

    idx = str(tmp_path / "idx_route")
    pdf = generate_pandas(20)
    build_index(spark, spark.createDataFrame(pdf), idx, n_shards=6)

    queries = [
        ("tok0000 tok0001", "or"),
        ("tok0000 tok0001", "and"),
        ("marker000", "or"),
        ("tok0002 role:assistant", "or"),
        ("tok0001 size:>100", "and"),
    ]
    si_small = SearchIndex(spark, idx)
    si_big = SearchIndex(spark, idx)
    si_big.driver_path_max_docs = 0  # force the distributed route
    for q, mode in queries:
        a = si_small.search(q, k=10, mode=mode)
        b = si_big.search(q, k=10, mode=mode)
        assert list(a["doc_id"]) == list(b["doc_id"]), (q, mode)
        assert [float(x) for x in a["score"]] == [float(x) for x in b["score"]], (q, mode)
    # pagination through the big route
    p1 = si_big.search("tok0001", k=5, page=1)
    full = si_small.search("tok0001", k=10)
    assert list(p1["doc_id"]) == list(full["doc_id"][5:10])
