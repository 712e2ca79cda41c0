"""Physical-plan checks: the plans must be the plans we designed —
predicate pushdown into parquet for term lookups, partition pruning on
shard, broadcast for small dimension joins, whole-stage codegen for
JVM-side operators."""

from pyspark.sql import functions as F

from tlgs_spark.indexer.storage import IndexStorage


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_term_lookup_pushes_down(spark, index_dir):
    posts = IndexStorage(index_dir).read(spark, "postings")
    plan = _plan(posts.filter(F.col("term").isin(["tok0001", "tok0002"])))
    assert "PushedFilters" in plan
    assert "In(term" in plan or "term" in plan.split("PushedFilters")[1][:200]


def test_shard_partition_pruning(spark, index_dir):
    posts = IndexStorage(index_dir).read(spark, "postings")
    plan = _plan(posts.filter(F.col("shard") == 3))
    # shard is a partition column → pruned at planning, not scanned
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "shard" in seg


def test_docs_scan_prunes_columns(spark, index_dir):
    docs = IndexStorage(index_dir).read(spark, "docs")
    plan = _plan(docs.select("doc_id", "conv_id"))
    seg = plan.split("ReadSchema")[1][:300]
    assert "text" not in seg  # full text column not read for id projections


def test_small_dim_join_broadcasts(spark, index_dir):
    st = IndexStorage(index_dir)
    posts = st.read(spark, "postings").filter(F.col("term").isin(["tok0001"]))
    norms = st.read(spark, "norms")
    plan = _plan(posts.join(F.broadcast(norms), "shard"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_agg_has_map_side_partial(spark, index_dir):
    # partial+final hash agg (map-side combine) — not a raw shuffle of rows
    docs = IndexStorage(index_dir).read(spark, "docs")
    plan = _plan(docs.groupBy("role").agg(F.count("*")))
    assert "partial_count" in plan
    assert plan.index("partial_count") < plan.index("Exchange") or "Exchange" in plan


def test_doc_range_filter_prunes_row_groups(spark, index_dir):
    docs = IndexStorage(index_dir).read(spark, "docs")
    plan = _plan(docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)))
    assert "PushedFilters" in plan
    seg = plan.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(doc_id" in seg or "doc_id" in seg


def test_shingles_stay_map_side(spark, index_dir):
    # k-gram shingling is in-array slices + one explode: no shuffle, no
    # per-doc window sort anywhere in the plan
    from tlgs_spark.ops.dedup import shingles

    docs = IndexStorage(index_dir).read(spark, "docs")
    plan = _plan(shingles(docs, k=3))
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_ivf_assignment_stays_map_side(spark, index_dir):
    # centroid argmax is array_position(array_max): a narrow projection
    from tlgs_spark.ops.similarity import ivf_assign

    docs = IndexStorage(index_dir).read(spark, "docs")
    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.array_repeat((F.col("doc_id") % 7).cast("float") + 0.5, 8).alias("embedding"),
    )
    assigned, _ = ivf_assign(emb, n_centroids=4, dim=8)
    plan = _plan(assigned)
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_minhash_bands_single_shuffle_no_band_explode(spark, index_dir):
    # r2 kernel: one md5 per shingle, rotation family as expressions,
    # ALL band minima from one map-side-partial groupBy(id) — exactly
    # one Exchange in the plan and no explode of the shingle stream
    # by band (the r1 version shuffled a ×n_bands explosion)
    from tlgs_spark.ops.dedup import minhash_bands

    import re

    docs = IndexStorage(index_dir).read(spark, "docs")
    plan = _plan(minhash_bands(docs.select("doc_id", "text")))
    # count physical nodes via the details-section headers "(n) Name"
    assert len(re.findall(r"\(\d+\) \w*Exchange", plan)) == 1
    # the only Generates are the shingle explode and the 4-element
    # post-aggregation band unpivot (over n_docs rows, not the stream)
    assert len(re.findall(r"\(\d+\) Generate", plan)) <= 2
    assert "partial_min" in plan  # map-side combine before the shuffle


def test_simhash_is_arrow_batched(spark, index_dir):
    # the data-plane simhash is ONE Arrow-batched python stage — no
    # row-at-a-time BatchEvalPython, no shuffle
    from tlgs_spark.ops.textstats import simhash64

    docs = IndexStorage(index_dir).read(spark, "docs")
    plan = _plan(simhash64(docs.select("doc_id", "text")))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_url_merge_pairs_is_hash_bucketed(spark, index_dir):
    # W4 pair predicate: self-join strictly on the content-hash key —
    # never a cartesian/nested-loop expansion
    from tlgs_spark.ops.dedup import url_merge_pairs

    docs = IndexStorage(index_dir).read(spark, "docs")
    frame = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("gemini://h/"), F.col("doc_id")).alias("url"),
        (F.col("doc_id") % 10).alias("content_hash"),
        F.lit(100).alias("size"),
    )
    plan = _plan(url_merge_pairs(frame))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
