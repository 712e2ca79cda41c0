"""Incremental re-index with per-shard change detection.

Reference semantics being reproduced (as resumable batch over the
index tables):

- raw-hash short-circuit: a page whose content hash is unchanged is
  not re-indexed (tlgs/crawler/crawler.cpp:424-429, 488-496)
- here lifted to shard granularity: a doc-range shard whose
  (doc_id → text_hash) multiset is unchanged keeps its postings
  segment verbatim; only changed shards rebuild
- the checkpoint ledger records rebuilt shards with lineage
  "incremental:<reason>"

Stats/norms/doc_lengths are always recomputed (cheap single pass) —
df/avgdl are global and must stay exact (north rule), so any text
change anywhere invalidates them; postings (the expensive artifact)
are what change detection protects.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexer.build import build_index
from ..indexer.storage import IndexStorage


def shard_signatures(docs: DataFrame, shard_size: int) -> DataFrame:
    """(shard, sig): order-independent signature of the shard's
    (doc_id, text_hash) pairs — bit_xor of a derived 64-bit mix
    (order-independent, no ANSI overflow; xxhash64 over both id and
    content so moved OR edited docs both flip the signature)."""
    return (
        docs.withColumn("shard", (F.col("doc_id") / F.lit(shard_size)).cast("int"))
        .withColumn("mix", F.xxhash64(F.col("doc_id").cast("string"), F.col("text_hash").cast("string")))
        .groupBy("shard")
        .agg(F.expr("bit_xor(mix)").alias("sig"), F.count("*").alias("n"))
    )


def incremental_update(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    n_shards: int | None = None,
    hygiene: bool | None = None,
) -> dict:
    """Bring ``index_dir`` up to date with ``transcripts``.

    1. Build the new docs/doc_lengths/stats/norms into a staging dir
       (full prepare pass — global stats must be exact).
    2. Diff per-shard signatures old vs new.
    3. Copy unchanged shards' postings verbatim; rebuild changed ones.
    4. Swap staging into place; ledger rows for reused shards carry
       status='reused'.
    Returns {"changed": [...], "reused": [...]}.
    """
    st_old = IndexStorage(index_dir)
    meta = st_old.read_meta()
    if n_shards is None:
        n_shards = meta["n_shards"]
    if hygiene is None:
        hygiene = meta.get("hygiene", False)

    stage_dir = index_dir.rstrip("/") + ".staging"
    shutil.rmtree(stage_dir, ignore_errors=True)
    st_new = IndexStorage(stage_dir)

    # full prepare, but defer ALL postings (max_shards_to_build=0);
    # doc lengths for unchanged texts come from the old index by
    # content hash (reuse_from) — only changed/new docs re-tokenize
    build_index(
        spark,
        transcripts,
        stage_dir,
        n_shards=n_shards,
        hygiene=hygiene,
        resume=False,
        max_shards_to_build=0,
        lineage="incremental:prepare",
        reuse_from=index_dir,
    )
    new_meta = st_new.read_meta()
    if new_meta["shard_size"] != meta["shard_size"]:
        # geometry changed (corpus grew past the old shard grid) →
        # everything rebuilds; still correct, just not incremental
        old_sigs = {}
    else:
        old = shard_signatures(
            st_old.read(spark, "docs").select("doc_id", "text_hash"), meta["shard_size"]
        ).collect()
        old_sigs = {r.shard: (r.sig, r.n) for r in old}
    new = shard_signatures(
        st_new.read(spark, "docs").select("doc_id", "text_hash"), new_meta["shard_size"]
    ).collect()
    new_sigs = {r.shard: (r.sig, r.n) for r in new}

    reused = sorted(s for s in new_sigs if old_sigs.get(s) == new_sigs[s])
    changed = sorted(s for s in new_sigs if s not in set(reused))

    # copy unchanged postings partitions + ledger rows for them
    import os

    os.makedirs(st_new.path("postings"), exist_ok=True)
    for s in reused:
        src = os.path.join(st_old.path("postings"), f"shard={s}")
        dst = os.path.join(st_new.path("postings"), f"shard={s}")
        # a zero-posting shard is "built" in the ledger but has no
        # partition dir — nothing to copy
        if os.path.isdir(src):
            shutil.copytree(src, dst)
    if reused:
        led = (
            st_old.read(spark, "ledger")
            .filter(F.col("shard").isin(reused))
            .withColumn("status", F.lit("reused"))
            .withColumn("lineage", F.lit("incremental:reused"))
        )
        led.write.mode("append").parquet(st_new.path("ledger"))

    # rebuild only the changed shards (resume skips the reused ones).
    # Called even when changed == []: the prepare pass above deferred
    # finalize (max_shards_to_build=0 ⇒ no postings yet), so term_stats
    # and the exact n_terms/n_postings only exist after this resume run
    # — skipping it on a no-change update would swap in an index with
    # no term_stats table and -1 placeholders in collection_stats.
    build_index(
        spark,
        transcripts,
        stage_dir,
        n_shards=n_shards,
        hygiene=hygiene,
        resume=True,
        lineage="incremental:changed",
    )

    # field sub-indexes live INSIDE index_dir and would be silently
    # dropped by the swap — note which exist and rebuild them after
    # (cheap: the title field is 5 tokens/doc)
    fields = [
        d.split("field_", 1)[1]
        for d in os.listdir(index_dir)
        if d.startswith("field_") and os.path.isdir(os.path.join(index_dir, d))
    ]

    # atomic-ish swap
    backup = index_dir.rstrip("/") + ".prev"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(index_dir, backup)
    os.rename(stage_dir, index_dir)
    shutil.rmtree(backup, ignore_errors=True)

    if fields:
        from ..indexer.build import build_field_index

        for f in fields:
            build_field_index(spark, index_dir, field=f)
    return {"changed": changed, "reused": reused, "fields_rebuilt": fields}


def purge_conversations(
    spark: SparkSession, transcripts: DataFrame, index_dir: str, conv_like: str
) -> dict:
    """S8/I5: purge — remove every turn of conversations matching the
    SQL LIKE pattern and bring the index up to date (``DELETE FROM
    pages WHERE url LIKE $1``, tlgs_ctl/main.cpp:87-95; 30-day
    tombstone purge, crawler.cpp:255,480,595). Doc_ids re-densify;
    only shards whose doc range shifted rebuild."""
    kept = transcripts.filter(~F.col("conv_id").like(conv_like))
    res = incremental_update(spark, kept, index_dir)
    res["purged_pattern"] = conv_like
    return res
