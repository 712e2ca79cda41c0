#!/usr/bin/env python
"""Measure the shard-presence BITMAP's scan cut on a mid-df term at
21M turns / 1024 shards (r4 verdict #3's "done" criterion).

The synthetic corpus's Zipf(1.1)/5k vocabulary is bimodal at 21M:
every vocab term lands in ~all 1024 shards and every marker term in
exactly one — the 65..1023-shard band the bitmap exists for (the
common case in REAL query logs) has no natural member. So this probe
PLANTS one: it appends the term ``midprobe`` to turn 0 of one
conversation per chosen shard (default: every 3rd shard ⇒ ~341 of
1024 — far past the 64-entry list cap, far from everywhere), builds
the 21M index from the transformed corpus, and measures, pruned vs
presence-disabled on the same index:

- driver path: ``term_rows`` wall time + fetched-row bytes for the
  mid-df term (pyarrow hive-partition + row-group pruning);
- driver cold search p50 over mid-term queries (AND with a dense term:
  the intersection prunes the DENSE term's scan too);
- distributed path: ``search_df`` wall time for the same queries;
- identity: pruned and unpruned results must match exactly.

Usage: python tools/midterm_probe.py [--convs 1000000]
       [--work /dev/shm/tlgs_21m] [--every 3] [--skip-build]
Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=1_000_000)
    ap.add_argument("--work", default="/dev/shm/tlgs_21m")
    ap.add_argument("--n-shards", type=int, default=1024)
    ap.add_argument("--every", type=int, default=3,
                    help="plant the term in every k-th shard")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing idx_mid build")
    args = ap.parse_args()

    os.environ.setdefault("TLGS_SPARK_LOCAL_DIR",
                          os.path.join(args.work, "spark_local"))
    os.environ.setdefault("TLGS_SPARK_DRIVER_MEM", "40g")

    import numpy as np
    from pyspark.sql import functions as F

    from tlgs_spark.indexer.build import build_index
    from tlgs_spark.query.engine import SearchIndex
    from tlgs_spark.session import get_spark

    spark = get_spark(app_name="midterm_probe", cores=args.cores)
    corpus = os.path.join(args.work, f"transcripts_{args.convs}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        corpus = os.path.join(args.work, "transcripts_1m")
    base = spark.read.parquet(corpus)

    # conv i occupies ~21 consecutive doc_ids ⇒ ~976 convs per 20,504-doc
    # shard; planting into conv i = shard*976 puts one occurrence into
    # each chosen shard (verified from term_stats below, not assumed)
    convs_per_shard = 976
    target_shards = list(range(0, args.n_shards, args.every))
    plant_convs = [f"conv{s * convs_per_shard:06d}" for s in target_shards]
    planted = base.withColumn(
        "text",
        F.when(
            F.col("conv_id").isin(plant_convs) & (F.col("turn_idx") == 0),
            F.concat(F.col("text"), F.lit(" midprobe")),
        ).otherwise(F.col("text")),
    )

    idx = os.path.join(args.work, "idx_mid")
    out: dict = {"convs": args.convs, "n_shards": args.n_shards,
                 "planted_shards_target": len(target_shards),
                 "loadavg_start": list(os.getloadavg())}
    if not args.skip_build or not os.path.exists(
        os.path.join(idx, "index_meta.json")
    ):
        import shutil
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        m = build_index(spark, planted, idx, n_shards=args.n_shards,
                        lineage="midterm_probe")
        out["build_s"] = round(time.time() - t0, 1)
        out["n_docs"] = m["n_docs"]

    si = SearchIndex(spark, idx)
    si_off = SearchIndex(spark, idx)
    si_off._query_shards = lambda *a, **k: None  # presence disabled

    info = si._term_info(["midprobe"])
    presence = info["midprobe"][1]
    out["midprobe_df"] = info["midprobe"][0]
    out["midprobe_shards"] = len(presence) if presence is not None else None
    assert presence is not None and 64 < len(presence) < args.n_shards, (
        "midprobe must live in the mid-df band", out["midprobe_shards"])

    def timed(fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.time()
            r = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, r

    # -- driver postings fetch (pyarrow) --
    def fetch(s, shards):
        pdf = s.term_rows(["midprobe"], shards=shards)
        return (len(pdf), int(pdf["postings"].map(len).sum()))

    t_pruned, (rows_p, bytes_p) = timed(lambda: fetch(si, presence))
    t_full, (rows_f, bytes_f) = timed(lambda: fetch(si_off, None))
    assert (rows_p, bytes_p) == (rows_f, bytes_f)
    out["term_rows"] = {
        "pruned_s": round(t_pruned, 3), "full_s": round(t_full, 3),
        "rows": rows_p, "postings_bytes": bytes_p,
    }

    # -- driver cold search (caches cleared per run) --
    queries = [("midprobe", "and"), ("midprobe tok0000", "and"),
               ("midprobe tok0001", "or")]

    def cold(s):
        res = []
        for q, m in queries:
            s._raw_cache.clear()
            s._filtered_cache.clear()
            if hasattr(s, "_term_cache"):
                s._term_cache.clear()
            t0 = time.time()
            r = s.search(q, k=10, mode=m)
            res.append(((time.time() - t0), r))
        return res

    runs_p = [cold(si) for _ in range(3)]
    runs_f = [cold(si_off) for _ in range(3)]
    out["driver_cold_s"] = {
        "pruned": [round(min(r[i][0] for r in runs_p), 3)
                   for i in range(len(queries))],
        "full": [round(min(r[i][0] for r in runs_f), 3)
                 for i in range(len(queries))],
    }
    for i in range(len(queries)):
        a, b = runs_p[0][i][1], runs_f[0][i][1]
        assert list(a["doc_id"]) == list(b["doc_id"]), queries[i]
        assert [float(x) for x in a["score"]] == [float(x) for x in b["score"]]

    # -- distributed path --
    def dist(s):
        res = []
        for q, m in queries:
            t0 = time.time()
            r = s.search_df(q, k=10, mode=m).collect()
            res.append(((time.time() - t0), r))
        return res

    dist(si)  # session warm (python workers, file index)
    runs_dp = [dist(si) for _ in range(3)]
    runs_df_ = [dist(si_off) for _ in range(3)]
    out["distributed_s"] = {
        "pruned": [round(min(r[i][0] for r in runs_dp), 3)
                   for i in range(len(queries))],
        "full": [round(min(r[i][0] for r in runs_df_), 3)
                 for i in range(len(queries))],
    }
    for i in range(len(queries)):
        a = [(row.doc_id, row.score) for row in runs_dp[0][i][1]]
        b = [(row.doc_id, row.score) for row in runs_df_[0][i][1]]
        assert a == b, queries[i]

    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
