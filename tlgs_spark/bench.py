"""Benchmark harness (import side of bench.py).

Measures, at a given core count:
- index-build throughput (turns/sec) over a deterministic synthetic
  transcript corpus (the north-rule headline metric)
- top-k BM25 query latency (p50/p95 over a mixed query set, driver
  serving path) + distributed-path latency
- timings of the entry-query suite against $SPARK_GRAFT_SF_DIR

Scaling evidence (sandbox stand-in for N vs 4N executors): the same
build is run in two fresh JVMs at local[8] and local[32] on the same
corpus parquet; efficiency = (thr_32 / thr_8) / 4.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

QUERY_SET = [
    ("tok0000", "and"),
    ("tok0005", "and"),
    ("tok0050", "and"),
    ("tok0500", "and"),
    ("marker000", "and"),
    ("tok0001 tok0002", "and"),
    ("tok0000 tok0010 tok0100", "and"),
    ("tok0003 tool:bash", "and"),
    ("tok0004 NOT role:assistant", "and"),
    ("tok0002 size:>1K", "and"),
    ("tok0000 tok0123 tok0456", "or"),
    ("tok0007 tok0008 tok0009 tok0010", "or"),
    ("marker001 tok0000", "or"),
    ("tok0200 tok0300", "or"),
    ("tok0666 tok0777 tok0888", "or"),
]


def _warm_cluster(spark, cores: int, index_dir: str) -> None:
    """Pre-timing cluster warmup on TINY synthetic frames (~2k rows —
    never the corpus): JVM whole-stage-codegen/JIT compile for every
    operator shape the build uses, python-worker pool spawn, parquet
    reader/writer + output-committer init. A long-lived multi-executor
    cluster pays these exactly once per session; at the small local
    corpora the first-job compile costs (~4-6 s, identical at ANY
    corpus size and any core count) would otherwise sit inside the
    timed region as pure serial fraction and distort the N→4N ratio.
    Cluster startup is not build throughput."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    # JVM agg + python-worker spawn (the original warmup)
    spark.range(0, 1_000_000, 1, cores).selectExpr("sum(id)").collect()
    spark.range(0, cores * 4, 1, cores).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()
    warm_dir = index_dir + "__warm"
    shutil.rmtree(warm_dir, ignore_errors=True)
    try:
        tiny = spark.range(0, 2000, 1, cores).select(
            F.concat(F.lit("w"), F.col("id").cast("string")).alias("conv_id"),
            (F.col("id") % 5).cast("int").alias("turn_idx"),
            F.lit("warm text tok0000").alias("text"),
        )
        # parquet write + scan, range shuffle + sort + hash agg
        tiny.write.mode("overwrite").parquet(f"{warm_dir}/t")
        tw = spark.read.parquet(f"{warm_dir}/t")
        (
            tw.repartitionByRange(cores, "conv_id", "turn_idx")
            .sortWithinPartitions("conv_id", "turn_idx")
            .withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .count()
            .collect()
        )
        # broadcast join (fused doc-id assign / first_turn_terms)
        tw.join(
            F.broadcast(tw.select("conv_id").limit(50)), "conv_id"
        ).count()
        # mapInArrow with a binary column + dynamic-partition overwrite
        # (the postings write path: arrow stream setup + committer)
        def _arrow_identity(batches):
            for b in batches:
                yield pa.record_batch(
                    {
                        "shard": pa.array(
                            np.zeros(b.num_rows, np.int32), pa.int32()
                        ),
                        "blob": pa.array([b"w"] * b.num_rows, pa.binary()),
                    }
                )

        mode0 = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            tw.select("turn_idx").mapInArrow(
                _arrow_identity, schema="shard int, blob binary"
            ).write.mode("overwrite").partitionBy("shard").parquet(f"{warm_dir}/p")
        finally:
            if mode0 is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode0)
        # one TINY end-to-end build (100 convs, 8 shards): the real
        # kernels import their module graph inside each Python worker
        # and the real plan shapes compile codegen the synthetic
        # frames above don't reach — measured ~5-14 s of
        # corpus-size-invariant first-build cost without this
        from tlgs_spark.corpus import generate_spark
        from tlgs_spark.indexer.build import build_index

        build_index(
            spark,
            generate_spark(spark, 100, partitions=cores),
            f"{warm_dir}/idx",
            n_shards=8,
            resume=False,
            lineage="warmup",
        )
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)


def build_worker(cores: int, corpus_path: str, index_dir: str, n_shards: int,
                 master: str | None = None) -> dict:
    """Fresh-session index build; returns throughput metrics.

    ``master`` lets the multi-JVM scaling probe run the identical build
    under ``local-cluster[N,1,mem]`` (N single-core executor JVMs,
    real inter-process shuffle/broadcast) instead of ``local[N]``."""
    from tlgs_spark.indexer.build import build_index
    from tlgs_spark.session import get_spark

    spark = get_spark(app_name=f"bench_build_{cores}", cores=cores, master=master)
    df = spark.read.parquet(corpus_path)
    shutil.rmtree(index_dir, ignore_errors=True)
    _warm_cluster(spark, cores, index_dir)
    t0 = time.time()
    m = build_index(
        spark, df, index_dir, n_shards=n_shards, resume=False,
        lineage=f"bench:{corpus_path}",
    )
    elapsed = time.time() - t0
    return {
        "cores": cores,
        "master": master or f"local[{cores}]",
        "n_docs": m["n_docs"],
        "build_s": round(elapsed, 3),
        "turns_per_sec": round(m["n_docs"] / elapsed, 1),
        # per-phase wall seconds from the builder's own probes — makes the
        # fixed (corpus-size-independent) driver-side cost visible so the
        # Amdahl fraction behind any scaling ratio can be audited
        "phases": m.get("phases", {}),
    }


def query_bench(spark, index_dir: str, rounds: int = 3) -> dict:
    import numpy as np

    from tlgs_spark.query.engine import SearchIndex

    si = SearchIndex(spark, index_dir)
    si.dl_of  # index-open warmup outside the timed region
    si._meta_lookup(np.array([0]))  # docs pyarrow dataset discovery
    si.term_rows(["__warmup__"])  # pyarrow dataset discovery (once per index)
    si._term_info(["__warmup__"])  # term_stats dataset discovery (shard pruning)
    cold, warm = [], []
    for r in range(rounds):
        for q, mode in QUERY_SET:
            t0 = time.time()
            si.search(q, k=10, mode=mode)
            (cold if r == 0 else warm).append((time.time() - t0) * 1000)
    cold_a, warm_a = np.array(cold), np.array(warm)
    # cache-BYPASS warm tiers (r3 VERDICT #6 — the serving claim must
    # not rest on a dict hit):
    # - warm_noresult: result caches cleared per query, decoded-postings
    #   term cache kept — steady-state serving with a hot term cache
    # - warm_nocache: result AND term caches cleared per query — every
    #   query re-fetches + re-decodes its postings; only the pyarrow
    #   dataset handles and the OS page cache stay hot
    nores, nocache = [], []
    for q, mode in QUERY_SET:
        si._raw_cache.clear()
        si._filtered_cache.clear()
        t0 = time.time()
        si.search(q, k=10, mode=mode)
        nores.append((time.time() - t0) * 1000)
    for q, mode in QUERY_SET:
        si._raw_cache.clear()
        si._filtered_cache.clear()
        if hasattr(si, "_term_cache"):
            si._term_cache.clear()
        t0 = time.time()
        si.search(q, k=10, mode=mode)
        nocache.append((time.time() - t0) * 1000)
    nores_a, nocache_a = np.array(nores), np.array(nocache)
    # distributed path on a few queries; the first execution carries the
    # one-time session costs a long-lived serving cluster pays once
    # (python-worker pool spawn, postings file-index discovery), so it is
    # reported separately as distributed_cold_ms — the steady-state number
    # is the mean over the subsequent executions
    dist, dist_cold = [], 0.0
    for r in range(2):
        for q, mode in QUERY_SET[:3]:
            t0 = time.time()
            si.search_df(q, k=10, mode=mode).collect()
            ms = (time.time() - t0) * 1000
            if r == 0 and not dist and not dist_cold:
                dist_cold = ms
            else:
                dist.append(ms)
    return {
        "n_queries": len(QUERY_SET) * rounds,
        # cold = first execution (postings decode); warm = served from
        # the two-tier result cache (the reference's 600 s cache,
        # search.cpp:713-751) + decoded-postings cache
        "cold_p50_ms": round(float(np.percentile(cold_a, 50)), 1),
        "cold_p95_ms": round(float(np.percentile(cold_a, 95)), 1),
        "warm_p50_ms": round(float(np.percentile(warm_a, 50)), 1),
        "warm_p95_ms": round(float(np.percentile(warm_a, 95)), 1),
        "warm_noresult_p50_ms": round(float(np.percentile(nores_a, 50)), 1),
        "warm_noresult_p95_ms": round(float(np.percentile(nores_a, 95)), 1),
        "warm_nocache_p50_ms": round(float(np.percentile(nocache_a, 50)), 1),
        "warm_nocache_p95_ms": round(float(np.percentile(nocache_a, 95)), 1),
        "p50_ms": round(float(np.percentile(cold_a, 50)), 1),
        "p95_ms": round(float(np.percentile(cold_a, 95)), 1),
        "distributed_mean_ms": round(sum(dist) / len(dist), 1),
        "distributed_cold_ms": round(dist_cold, 1),
    }


def concurrency_bench(
    spark, index_dir: str, levels: tuple = (8, 32), per_thread: int = 12,
    admission_threads: int = 32, admission_cap: int = 4,
) -> dict:
    """Concurrent serving (r4 verdict #4). The reference's headline
    serving constraint is 64 concurrent searches, then HTTP 429 with
    exponential Retry-After (search.cpp:686-696); every number
    reported so far was single-stream. This drives N client threads
    against ONE SearchIndex per level and reports QPS + per-request
    latency percentiles, in two tiers:

    - ``warm``: result cache allowed — the reference's production
      steady state behind its 600 s result cache
    - ``nocache``: a cache_ttl=0 index — every request re-runs scoring
      over its postings (term cache warm), the honest concurrent
      throughput tier

    Plus one ``admission`` burst with ``max_in_flight`` lowered to
    ``admission_cap`` so the 429/backoff path (W5) demonstrably fires
    under real concurrent load — rejected count and a Retry-After
    sample are recorded, then the cap is restored.
    """
    import threading

    import numpy as np

    from tlgs_spark.query.engine import SearchIndex, TooManyRequestsError

    def _drive(si, n_threads: int, n_each: int) -> dict:
        lat: list = []
        rejected = [0]
        retry_samples: list = []
        lock = threading.Lock()

        def worker(tid: int):
            mine = []
            rej = 0
            for i in range(n_each):
                q, mode = QUERY_SET[(tid + i) % len(QUERY_SET)]
                t0 = time.time()
                try:
                    si.search(q, k=10, mode=mode)
                    mine.append((time.time() - t0) * 1000)
                except TooManyRequestsError as e:
                    rej += 1
                    if len(retry_samples) < 4:
                        retry_samples.append(round(e.retry_after, 2))
            with lock:
                lat.extend(mine)
                rejected[0] += rej

        threads = [
            threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
        ]
        t0 = time.time()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.time() - t0
        arr = np.array(lat) if lat else np.zeros(1)
        return {
            "threads": n_threads,
            "completed": len(lat),
            "rejected": rejected[0],
            "retry_after_sample": retry_samples,
            "wall_s": round(wall, 2),
            "qps": round(len(lat) / max(wall, 1e-9), 1),
            "p50_ms": round(float(np.percentile(arr, 50)), 1),
            "p95_ms": round(float(np.percentile(arr, 95)), 1),
        }

    out: dict = {}
    # warm tier: shared index, caches hot after one sequential pass
    si = SearchIndex(spark, index_dir)
    for q, mode in QUERY_SET:
        si.search(q, k=10, mode=mode)
    for lv in levels:
        out[f"warm{lv}"] = _drive(si, lv, per_thread)
    # nocache tier: every request re-scores (cache_ttl=0); term cache
    # warmed once so the tier measures steady-state scoring, not
    # first-touch dataset discovery
    si_nc = SearchIndex(spark, index_dir, cache_ttl=0.0)
    for q, mode in QUERY_SET:
        si_nc.search(q, k=10, mode=mode)
    for lv in levels:
        out[f"nocache{lv}"] = _drive(si_nc, lv, per_thread)
    # admission burst: the 429 path must actually fire past the cap
    si_nc.max_in_flight = admission_cap
    try:
        out["admission"] = _drive(si_nc, admission_threads, 4)
        out["admission"]["max_in_flight"] = admission_cap
    finally:
        si_nc.max_in_flight = 64
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-worker", action="store_true")
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--corpus", default="")
    ap.add_argument("--index-dir", default="")
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--out", default="")
    ap.add_argument("--master", default="",
                    help="master URL override (e.g. local-cluster[8,1,6144])")
    args = ap.parse_args()
    if args.build_worker:
        m = build_worker(args.cores, args.corpus, args.index_dir, args.n_shards,
                         master=args.master or None)
        payload = json.dumps(m)
        if args.out:
            with open(args.out, "w") as f:
                f.write(payload)
        print(payload)
        return
    raise SystemExit("use repo-root bench.py as the entrypoint")


if __name__ == "__main__":
    main()
