#!/usr/bin/env python
"""Large-corpus scale probe (run by hand in a quiet window).

Grows the weak-scaling evidence beyond the per-round bench corpus:
synthesizes an N-conversation corpus (default 3M convs ≈ 63M turns, the
next decade past the round-3 21M probe), builds the index at two pinned
parallelism levels (2 and 8 cores — the sandbox stand-in for N vs 4N
executors), and appends the raw pair to .bench_scaling_history.jsonl
with its corpus size, so bench.py's history buckets pick it up as a
large-corpus record.

``--multi-jvm`` runs the SAME build under real process separation:
``local-cluster[N,1,mem]`` — N single-core executor JVMs spawned as
separate OS processes, exchanging shuffle blocks and broadcasts over
the network stack exactly like a standalone cluster's executors (the
reference analog: multiple cooperating crawler processes,
tlgs README.md:62). These pairs carry a ``levels:"mj2->8"`` tag in the
history file so the single-JVM 2->8 medians stay uncontaminated and
bench.py can report the multi-JVM evidence separately. The process
tree is pinned to N+1 CPUs (N executor cores + 1 for the
driver/master JVMs, same allowance at both levels).

Afterwards (unless --no-extras) it exercises the scale envelopes the
round-3 verdict asked to re-verify on the big index:
  - a 1-conversation delta update (prepare must be ∝ edit, with
    per-phase timings — NOT a full docs rewrite)
  - the serving profile (driver BM25 p50/p95 incl. cache-bypass warm
    tiers, distributed-path mean) at the probe's 8-core index

Usage: python tools/scale_probe.py [--convs 3000000] [--work DIR]
       [--skip-n | --skip-4n] [--no-extras] [--trials 1] [--multi-jvm]

Writes probe results as one JSON line to stdout and appends history
rows; never touches BENCH_r*.json (bench.py owns those).

Resume semantics (--skip-n / --skip-4n): the saved timing JSON from a
prior window is reused for that side. Such pairs mix measurement
windows (different ambient load, possibly different heap config), so
the appended history row carries ``reused:true`` and bench.py keeps
those rows OUT of every median (they stay visible in the file). A
reused side must describe the same corpus — the probe asserts
n_docs equality before pairing — and a fully-reused pair (both skip
flags) appends nothing: it would re-derive a row already recorded.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_build(cores: int, corpus: str, index_dir: str, n_shards: int, work: str,
              multi_jvm: bool = False, exec_mem_mb: int = 6144,
              exec_cores: int = 1) -> dict:
    tag = f"mj{cores}" if multi_jvm else str(cores)
    out = os.path.join(work, f"probe_build_{tag}.json")
    cmd = [
        sys.executable, "-m", "tlgs_spark.bench", "--build-worker",
        "--cores", str(cores), "--corpus", corpus,
        "--index-dir", index_dir, "--n-shards", str(n_shards), "--out", out,
    ]
    if multi_jvm:
        n_workers = max(1, cores // exec_cores)
        cmd += ["--master",
                f"local-cluster[{n_workers},{exec_cores},{exec_mem_mb}]"]
    if os.path.exists("/usr/bin/taskset"):
        # multi-JVM: the executor JVMs (cores total across workers) +
        # the driver/master JVM share cores+1 CPUs — the same +1 driver
        # allowance at both levels, mirroring a cluster whose driver is
        # its own node
        top = cores if multi_jvm else cores - 1
        cmd = ["taskset", "-c", f"0-{top}"] + cmd
    env = dict(os.environ)
    env.setdefault("TLGS_SPARK_LOCAL_DIR", os.path.join(work, "spark_local"))
    # tmpfs work dirs and the JVM heap compete for the SAME physical
    # RAM: the session default of 64g heap + ~50 GB of corpus/scratch
    # in /dev/shm OOM-killed an 8-core 63M-turn build (anon-rss 54 GB
    # when the reaper fired). A big-corpus build doesn't need a huge
    # driver heap — the build streams; cap it so the JVM GCs instead
    # of ballooning into the tmpfs footprint. (Multi-JVM mode sizes
    # heaps per executor instead — session.py.)
    env.setdefault("TLGS_SPARK_DRIVER_MEM", "8g" if multi_jvm else "40g")
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    with open(out) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=3_000_000)
    ap.add_argument("--work", default=os.environ.get(
        "TLGS_PROBE_DIR",
        "/dev/shm/tlgs_probe" if os.path.isdir("/dev/shm") else "/tmp/tlgs_probe"))
    ap.add_argument("--n-shards", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--skip-n", action="store_true")
    ap.add_argument("--skip-4n", action="store_true")
    ap.add_argument("--no-extras", action="store_true")
    ap.add_argument("--multi-jvm", action="store_true",
                    help="run each level as local-cluster[N,1,mem]: N "
                         "single-core executor JVMs as separate OS "
                         "processes (real inter-JVM shuffle/broadcast); "
                         "history rows are tagged levels='mj2->8'")
    ap.add_argument("--exec-mem-mb", type=int, default=6144,
                    help="per-executor JVM heap for --multi-jvm (MB)")
    ap.add_argument("--exec-cores", type=int, default=1,
                    help="cores per executor JVM for --multi-jvm: the "
                         "level's total cores stay 2 and 8, split over "
                         "cores/exec_cores workers (2-core executors = "
                         "1 vs 4 executor JVMs — the real-cluster shape "
                         "with less JVM replication per pinned CPU)")
    ap.add_argument("--drop-n-index", action="store_true",
                    help="delete the 2-core index right after its build is "
                         "timed (the pair only needs the timing JSON; halves "
                         "peak disk at big corpora)")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    os.environ.setdefault("TLGS_SPARK_LOCAL_DIR", os.path.join(args.work, "spark_local"))
    corpus = os.path.join(args.work, f"transcripts_{args.convs}")
    result: dict = {"convs": args.convs, "work": args.work,
                    "multi_jvm": bool(args.multi_jvm),
                    "loadavg_start": list(os.getloadavg())}

    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from tlgs_spark.corpus import write_corpus
        from tlgs_spark.session import get_spark, stop_spark

        t0 = time.time()
        spark = get_spark(app_name="probe_corpus", cores=32)
        write_corpus(spark, args.convs, corpus, partitions=256)
        stop_spark()
        result["corpus_gen_s"] = round(time.time() - t0, 1)

    hist = os.path.join(REPO, ".bench_scaling_history.jsonl")
    levels_tag = "mj2->8" if args.multi_jvm else None
    mj = args.multi_jvm
    tag_lo, tag_hi = ("mj2", "mj8") if mj else ("2", "8")
    pairs = []
    lo = hi = None
    lo_reused = hi_reused = False
    # --skip-n resumes a half-finished probe: reuse the saved 2-core
    # timing JSON (the pair only needs the numbers, the index is
    # droppable) instead of forfeiting the history row. Reused sides
    # come from a DIFFERENT measurement window, so the pair is tagged
    # reused:true in history and excluded from bench.py's medians.
    prior_n = os.path.join(args.work, f"probe_build_{tag_lo}.json")
    if args.skip_n and os.path.exists(prior_n):
        with open(prior_n) as f:
            lo = json.load(f)
        lo_reused = True
        result["n"] = dict(lo, reused_prior=True)
    prior_4n = os.path.join(args.work, f"probe_build_{tag_hi}.json")
    if args.skip_4n and os.path.exists(prior_4n):
        with open(prior_4n) as f:
            hi = json.load(f)
        hi_reused = True
        result["4n"] = dict(hi, reused_prior=True)
    appended_reused_pair = False
    for _ in range(max(1, args.trials)):
        if not args.skip_n:
            lo = run_build(2, corpus, os.path.join(args.work, "idx_n"),
                           args.n_shards, args.work, mj, args.exec_mem_mb,
                           args.exec_cores)
            result["n"] = lo
            if args.drop_n_index:
                import shutil
                shutil.rmtree(os.path.join(args.work, "idx_n"),
                              ignore_errors=True)
        if not args.skip_4n:
            hi = run_build(8, corpus, os.path.join(args.work, "idx_4n"),
                           args.n_shards, args.work, mj, args.exec_mem_mb,
                           args.exec_cores)
            result["4n"] = hi
        if lo and hi:
            # a stale probe_build_*.json from an earlier, different-size
            # probe in a shared work dir must not silently pair against
            # a fresh build of another corpus
            if lo["n_docs"] != hi["n_docs"]:
                raise SystemExit(
                    f"refusing to pair builds of different corpora: "
                    f"n_docs {lo['n_docs']} (2-core) != {hi['n_docs']} "
                    f"(8-core) — stale probe_build json in {args.work}?"
                )
            reused = lo_reused or hi_reused
            if lo_reused and hi_reused:
                # both sides reused ⇒ the pair was (or could have been)
                # recorded when the second side was measured; appending
                # again would duplicate history rows
                result.setdefault("note", "both sides reused: no history append")
                pairs.append(round(hi["turns_per_sec"] / lo["turns_per_sec"] / 4.0, 3))
                break
            if reused and appended_reused_pair:
                break  # one reused side + --trials>1: identical rows
            eff = round(hi["turns_per_sec"] / lo["turns_per_sec"] / 4.0, 3)
            pairs.append(eff)
            row = {
                "t": time.time(), "n": lo["turns_per_sec"],
                "4n": hi["turns_per_sec"], "eff": eff,
                "turns": lo["n_docs"],
                "load": round(os.getloadavg()[0], 1),
            }
            if levels_tag:
                row["levels"] = levels_tag
            if reused:
                row["reused"] = True
                appended_reused_pair = True
            with open(hist, "a") as f:
                f.write(json.dumps(row) + "\n")
    result["pair_effs"] = pairs

    if not args.no_extras and hi:
        from pyspark.sql import functions as F

        from tlgs_spark.bench import query_bench
        from tlgs_spark.session import get_spark, stop_spark
        from tlgs_spark.streaming.incremental import incremental_update

        idx = os.path.join(args.work, "idx_4n")
        spark = get_spark(app_name="probe_extras", cores=32)
        # 1-conv edit: delta prepare must be ∝ the edit, not the corpus
        edited = spark.read.parquet(corpus).withColumn(
            "text",
            F.when(F.col("conv_id") == "conv000000",
                   F.concat(F.col("text"), F.lit(" probeedit")))
            .otherwise(F.col("text")),
        )
        t0 = time.time()
        inc = incremental_update(spark, edited, idx)
        result["delta_1conv"] = {
            "elapsed_s": round(time.time() - t0, 2),
            "mode": inc.get("mode"),
            "phases": inc.get("phases", {}),
            "shards_changed": len(inc.get("changed", [])),
            "shards_reused": len(inc.get("reused", [])),
        }
        result["serving"] = query_bench(spark, idx)
        stop_spark()

    result["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
