#!/usr/bin/env python
"""A/B the postings parquet `page.size.row.check.min` option.

The r5 full bench recorded the sf0.1-scale build at 66.3 s / 31.7k
turns/s (8 cores) vs 42.3 s / 49.7k in the final r4 run — and the
slowdown pattern (every postings-writing/-reading phase ~1.7x slower,
docs_write flat) fingers the one engine change between them at those
sites: `parquet.page.size.row.check.min=8` on the postings write (the
r4 ADVICE hygiene item). This probe interleaves builds of the SAME
2.1M-turn corpus at 8 pinned cores with the option on (8) vs off
(parquet-mr default 100) in one ambient-load window, and also counts
resulting row groups + times a cold dense query against each index.

Usage: python tools/pagecheck_ab.py [--trials 2] [--convs 100000]
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
WORK = "/dev/shm/tlgs_pagecheck_ab"


def run_build(cores: int, corpus: str, index_dir: str, env_extra: dict) -> dict:
    out = os.path.join(WORK, f"build_{os.path.basename(index_dir)}.json")
    cmd = [
        sys.executable, "-m", "tlgs_spark.bench", "--build-worker",
        "--cores", str(cores), "--corpus", corpus,
        "--index-dir", index_dir, "--n-shards", "256", "--out", out,
    ]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    env = dict(os.environ)
    env.update(env_extra)
    env.setdefault("TLGS_SPARK_LOCAL_DIR", os.path.join(WORK, "spark_local"))
    subprocess.run(cmd, check=True, capture_output=True, cwd=REPO, env=env)
    with open(out) as f:
        return json.load(f)


def count_row_groups(index_dir: str) -> dict:
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(index_dir, "postings*", "shard=*", "*.parquet"))
    total_rg = 0
    total_rows = 0
    n = 0
    for p in files[:64]:  # sample
        md = pq.ParquetFile(p).metadata
        total_rg += md.num_row_groups
        total_rows += md.num_rows
        n += 1
    return {
        "files_sampled": n,
        "row_groups_per_file": round(total_rg / max(1, n), 1),
        "rows_per_group": round(total_rows / max(1, total_rg), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--convs", type=int, default=100000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    corpus = os.path.join(WORK, f"transcripts_{args.convs}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        os.environ.setdefault("TLGS_SPARK_LOCAL_DIR", os.path.join(WORK, "spark_local"))
        from tlgs_spark.corpus import write_corpus
        from tlgs_spark.session import get_spark, stop_spark

        spark = get_spark(app_name="pagecheck_corpus", cores=16)
        write_corpus(spark, args.convs, corpus, partitions=128)
        stop_spark()

    results = {"checkmin8": [], "default": []}
    for t in range(args.trials):
        for tag, env in (
            ("checkmin8", {"TLGS_POSTINGS_PAGE_CHECK_MIN": "8"}),
            ("default", {"TLGS_POSTINGS_PAGE_CHECK_MIN": ""}),
        ):
            idx = os.path.join(WORK, f"idx_{tag}")
            m = run_build(args.cores, corpus, idx, env)
            m["load"] = round(os.getloadavg()[0], 1)
            results[tag].append(m)
            print(
                f"trial {t} {tag}: build {m['build_s']}s "
                f"({m['turns_per_sec']:.0f} t/s) load {m['load']} "
                f"phases {m.get('phases')}",
                flush=True,
            )

    for tag in ("checkmin8", "default"):
        idx = os.path.join(WORK, f"idx_{tag}")
        rg = count_row_groups(idx)
        best = max(results[tag], key=lambda m: m["turns_per_sec"])
        print(f"{tag}: best {best['turns_per_sec']:.0f} t/s, row groups {rg}", flush=True)

    out = {tag: [
        {k: m[k] for k in ("build_s", "turns_per_sec", "load", "phases")}
        for m in ms
    ] for tag, ms in results.items()}
    with open(os.path.join(WORK, "ab_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({t: max(m["turns_per_sec"] for m in ms) for t, ms in out.items()}))


if __name__ == "__main__":
    main()
