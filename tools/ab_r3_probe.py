#!/usr/bin/env python
"""A/B the r3→r4 cold-path drift (r4 verdict #5) — run in one quiet
window.

Round 4 moved the engine from postings format 2 + stemmer v2 (the
round-3 closing state, commit 51a1d87) to format 3 (Pareto-front
block bounds, 128 KB row groups) + stemmer v3; the same round's driver
windows showed cold p50 391→482 ms and the 2.1M build 34.1→42.3 s,
but those windows had different ambient load, so nothing isolated
engine cost from neighbor noise. This driver INTERLEAVES the two
engines in the same window — r3 code from a read-only git worktree of
51a1d87, current code from the repo — building the same corpus and
benching the same query set, alternating r3/current per round, all
taskset-pinned to the same cores. The delta that survives
interleaving is engine-attributable; the rest was weather.

Usage: python tools/ab_r3_probe.py [--rounds 2] [--work /dev/shm/tlgs_ab]
       [--corpus /dev/shm/tlgs_bench/transcripts_100000]

Prints one JSON line; run by hand, results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_COMMIT = "51a1d87"  # round-3 closing state: format 2, stemmer v2


def sh(cmd, **kw):
    return subprocess.run(cmd, check=True, **kw)


def build(codedir: str, cores: int, corpus: str, index_dir: str, out: str,
          work: str) -> dict:
    cmd = [
        sys.executable, "-m", "tlgs_spark.bench", "--build-worker",
        "--cores", str(cores), "--corpus", corpus,
        "--index-dir", index_dir, "--n-shards", "256", "--out", out,
    ]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    env = dict(os.environ)
    env["PYTHONPATH"] = codedir
    env.setdefault("TLGS_SPARK_LOCAL_DIR", os.path.join(work, "spark_local"))
    sh(cmd, cwd=codedir, env=env, capture_output=True)
    with open(out) as f:
        return json.load(f)


QUERY_SNIPPET = r"""
import json, sys
from tlgs_spark.session import get_spark
from tlgs_spark.bench import query_bench
spark = get_spark(app_name="ab_query", cores=8)
print("ABRESULT " + json.dumps(query_bench(spark, sys.argv[1])))
"""


def query(codedir: str, index_dir: str, work: str) -> dict:
    cmd = [sys.executable, "-c", QUERY_SNIPPET, index_dir]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", "0-7"] + cmd
    env = dict(os.environ)
    env["PYTHONPATH"] = codedir
    env.setdefault("TLGS_SPARK_LOCAL_DIR", os.path.join(work, "spark_local"))
    p = sh(cmd, cwd=codedir, env=env, capture_output=True, text=True)
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT in query output: {p.stdout[-500:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--work", default="/dev/shm/tlgs_ab")
    ap.add_argument("--corpus",
                    default="/dev/shm/tlgs_bench/transcripts_100000")
    ap.add_argument("--r3-src", default="/dev/shm/tlgs_r3src")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    if not os.path.exists(os.path.join(args.r3_src, "tlgs_spark")):
        sh(["git", "worktree", "add", "--detach", args.r3_src, R3_COMMIT],
           cwd=REPO, capture_output=True)
    arms = {"r3": args.r3_src, "current": REPO}
    out: dict = {"r3_commit": R3_COMMIT, "rounds": args.rounds,
                 "loadavg_start": list(os.getloadavg()), "builds": [],
                 "queries": []}
    for r in range(args.rounds):
        for name, codedir in arms.items():  # alternate within the window
            idx = os.path.join(args.work, f"idx_{name}")
            m = build(codedir, args.cores, args.corpus, idx,
                      os.path.join(args.work, f"build_{name}_{r}.json"),
                      args.work)
            out["builds"].append({"arm": name, "round": r,
                                  "build_s": m["build_s"],
                                  "turns_per_sec": m["turns_per_sec"],
                                  "phases": m.get("phases", {}),
                                  "load": round(os.getloadavg()[0], 1)})
    for r in range(args.rounds):
        for name, codedir in arms.items():
            q = query(codedir, os.path.join(args.work, f"idx_{name}"),
                      args.work)
            out["queries"].append({
                "arm": name, "round": r,
                "cold_p50_ms": q.get("cold_p50_ms"),
                "cold_p95_ms": q.get("cold_p95_ms"),
                "warm_p50_ms": q.get("warm_p50_ms"),
                "warm_nocache_p50_ms": q.get("warm_nocache_p50_ms"),
                "distributed_mean_ms": q.get("distributed_mean_ms"),
                "load": round(os.getloadavg()[0], 1),
            })

    def best(arm, key, sec):
        vals = [b[key] for b in out[sec] if b["arm"] == arm and b.get(key)]
        return min(vals) if vals else None

    out["summary"] = {
        "build_s_best": {a: best(a, "build_s", "builds") for a in arms},
        "cold_p50_ms_best": {a: best(a, "cold_p50_ms", "queries") for a in arms},
        "cold_p95_ms_best": {a: best(a, "cold_p95_ms", "queries") for a in arms},
    }
    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
