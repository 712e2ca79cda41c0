#!/usr/bin/env python
"""Targeted per-entry benchmark + plan capture (guide §1).

NOT the graded bench (bench.py is frozen): this harness isolates entry
queries for optimization work — same registry order and same
``.collect()`` methodology as bench.py's entry-suite loop, plus:

- ``--queries a,b,c`` to time a subset (registry order preserved,
  shared caches still warm in-order, so "first touch" costs land on
  the same entries they do in the real bench)
- ``--repeat N`` re-times each entry N times (first = cold-in-session,
  min = steady-state)
- ``--explain DIR`` writes ``<name>.txt`` with explain("formatted")
  for each timed entry
- ``--noop`` uses the noop sink instead of collect (guide §1.4) to
  take the driver-collect cost out of the timing

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --repeat 2
  python bench_extra.py --queries minhash_bands,minhash_pairs \
      --explain plans/r06 --suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from tlgs_spark.entry_queries import QUERIES
    from tlgs_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", cores=cpus)
    subset = [q.strip() for q in args.queries.split(",") if q.strip()]
    names = [n for n in QUERIES if not subset or n in subset]

    results: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]["fn"]
        times = []
        for r in range(max(1, args.repeat)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{r}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = times
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = QUERIES[name]["fn"](spark, args.sf_dir)
            with open(os.path.join(
                    args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(f"{name}: {times}", flush=True)

    line = json.dumps({"sf": args.sf_dir, "load": list(os.getloadavg()),
                       "times": results})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
