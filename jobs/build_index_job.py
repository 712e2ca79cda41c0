#!/usr/bin/env python
"""Index-build job for spark-submit.

    spark-submit --master <cluster> --py-files tlgs_spark.zip \
        jobs/build_index_job.py --input <transcripts parquet/table> \
        --index-dir <dir> --n-shards 4096 [--hygiene] [--no-resume] \
        [--synthesize N_CONV]

Master/executor topology comes from spark-submit (this script never
sets a master — the same file runs on local[N] and on a 1000-executor
cluster). Prints one JSON line of build metrics; the per-shard
checkpoint ledger + lineage land in <index-dir>/ledger.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--n-shards", type=int, default=None)
    ap.add_argument("--hygiene", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--shard-batch", type=int, default=None)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate a deterministic synthetic corpus of N conversations instead of --input")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("tlgs_spark_build").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from tlgs_spark.indexer.build import build_index

    if args.synthesize:
        from tlgs_spark.corpus import generate_spark

        df = generate_spark(spark, args.synthesize)
        lineage = f"synthetic:{args.synthesize}"
    else:
        df = spark.read.parquet(args.input)
        lineage = args.input
    m = build_index(
        spark,
        df,
        args.index_dir,
        n_shards=args.n_shards,
        hygiene=args.hygiene,
        resume=not args.no_resume,
        shard_batch=args.shard_batch,
        lineage=lineage,
    )
    print(json.dumps(m))


if __name__ == "__main__":
    main()
