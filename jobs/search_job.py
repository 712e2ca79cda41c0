#!/usr/bin/env python
"""Top-k BM25 search job for spark-submit.

    spark-submit --py-files tlgs_spark.zip jobs/search_job.py \
        --index-dir <dir> --query "marker000 tool:bash" --k 10 \
        [--mode or] [--distributed] [--preview]

Prints one JSON line: {"query": ..., "results": [{doc_id, score, ...}]}.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="and", choices=["and", "or"])
    ap.add_argument("--page", type=int, default=None)
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--preview", action="store_true")
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--fielded", action="store_true",
                    help="title-weighted W1 scoring (needs build_field_index)")
    ap.add_argument("--title-weight", type=float, default=50.0)
    ap.add_argument("--at-snapshot", type=int, default=None,
                    help="time-travel read: pin to a snapshot-log id (Iceberg VERSION AS OF)")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("tlgs_spark_search").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from tlgs_spark.query.engine import SearchIndex

    si = SearchIndex(spark, args.index_dir, at_snapshot=args.at_snapshot)
    if args.fielded or args.distributed:
        # these options only exist on the driver serving path — say so
        # instead of silently dropping them
        ignored = [
            name
            for name, on in (
                ("--page", args.page is not None),
                ("--preview", args.preview),
                ("--dedup", args.dedup),
            )
            if on
        ]
        if ignored:
            import sys

            print(
                f"warning: {', '.join(ignored)} ignored on the "
                f"{'fielded' if args.fielded else 'distributed'} path",
                file=sys.stderr,
            )
    if args.fielded and args.distributed:
        rows = si.search_df_fielded(
            args.query, k=args.k, mode=args.mode, title_weight=args.title_weight
        ).collect()
        results = [{"doc_id": r.doc_id, "score": r.score} for r in rows]
    elif args.fielded:
        pdf = si.search_fielded(
            args.query, k=args.k, mode=args.mode, title_weight=args.title_weight
        )
        results = json.loads(pdf.to_json(orient="records"))
    elif args.distributed:
        rows = si.search_df(args.query, k=args.k, mode=args.mode).collect()
        results = [{"doc_id": r.doc_id, "score": r.score} for r in rows]
    else:
        pdf = si.search(
            args.query, k=args.k, mode=args.mode, page=args.page,
            with_preview=args.preview, dedup=args.dedup,
        )
        results = json.loads(pdf.to_json(orient="records"))
    print(json.dumps({"query": args.query, "results": results}))


if __name__ == "__main__":
    main()
