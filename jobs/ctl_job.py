#!/usr/bin/env python
"""Admin CLI — the ``tlgs_ctl`` analog (tlgs/tlgs_ctl/main.cpp:112-134:
subcommands populate_schema / purge / indexstatus).

    spark-submit --master <cluster> --py-files tlgs_spark.zip \
        jobs/ctl_job.py <subcommand> --index-dir <dir> [...]

Subcommands (each prints one JSON line):

    indexstatus  corpus/ledger/shard summary + the snapshot log and
                 vacuum backlog (main.cpp:96-110 prints page counts and
                 stale counts; collection_stats carries ours)
    purge        remove conversations matching a SQL LIKE pattern and
                 bring the index up to date (main.cpp:87-95 ``DELETE
                 FROM pages WHERE url like $1``). Corpus-free by
                 default since r4 (one metadata key scan builds a
                 delete changelog); pass --input to ride the
                 full-corpus incremental path instead
    compact      re-densify the id space from the committed docs' live
                 rows (corpus-free): delta maintenance trades id
                 density for edit-proportional updates, so deletions
                 leave gaps and doc_ceiling only grows — compaction is
                 the VACUUM FULL analog that reclaims it (run rarely,
                 off-peak, on indexstatus id_space.ceiling_ratio drift)
    vacuum       expire superseded snapshot files past a grace window
                 (Iceberg expire_snapshots analog; PG VACUUM is what the
                 reference leans on implicitly)
    schema       print the Iceberg DDL-analog table layout
                 (populate_schema, main.cpp:12-83 — on parquet-dir
                 storage the build itself materializes the layout, so
                 this is documentation, not mutation)
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser(prog="ctl_job")
    sub = ap.add_subparsers(dest="cmd", required=True)

    st_p = sub.add_parser("indexstatus", help="show status of the index")
    st_p.add_argument("--index-dir", required=True)

    pu_p = sub.add_parser("purge", help="remove conversations from the index")
    pu_p.add_argument("--index-dir", required=True)
    pu_p.add_argument("--input", default=None,
                      help="transcripts parquet/table the index was built from "
                           "(optional since r4: without it the purge rides the "
                           "corpus-free changelog path — one metadata key scan "
                           "of the committed docs, no corpus read)")
    pu_p.add_argument("--pattern", required=True,
                      help="conv_id SQL LIKE pattern to purge (wildcards allowed)")

    co_p = sub.add_parser(
        "compact",
        help="re-densify the id space (reclaim delta-era id gaps); "
             "corpus-free — rebuilds from the committed docs' live rows. "
             "Schedule off-peak when indexstatus id_space.ceiling_ratio "
             "drifts past ~1.5-2x",
    )
    co_p.add_argument("--index-dir", required=True)

    va_p = sub.add_parser("vacuum", help="expire superseded snapshot files")
    va_p.add_argument("--index-dir", required=True)
    va_p.add_argument("--grace-s", type=float, default=0.0)
    va_p.add_argument("--retain-snapshots", type=int, default=1)

    sc_p = sub.add_parser("schema", help="print the DDL-analog table layout")
    sc_p.add_argument("--index-dir", default=None)

    args = ap.parse_args()

    if args.cmd == "schema":
        # no Spark session needed — print the module-documented layout
        from tlgs_spark.indexer import storage

        print(json.dumps({"tables": list(storage.TABLES),
                          "ddl": storage.__doc__}))
        return

    if args.cmd == "vacuum":
        # pure local-filesystem work (JSON manifests + rmtree): a JVM
        # session would cost seconds and require a reachable master for
        # nothing
        from tlgs_spark.indexer.storage import IndexStorage

        removed = IndexStorage(args.index_dir).vacuum(
            grace_s=args.grace_s, retain_snapshots=args.retain_snapshots
        )
        print(json.dumps({"removed": removed, "n_removed": len(removed)}))
        return

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("tlgs_spark_ctl").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.cmd == "indexstatus":
        from tlgs_spark.indexer.storage import index_status

        print(json.dumps(index_status(spark, args.index_dir), default=str))
    elif args.cmd == "compact":
        from tlgs_spark.streaming.incremental import compact_index

        print(json.dumps(compact_index(spark, args.index_dir), default=str))
    elif args.cmd == "purge":
        if args.input is None:
            from tlgs_spark.streaming.incremental import purge_index

            res = purge_index(spark, args.index_dir, args.pattern)
        else:
            from tlgs_spark.streaming.incremental import purge_conversations

            transcripts = spark.read.parquet(args.input)
            res = purge_conversations(spark, transcripts, args.index_dir, args.pattern)
        print(json.dumps(res, default=str))


if __name__ == "__main__":
    main()
