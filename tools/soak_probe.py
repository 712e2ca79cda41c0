#!/usr/bin/env python
"""Maintenance-loop soak at probe scale (r4 verdict #2) — run by hand
in a quiet window; the unit-scale twin is tests/test_maintenance_soak.py.

Drives N successive ``apply_changes`` batches (edits skewed to a few
hot conversations + inserts + deletes) against a large committed index
(default: the 21M-turn corpus at 1024 shards), with periodic
``vacuum`` and ``compact_index``, and records:

- per-batch wall time (flat-latency evidence: first/last-quartile
  medians + max),
- ``id_space.ceiling_ratio`` trajectory (bounded drift, compaction
  resets),
- snapshot-log length and GC backlog after each vacuum (bounded
  maintenance debt),
- search identity vs a from-scratch build of the final corpus state
  at the end (hydrated keys + float-exact scores).

Usage:
  python tools/soak_probe.py [--convs 1000000] [--batches 60]
      [--work /dev/shm/tlgs_21m] [--n-shards 1024]
      [--compact-every 25] [--vacuum-every 10] [--no-final-identity]

Writes one JSON line to stdout. Never touches BENCH_r*.json.
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
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--work", default=os.environ.get(
        "TLGS_PROBE_DIR",
        "/dev/shm/tlgs_21m" if os.path.isdir("/dev/shm") else "/tmp/tlgs_soak"))
    ap.add_argument("--n-shards", type=int, default=1024)
    ap.add_argument("--compact-every", type=int, default=25)
    ap.add_argument("--vacuum-every", type=int, default=10)
    ap.add_argument("--hot-convs", type=int, default=5)
    ap.add_argument("--no-final-identity", action="store_true")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    os.environ.setdefault("TLGS_SPARK_LOCAL_DIR", os.path.join(args.work, "spark_local"))
    os.environ.setdefault("TLGS_SPARK_DRIVER_MEM", "40g")

    import numpy as np
    from pyspark.sql import functions as F

    from tlgs_spark.corpus import write_corpus
    from tlgs_spark.indexer.build import build_index
    from tlgs_spark.indexer.storage import IndexStorage, index_status
    from tlgs_spark.session import get_spark
    from tlgs_spark.streaming.incremental import apply_changes, compact_index

    spark = get_spark(app_name="soak_probe", cores=args.cores)
    corpus = os.path.join(args.work, f"transcripts_{args.convs // 1000000}m"
                          if args.convs % 1_000_000 == 0
                          else f"transcripts_{args.convs}")
    result: dict = {"convs": args.convs, "batches": args.batches,
                    "work": args.work, "loadavg_start": list(os.getloadavg())}
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        t0 = time.time()
        write_corpus(spark, args.convs, corpus, partitions=256)
        result["corpus_gen_s"] = round(time.time() - t0, 1)

    idx = os.path.join(args.work, "idx_soak")
    base = spark.read.parquet(corpus)
    if not os.path.exists(os.path.join(idx, "index_meta.json")):
        t0 = time.time()
        build_index(spark, base, idx, n_shards=args.n_shards,
                    lineage="soak:base")
        result["base_build_s"] = round(time.time() - t0, 1)

    # the soak's running corpus state, expressed as TRANSFORMS over the
    # base parquet (cheap to re-derive for the final identity build):
    # edits append a marker to a (conv, turn); inserts add new turns;
    # deletes drop keys. Tracked driver-side as three small dicts.
    edits: dict = {}      # (conv_id, turn_idx) -> marker text
    inserts: list = []    # full row dicts
    deletes: set = set()  # (conv_id, turn_idx)

    hot = [f"conv{i:06d}" for i in range(args.hot_convs)]
    schema_row = base.limit(1).collect()[0].asDict()
    lat, ceilings, backlog = [], [], []
    next_conv = 90_000_000
    for b in range(args.batches):
        rng = np.random.default_rng(5000 + b)
        rows = []
        used = set()
        # 3 skewed edits
        for _ in range(3):
            conv = hot[int(rng.integers(0, len(hot)))] if b % 4 else (
                f"conv{int(rng.integers(0, args.convs)):06d}")
            turn = int(rng.integers(0, 15))
            if (conv, turn) in used or (conv, turn) in deletes:
                continue
            used.add((conv, turn))
            marker = f"soakedit b{b}"
            edits[(conv, turn)] = marker
            rows.append(dict(schema_row, conv_id=conv, turn_idx=turn,
                             text=f"edited {marker}"))
        # one insert every 3rd batch
        if b % 3 == 0:
            conv = f"conv{next_conv:08d}"
            next_conv += 1
            row = dict(schema_row, conv_id=conv, turn_idx=0,
                       text=f"fresh conversation soaknew b{b}")
            inserts.append(row)
            rows.append(row)
        # one delete every 5th
        if b % 5 == 0:
            conv = f"conv{int(rng.integers(args.hot_convs, args.convs)):06d}"
            turn = int(rng.integers(0, 10))
            if (conv, turn) not in used:
                used.add((conv, turn))
                deletes.add((conv, turn))
                edits.pop((conv, turn), None)
                dl = {k: None for k in schema_row}
                dl.update(conv_id=conv, turn_idx=turn)
                rows.append(dl)
        batch = spark.createDataFrame(
            [tuple(r[c] for c in base.columns) for r in rows], base.schema
        )
        t0 = time.time()
        res = apply_changes(spark, batch, idx)
        lat.append(round(time.time() - t0, 2))
        assert res["mode"] == "delta", res
        ceilings.append(index_status(spark, idx)["id_space"]["ceiling_ratio"])
        if (b + 1) % args.vacuum_every == 0:
            IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=1)
            st = IndexStorage(idx)
            backlog.append({"b": b, "snapshots": len(st.snapshots()),
                            "gc_pending": len(st._gc_pending())})
        if args.compact_every and (b + 1) % args.compact_every == 0:
            t0 = time.time()
            compact_index(spark, idx)
            # compaction is the GC backlog's drain point — record that
            # one vacuum clears the queue the delta manifests had
            # legitimately pinned (unchanged shards referencing prior
            # version dirs)
            IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=1)
            result.setdefault("compactions", []).append(
                {"b": b, "s": round(time.time() - t0, 1),
                 "ceiling_after": index_status(spark, idx)["id_space"]["ceiling_ratio"],
                 "gc_pending_after_vacuum": len(IndexStorage(idx)._gc_pending())}
            )
        print(f"batch {b}: {lat[-1]}s ceiling_ratio={ceilings[-1]}",
              file=sys.stderr)

    q = max(1, args.batches // 4)
    result.update({
        "latency_s": lat,
        "latency_first_quartile_median": float(np.median(lat[:q])),
        "latency_last_quartile_median": float(np.median(lat[-q:])),
        "latency_max": max(lat),
        "ceiling_ratio_max": max(ceilings),
        "ceiling_ratio_final": ceilings[-1],
        "backlog": backlog,
    })

    if not args.no_final_identity:
        # final corpus state = base - deletes - edited keys + edited
        # rows + inserts; fresh-build it and compare search results
        t0 = time.time()
        keys_gone = list(deletes | set(edits))
        gone_df = spark.createDataFrame(
            [(c, t) for c, t in keys_gone] or [("", -1)],
            "conv_id string, turn_idx int",
        )
        cur = base.join(gone_df, ["conv_id", "turn_idx"], "left_anti")
        extra_rows = [
            dict(schema_row, conv_id=c, turn_idx=t, text=f"edited {m}")
            for (c, t), m in edits.items()
        ] + inserts
        if extra_rows:
            cur = cur.unionByName(spark.createDataFrame(
                [tuple(r[c] for c in base.columns) for r in extra_rows],
                base.schema,
            ))
        fresh = os.path.join(args.work, "idx_soak_fresh")
        import shutil
        shutil.rmtree(fresh, ignore_errors=True)
        build_index(spark, cur, fresh, n_shards=args.n_shards,
                    lineage="soak:fresh-identity")
        from tlgs_spark.query.engine import SearchIndex

        def fp(path):
            si = SearchIndex(spark, path)
            out = []
            for q_ in ("tok0000 tok0005", "soakedit", "soaknew", "marker000"):
                for mode in ("and", "or"):
                    r = si.search(q_, k=10, mode=mode)
                    out.append((q_, mode, tuple(sorted(
                        zip([round(float(s), 10) for s in r["score"]],
                            r["conv_id"].tolist(), r["turn_idx"].tolist()),
                        key=lambda x: (-x[0], x[1], x[2])))))
            return out

        result["identity_ok"] = fp(idx) == fp(fresh)
        result["identity_check_s"] = round(time.time() - t0, 1)
        shutil.rmtree(fresh, ignore_errors=True)

    result["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
