"""Index table layout + checkpoint ledger.

Production target is an Iceberg catalog (the reference's schema DDL
lives in tlgs/tlgs_ctl/main.cpp:12-83; our DDL analog is below). This
container has no Iceberg runtime, so the same tables are parquet
directories under ``index_dir`` — every reader/writer goes through this
module, so swapping in ``writeTo(...).append()`` / ``MERGE INTO`` on a
real cluster touches one file.

Tables (Iceberg DDL equivalent):

    docs             (doc_id BIGINT, conv_id STRING, turn_idx INT, role STRING,
                      tool STRING, ts TIMESTAMP, size BIGINT, text_hash BIGINT,
                      text STRING)                       PARTITIONED BY (bucket(doc_id))
    doc_lengths      (doc_id BIGINT, dl BIGINT)
    norms            (shard INT, base BIGINT, n BIGINT, dls BINARY)
    term_stats       (term STRING, df BIGINT, cf BIGINT)
    collection_stats (n_docs BIGINT, total_dl BIGINT, avgdl DOUBLE,
                      n_terms BIGINT, n_postings BIGINT)
    postings         (shard INT, term STRING, df BIGINT, cf BIGINT,
                      max_tfn DOUBLE, block_max ARRAY<FLOAT>,
                      block_last ARRAY<BIGINT>,
                      postings BINARY)                   PARTITIONED BY (shard)
    ledger           (shard INT, status STRING, n_terms BIGINT, n_postings BIGINT,
                      bytes_postings BIGINT, elapsed_s DOUBLE,
                      postings_per_sec DOUBLE, skew_factor DOUBLE,
                      lineage STRING, built_at DOUBLE)   -- per-partition checkpoint
"""

from __future__ import annotations

import json
import os

TABLES = (
    "docs",
    "doc_lengths",
    "norms",
    "term_stats",
    "collection_stats",
    "postings",
    "ledger",
)


class IndexStorage:
    """Physical layout with a metadata-level version pointer.

    ``table_versions.json`` maps table → committed version; version 0
    is the bare ``<table>`` dir (every fresh build), version n > 0 is
    ``<table>__v{n}``. An incremental update stages NEW versions of
    the recomputed tables (``staged_versions``) while readers keep
    resolving the committed ones, then flips the pointer with ONE
    small-file write (``commit_versions``) — the object-store-safe
    replacement for the r1 staging-dir ``os.rename`` swap (rename is
    not atomic — or is a full copy — on object stores). The postings
    table is never versioned: unchanged shard partitions are reused
    as METADATA (untouched files), changed ones are rewritten in
    place under dynamic partition overwrite. Snapshot isolation for
    those partition rewrites is the one gap — that's the Iceberg
    swap point documented above.
    """

    def __init__(self, index_dir: str, staged_versions: dict[str, int] | None = None):
        self.index_dir = index_dir
        self._staged = dict(staged_versions or {})
        self._versions: dict[str, int] | None = None

    # --- version pointer ---
    def _versions_file(self) -> str:
        return os.path.join(self.index_dir, "table_versions.json")

    def versions(self) -> dict[str, int]:
        if self._versions is None:
            try:
                with open(self._versions_file()) as f:
                    self._versions = {k: int(v) for k, v in json.load(f).items()}
            except FileNotFoundError:
                self._versions = {}
        return self._versions

    def commit_versions(self, staged: dict[str, int]) -> None:
        """Flip the committed pointer to the staged versions — one
        small-file write (a single PUT on object storage)."""
        merged = {**self.versions(), **staged}
        tmp = self._versions_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=2, sort_keys=True)
        os.replace(tmp, self._versions_file())
        self._versions = merged

    def table_dir(self, table: str, version: int) -> str:
        return os.path.join(
            self.index_dir, table if version == 0 else f"{table}__v{version}"
        )

    def path(self, table: str) -> str:
        v = self._staged.get(table)
        if v is None:
            v = self.versions().get(table, 0)
        return self.table_dir(table, v)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS"))
            or any(f.endswith(".parquet") or f.startswith("shard=") for f in os.listdir(p))
        )

    def read(self, spark, table: str):
        return spark.read.parquet(self.path(table))

    def write(self, df, table: str, mode: str = "overwrite", partition_by: list[str] | None = None):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    # --- config sidecar (shard geometry etc.) ---
    # index_meta is VERSIONED like the staged tables: an incremental
    # update writes the new meta to index_meta__v{n}.json while
    # readers (and the update's own reuse guards) keep resolving the
    # committed file; commit_versions flips it with the same pointer
    # write. Version 0 is the bare index_meta.json.
    def _meta_file(self, version: int) -> str:
        name = "index_meta.json" if version == 0 else f"index_meta__v{version}.json"
        return os.path.join(self.index_dir, name)

    def write_meta(self, meta: dict) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        v = self._staged.get("index_meta")
        if v is None:
            v = self.versions().get("index_meta", 0)
        with open(self._meta_file(v), "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)

    def read_meta(self) -> dict:
        v = self._staged.get("index_meta")
        if v is None:
            v = self.versions().get("index_meta", 0)
        with open(self._meta_file(v)) as f:
            return json.load(f)

    # --- deferred GC (reader-safe) ---
    # A SearchIndex opened before an incremental update holds resolved
    # committed paths (and cached pyarrow datasets); deleting superseded
    # version dirs at commit time would make it start erroring
    # mid-query (r2 ADVICE). Supersede therefore QUEUES paths into
    # gc_pending.json; ``vacuum`` deletes them later, after a grace
    # period, skipping anything the current commit still references.
    def _gc_file(self) -> str:
        return os.path.join(self.index_dir, "gc_pending.json")

    def gc_queue(self, paths: list[str]) -> None:
        try:
            with open(self._gc_file()) as f:
                pending = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            pending = []
        import time

        now = time.time()
        known = {e["path"] for e in pending}
        for p in paths:
            if p not in known and os.path.exists(p):
                pending.append({"path": p, "queued_at": now})
        tmp = self._gc_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pending, f, indent=2)
        os.replace(tmp, self._gc_file())

    def _live_paths(self) -> set[str]:
        """Every path the CURRENT commit references — never vacuumed
        even if queued (defense against a buggy queue entry)."""
        live = {self.table_dir(t, self.versions().get(t, 0)) for t in TABLES}
        live.add(self._meta_file(self.versions().get("index_meta", 0)))
        for d in self.postings_dirs():
            live.add(d)
        return live

    def vacuum(self, grace_s: float = 0.0) -> list[str]:
        """Delete queued superseded paths older than ``grace_s``
        seconds. Returns the paths actually removed. Run this from a
        maintenance entry point once in-flight readers are known to be
        newer than the grace window (the Iceberg expire_snapshots
        analog)."""
        import shutil
        import time

        try:
            with open(self._gc_file()) as f:
                pending = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return []
        self._versions = None  # re-resolve the committed pointer
        live = self._live_paths()
        now = time.time()
        removed, kept = [], []
        for e in pending:
            if e["path"] in live:
                continue  # referenced again (or never superseded): drop entry
            if now - e["queued_at"] >= grace_s:
                if os.path.isdir(e["path"]):
                    shutil.rmtree(e["path"], ignore_errors=True)
                elif os.path.exists(e["path"]):
                    os.remove(e["path"])
                removed.append(e["path"])
            else:
                kept.append(e)
        tmp = self._gc_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(kept, f, indent=2)
        os.replace(tmp, self._gc_file())
        return removed

    def postings_dirs(self) -> list[str]:
        """Directories holding the committed postings partitions (one
        entry until snapshot-versioned postings land)."""
        return [self.path("postings")]

    def completed_shards(self, spark) -> set[int]:
        """Shards with a checkpoint-ledger row (resume = skip these)."""
        if not self.exists("ledger"):
            return set()
        rows = self.read(spark, "ledger").select("shard").distinct().collect()
        return {r.shard for r in rows}


def index_status(spark, index_dir: str) -> dict:
    """Admin status report — the ``tlgs_ctl status`` analog
    (tlgs/tlgs_ctl/main.cpp:96-110: page counts, stale counts).
    Returns corpus stats, ledger/build summary, pending shards."""
    from pyspark.sql import functions as F

    st = IndexStorage(index_dir)
    meta = st.read_meta()
    stats = st.read(spark, "collection_stats").collect()[0].asDict()
    done = st.completed_shards(spark)
    pending = [s for s in range(meta["n_shards"]) if s not in done]
    out = {
        "index_dir": index_dir,
        "meta": meta,
        "collection_stats": stats,
        "shards_done": len(done),
        "shards_pending": pending,
    }
    if st.exists("ledger"):
        led = (
            st.read(spark, "ledger")
            .agg(
                F.sum("n_postings").alias("postings"),
                F.sum("bytes_postings").alias("bytes"),
                F.max("skew_factor").alias("max_skew"),
                F.min("built_at").alias("first_built"),
                F.max("built_at").alias("last_built"),
            )
            .collect()[0]
        )
        out["ledger"] = {
            "total_postings": led.postings,
            "postings_bytes": led.bytes,
            "max_skew_factor": led.max_skew,
            "first_built": led.first_built,
            "last_built": led.last_built,
        }
    return out
