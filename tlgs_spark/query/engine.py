"""Query engine: open a built index, serve top-k BM25 searches.

Two execution paths over the same postings tables:

- **driver path** (`SearchIndex.search`): point-lookup the query
  terms' postings rows (parquet predicate pushdown on ``term`` within
  ``shard=`` partitions), decode to NumPy on the driver, score with
  the block-max scorer. This is the low-latency serving path — the
  analog of tlgs answering a query from PG's GIN index
  (search.cpp:438-446) — and is exact-parity with the oracle.

- **distributed path** (`SearchIndex.search_df`): the same scorer run
  per shard via ``applyInPandas`` (shards score in parallel, each
  emits a local top-k), then a global ``orderBy(score desc, doc_id)
  .limit(k)``. This is the 100 TB path: no posting list ever
  concentrates on one node (doc-range sharding), and the global merge
  moves only n_shards × k rows.

Post-rank filters (OR within type / AND across; XOR negation except
size filters, whose negation folds into the comparison direction at
parse time — evalFilter, search.cpp:643-676,224) are applied after
scoring and before
pagination, preserving the reference's result-count semantics; filters
over 10^12 docs would join the ranked candidates to ``docs`` instead
(same predicate, expressed in Spark).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import bm25
from ..indexer.codec import decode_postings, decode_postings_batch, decode_varints
from ..indexer.storage import IndexStorage
from ..tokenizer import s_stem, tokenize_query
from .parser import SearchFilter, eval_filter_row, parse_search_query
from .scorer import (
    LazyTermData,
    TermData,
    _exact_scores,
    _topk_order,
    search_and,
    search_or,
    tf_norm_vec,
)
from .snippet import make_snippet


def block_bounds_arr(row, fmt: int, avgdl: float) -> np.ndarray:
    """Per-block admissible tf_norm upper bound (float64) from a
    postings row, under any format — THE single authority for the
    bound (the driver path's method and every executor closure call
    this one function, so the K1/B constants can never fork between
    copies).

    Format 3 evaluates tf_norm over the block's stored (tf, dl) PARETO
    FRONT — real pairs, same float expression and op order as scoring
    (tf_norm_vec), so the bound is the block's EXACT maximum tf_norm:
    admissible with zero slack, no rounding pad needed, and tight
    enough that block-max WAND actually skips blocks.

    Format 2 computes tfn(max_tf, min_dl, avgdl) — best tf and best dl
    from possibly DIFFERENT docs — padded by 1e-12 relative: the
    monotone formula at the block's extremes dominates every element
    up to float rounding, and the pad swallows that rounding (WAND
    stays exact; bound loose)."""
    if fmt >= 3:
        fn = np.asarray(row["block_fn"], dtype=np.int64)
        if fn.size == 0:
            return np.zeros(0, dtype=np.float64)
        s = tf_norm_vec(
            np.asarray(row["block_ftf"], dtype=np.int64),
            np.asarray(row["block_fdl"], dtype=np.int64),
            avgdl,
        )
        return np.maximum.reduceat(s, np.cumsum(fn) - fn)
    if fmt >= 2:
        t = np.asarray(row["block_tfmax"], dtype=np.float64)
        d = np.asarray(row["block_dlmin"], dtype=np.float64)
        if t.size == 0:
            return t
        b = t * (bm25.K1 + 1.0) / (
            t + bm25.K1 * (1.0 - bm25.B + bm25.B * d / avgdl)
        )
        return b * (1.0 + 1e-12)
    return np.asarray(row["block_max"], dtype=np.float64)


def _stream_scorer(score_one, b_dl):
    """mapInPandas kernel shared by search_df and exact_scores_df:
    a scan task's rows cover only whole shards (one unsplit file each,
    gated by _one_file_per_shard), so grouping by shard within the
    task is exact. ``score_one(group_pdf, dl_global)`` does the
    per-shard scoring."""

    def score_stream(batches):
        accs = list(batches)
        if not accs:
            return
        allr = pd.concat(accs, ignore_index=True)
        if not len(allr):
            return
        dl_global = b_dl.value
        for _, g in allr.groupby("shard", sort=False):
            yield score_one(g, dl_global)

    return score_stream


def _group_scorer(score_one, b_dl):
    """groupBy(shard).applyInPandas twin of _stream_scorer: doc
    lengths come from the broadcast when it fits, else from the
    norms-join columns riding the group (per-shard dls blob)."""

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if b_dl is not None:
            dl_global = b_dl.value
        else:
            base = int(pdf["base"].iloc[0])
            dls_shard = decode_varints(bytes(pdf["dls"].iloc[0])).astype(np.int64)
            dl_global = np.zeros(base + len(dls_shard), dtype=np.int64)
            dl_global[base:] = dls_shard  # scorer indexes by global doc_id
        return score_one(pdf, dl_global)

    return score_shard


# ---------------- Arrow-native executor kernels (format 3) ----------------
# The pandas kernels copy every posting blob into a Python bytes object
# and every block-metadata list into an object array during Arrow→pandas
# conversion — ~60 ms/task of pure conversion on dense terms, which IS
# the single-wave latency floor a large cluster would see. The Arrow
# kernels read blobs as zero-copy buffer slices and block metadata as
# zero-copy int64 views, and hand the scorer LazyTermData so per-shard
# block skipping applies on executors exactly as on the driver.

def _list_cell(col, i: int) -> np.ndarray:
    """ChunkedArray list cell → int64 NumPy view (empty on NULL)."""
    v = col[i]
    if not v.is_valid:
        return np.zeros(0, dtype=np.int64)
    return np.asarray(v.values.to_numpy(zero_copy_only=False), dtype=np.int64)


def _lazy_terms_arrow(tbl, q_terms, df_map, shard_size: int, avgdl: float, fmt: int):
    """One shard's SELECTED postings rows (Arrow table) → per-query-term
    LazyTermData, zero-copy: the blob stays an Arrow buffer view, block
    metadata stays int64 views. Missing terms become empty TermData."""
    from .scorer import LazyTermData as _LTD
    from .scorer import TermData as _TD

    term_col = tbl.column("term").to_pylist()
    shard0 = int(tbl.column("shard")[0].as_py())
    base = shard0 * shard_size
    by = {t: i for i, t in enumerate(term_col)}
    post_col = tbl.column("postings")
    df_col = tbl.column("df")
    out = []
    for t in q_terms:
        i = by.get(t)
        if i is None:
            out.append(_TD(t, df_map.get(t, 0), np.zeros(0, np.int64),
                           np.zeros(0, np.int64), np.zeros(0, np.float64),
                           np.zeros(0, np.int64)))
            continue
        fn = _list_cell(tbl.column("block_fn"), i)
        row = {
            "block_fn": fn,
            "block_ftf": _list_cell(tbl.column("block_ftf"), i),
            "block_fdl": _list_cell(tbl.column("block_fdl"), i),
        }
        blast = _list_cell(tbl.column("block_last"), i)
        boff = _list_cell(tbl.column("block_off"), i)
        df = int(df_col[i].as_py())
        blob = np.frombuffer(post_col[i].as_buffer(), dtype=np.uint8)
        bm = block_bounds_arr(row, fmt, avgdl)
        nb = int(fn.size)
        sizes = np.full(nb, 128, dtype=np.int64)
        if nb:
            sizes[-1] = df - 128 * (nb - 1)
        bbytes = np.diff(np.append(boff, blob.size)) if nb else np.zeros(0, np.int64)
        prev = (
            np.concatenate(([base], blast[:-1])) if nb else np.zeros(0, np.int64)
        )
        out.append(_LTD(t, df_map.get(t, 0), blob, bm, sizes, blast, prev, boff, bbytes))
    return out


def _arrow_stream_scorer(score_tbl, b_dl):
    """mapInArrow kernel: a scan task's rows cover only whole shards
    (one unsplit file each, gated by _one_file_per_shard), so shards
    arrive as contiguous runs; non-contiguous repeats (defensive) are
    re-joined zero-copy via concat_tables."""

    def run(batches):
        import pyarrow as pa

        bl = list(batches)
        if not bl:
            return
        tbl = pa.Table.from_batches(bl)
        if tbl.num_rows == 0:
            return
        dl_global = b_dl.value
        shard_np = np.asarray(tbl.column("shard").to_numpy(zero_copy_only=False))
        change = np.nonzero(np.diff(shard_np))[0] + 1
        bounds = np.concatenate(([0], change, [shard_np.size]))
        parts: dict[int, list] = {}
        for a, b in zip(bounds[:-1], bounds[1:]):
            parts.setdefault(int(shard_np[a]), []).append(tbl.slice(int(a), int(b - a)))
        for s, ps in parts.items():
            sub = ps[0] if len(ps) == 1 else pa.concat_tables(ps)
            yield score_tbl(sub, dl_global)

    return run


def _arrow_group_scorer(score_tbl, b_dl):
    """groupBy(shard).applyInArrow twin of _arrow_stream_scorer: doc
    lengths from the broadcast when it fits, else from the norms-join
    columns riding the group (per-shard dls blob)."""

    def score_shard(tbl):
        import pyarrow as pa

        if b_dl is not None:
            dl_global = b_dl.value
        else:
            base = int(tbl.column("base")[0].as_py())
            dls_shard = decode_varints(
                bytes(tbl.column("dls")[0].as_buffer())
            ).astype(np.int64)
            dl_global = np.zeros(base + len(dls_shard), dtype=np.int64)
            dl_global[base:] = dls_shard
        rb = score_tbl(tbl, dl_global)
        return pa.Table.from_batches([rb])

    return score_shard


class EmptyQueryError(ValueError):
    """Query has no text terms (filter-only queries are rejected, like
    the reference: doc_search.csp:28-29)."""


class TooManyRequestsError(RuntimeError):
    """W5 admission control (search.cpp:686-696): more than
    ``max_in_flight`` concurrent searches → reject with exponential
    Retry-After, 2^(n/64) seconds capped at 512."""

    def __init__(self, in_flight: int):
        self.in_flight = in_flight
        self.retry_after = min(2.0 ** (in_flight / 64.0), 512.0)
        super().__init__(f"busy: {in_flight} in flight, retry after {self.retry_after:.0f}s")


class SearchIndex:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache_ttl: float = 600.0,
        at_snapshot: int | None = None,
    ):
        """``at_snapshot`` pins every read to a state recorded in the
        snapshot log (Iceberg ``VERSION AS OF``). Ids are allocated at
        commit and never reused; the first commit also records the
        pre-commit fresh-build state (id 0 for the first generation).
        Reads work until ``IndexStorage.vacuum`` expires the snapshot
        (protect a window with ``retain_snapshots``/grace); an expired,
        reset, or unknown snapshot raises KeyError here at open."""
        self.spark = spark
        self.st = IndexStorage(index_dir, at_snapshot=at_snapshot)
        self.meta = self.st.read_meta()
        row = self.st.read(spark, "collection_stats").collect()[0]
        self.n_docs = int(row.n_docs)
        self.avgdl = float(row.avgdl)
        self.shard_size = int(self.meta["shard_size"])
        # id-space high-water mark: n_docs is the LIVE count; delta
        # updates leave gaps (deletions) and allocate above the ceiling
        # (inserts), so every doc_id-indexed array sizes by ceiling
        self.doc_ceiling = int(self.meta.get("doc_ceiling", self.meta["n_docs"]))
        # postings format 1 stored per-block tf_norm float bounds;
        # format 2 stores per-block (max tf, min dl) ints and the
        # bound tfn(max_tf, min_dl, avgdl) is computed here at query
        # time (admissible: tfn is increasing in tf, decreasing in dl)
        self.postings_format = int(self.meta.get("postings_format", 1))
        # Snapshot completeness check (local dirs): a format-2 build
        # emits one partition dir per in-grid shard (every shard holds
        # at least its norms pseudo row), so an absent dir — manifest
        # reference or plain dir scan alike — means corruption
        # (over-eager cleanup, lost mount, a build opened mid-write).
        # Fail loudly at open rather than silently serving partial
        # results with wrong global stats.
        if self.postings_format >= 2:
            import os as _os

            if _os.path.isdir(index_dir):
                n_shards = int(self.meta["n_shards"])
                missing = [
                    _os.path.join(base, f"shard={s}")
                    for base, shards in self.st.postings_sources()
                    for s in (shards if shards is not None else range(n_shards))
                    if not _os.path.isdir(_os.path.join(base, f"shard={s}"))
                ]
                if missing:
                    raise FileNotFoundError(
                        f"index snapshot is missing shard partition(s): "
                        f"{missing[:5]}{'...' if len(missing) > 5 else ''} "
                        f"({len(missing)} missing)"
                    )
        self._dl: np.ndarray | None = None
        self._meta_cache: dict[int, tuple] = {}
        self._first_convs_cache: dict[str, frozenset] = {}
        # two-tier result cache, TTL 600 s (search.cpp:681,713-751):
        # tier 1 = raw ranked list per (terms, mode); tier 2 = the
        # filtered list per full query
        self.cache_ttl = cache_ttl
        self._raw_cache: dict = {}
        self._filtered_cache: dict = {}
        self.cache_hits = 0
        # DataFrame handles are kept so the parquet file listing
        # (InMemoryFileIndex over n_shards partitions) happens once per
        # index, not once per query
        self._postings_df = self.st.read(spark, "postings")
        self._norms_df = self.st.read(spark, "norms")
        self._term_stats_df = self.st.read(spark, "term_stats")
        # W5 admission control
        import threading

        self.max_in_flight = 64
        # distributed scorer: broadcast the dl array once when the
        # corpus fits (~8 B/doc); beyond this, per-shard norms join
        self.dl_broadcast_max_docs = 16_000_000
        # driver-path envelope: past this, search() routes its raw
        # scoring through the distributed per-shard scorer instead of
        # pulling postings to the driver. The 63M-turn probe measured
        # the driver path at cold p50 ~20 s there (multi-hundred-MB
        # blob fetch + decode per dense term) vs ~4.4 s distributed at
        # local[32] — and the distributed plan is the one that keeps
        # scaling with executors (sub-second at ≥128), while the
        # driver pull grows linearly with the corpus forever. Result
        # caches, filters, pagination and hydration are identical
        # either way (scores bit-identical — pinned by tests).
        self.driver_path_max_docs = 16_000_000
        self._in_flight = 0
        self._admission_lock = threading.Lock()

    def _serving_pool(self) -> None:
        """Route this thread's Spark jobs into a per-thread FAIR pool
        (session.py sets spark.scheduler.mode=FAIR). Pools are created
        on demand with default weight, so N concurrent serving threads
        share executors evenly instead of FIFO-queueing behind the
        first dense query's task waves (r5 VERDICT #1; reference analog:
        64 concurrent searches are the serving contract,
        search.cpp:686-696). Thread-local — build jobs (no pool set)
        keep the default pool's FIFO back-fill behavior. Bounded pool
        cardinality via the thread-id hash."""
        import threading

        try:
            self.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"tlgs-serve-{threading.get_ident() % 64}"
            )
        except Exception:
            pass  # scheduling hint only — never fail a query over it

    def close(self) -> None:
        """Release driver-side resources: the point-read thread pool
        and the memory-mapped ParquetFile handles (+ their fds), the
        result/term caches, and the executor-cached dl broadcast. A
        long-lived server that opens many snapshots serially (soak,
        time travel) would otherwise accumulate pools and fds for the
        process lifetime (r5 VERDICT #6). Idempotent; the index remains
        usable after close() — lazy caches simply rebuild."""
        for fi in (self.__dict__.pop("_field_cache", None) or {}).values():
            fi.close()
        pool = self.__dict__.pop("_pt_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)
        pf = self.__dict__.pop("_pf_cache", None)
        if pf:
            for entries in pf.values():
                for _, handle, _ in entries or []:
                    try:
                        handle.close()
                    except Exception:
                        pass
        bc = self.__dict__.pop("_dl_bc", None)
        if bc is not None:
            try:
                bc.unpersist(blocking=False)
            except Exception:
                pass
        self._raw_cache.clear()
        self._filtered_cache.clear()
        self._meta_cache.clear()
        self._first_convs_cache.clear()
        if hasattr(self, "_term_cache"):
            self._term_cache.clear()

    def __enter__(self) -> "SearchIndex":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---------------- caches ----------------

    @property
    def dl_of(self) -> np.ndarray:
        if self._dl is None:
            rows = self.st.read(self.spark, "norms").select("base", "dls").collect()
            out = np.zeros(self.meta["n_shards"] * self.shard_size, dtype=np.int64)
            for r in rows:
                dls = decode_varints(bytes(r.dls)).astype(np.int64)
                out[r.base : r.base + len(dls)] = dls
            self._dl = out[: self.doc_ceiling]
        return self._dl

    def _dl_broadcast(self):
        """One-time sc.broadcast of the decoded doc-length array for
        the distributed scorer (executors cache broadcast values across
        queries)."""
        if not hasattr(self, "_dl_bc"):
            self._dl_bc = self.spark.sparkContext.broadcast(self.dl_of)
        return self._dl_bc

    _META_COLS = ("conv_id", "turn_idx", "role", "tool", "size", "text_hash")
    _META_CACHE_MAX = 200_000  # bounded — never corpus-sized at 100×

    def _meta_lookup(self, ids: np.ndarray) -> pd.DataFrame:
        """Point-lookup docs metadata for the given doc_ids, indexed by
        doc_id. The r1 version collected the WHOLE docs table to the
        driver (fine at 2M docs, an OOM at 100×); now only the
        requested rows move — pyarrow row-group-pruned scan (docs are
        written doc_id-sorted) behind a bounded hot-doc cache, Spark
        filter fallback off local filesystems."""
        ids = np.unique(np.asarray(ids, dtype=np.int64))
        missing = [int(i) for i in ids if int(i) not in self._meta_cache]
        if missing:
            # hive-layout docs (v2): prune the lookup to exactly the
            # shard= dirs the requested ids live in
            sharded = str(self.meta.get("docs_layout", "")).startswith("sharded_sorted_v2")
            restrict = (
                sorted({int(i) // self.shard_size for i in missing}) if sharded else None
            )
            tbl = self._arrow_lookup(
                "docs", missing, ["doc_id", *self._META_COLS], key_field="doc_id",
                partitioning="hive" if sharded else None, shard_restrict=restrict,
            )
            if tbl is not None:
                got = tbl.to_pandas()
            else:
                got = (
                    self.st.read(self.spark, "docs")
                    .filter(F.col("doc_id").isin(missing))
                    .select("doc_id", *self._META_COLS)
                    .toPandas()
                )
            if len(self._meta_cache) + len(got) > self._META_CACHE_MAX:
                self._meta_cache.clear()
            for row in got.itertuples(index=False):
                self._meta_cache[int(row.doc_id)] = tuple(row)[1:]
        data = [
            self._meta_cache.get(int(i), (None, None, None, None, 0, None)) for i in ids
        ]
        out = pd.DataFrame(data, columns=list(self._META_COLS))
        out.index = pd.Index(ids, name="doc_id")
        return out

    def _attach_meta(self, res: pd.DataFrame, cols: tuple[str, ...]) -> pd.DataFrame:
        """Left-attach docs metadata by doc_id — a top-k/fetch-k-sized
        point lookup, never a corpus-wide structure."""
        req = res["doc_id"].to_numpy(dtype=np.int64)
        picked = self._meta_lookup(req).reindex(req)
        out = res.reset_index(drop=True)
        for c in cols:
            out[c] = picked[c].to_numpy()
        return out

    def first_turn_convs(self, term: str) -> frozenset:
        """conv_ids whose turn-0 text contains ``term`` (infirst:/
        intitle analog, search.cpp:206-207) — a per-term point lookup
        on the build-time first_turn_terms table (df-sized result, not
        corpus-sized). Legacy indexes without the table derive it with
        one distributed tokenize pass, still collecting only the
        matching conv_ids. The filter term goes through the SAME
        analyzer as the stored terms (lowercase + stem — the table
        holds tokenize_tokens output, which stems; the reference's
        intitle terms go through the same tsquery stemmer as body
        terms, search.cpp:441,445)."""
        t = s_stem(term.lower())
        hit = self._first_convs_cache.get(t)
        if hit is not None:
            return hit
        if self.st.exists("first_turn_terms"):
            tbl = self._arrow_lookup("first_turn_terms", [t], ["conv_id"])
            if tbl is not None:
                out = frozenset(tbl["conv_id"].to_pylist())
            else:
                rows = (
                    self.st.read(self.spark, "first_turn_terms")
                    .filter(F.col("term") == t)
                    .select("conv_id")
                    .collect()
                )
                out = frozenset(r.conv_id for r in rows)
        else:
            from ..indexer.build import tokenize_tokens

            rows = (
                tokenize_tokens(
                    self.st.read(self.spark, "docs")
                    .filter(F.col("turn_idx") == 0)
                    .select("doc_id", "text"),
                    hygiene=self.meta.get("hygiene", False),
                )
                .filter(F.col("term") == t)
                .join(self.st.read(self.spark, "docs").select("doc_id", "conv_id"), "doc_id")
                .select("conv_id")
                .distinct()
                .collect()
            )
            out = frozenset(r.conv_id for r in rows)
        self._first_convs_cache[t] = out
        return out

    # ---------------- postings access ----------------

    @property
    def _block_cols(self) -> list[str]:
        if self.postings_format >= 3:
            # (tf, dl) Pareto fronts — exact block bounds; block_fn's
            # length is the segment's block count
            return ["block_fn", "block_ftf", "block_fdl"]
        if self.postings_format >= 2:
            return ["block_tfmax", "block_dlmin"]
        return ["block_max"]

    def _block_bounds(self, row) -> np.ndarray:
        return block_bounds_arr(row, self.postings_format, self.avgdl)

    def term_rows(self, terms: list[str], shards: list[int] | None = None) -> pd.DataFrame:
        """Point-lookup the terms' postings rows. Serving path: direct
        pyarrow dataset scan (row-group pruning on the term-sorted
        files; ~0.3 s vs ~2.5 s through a Spark job whose 256-task
        scheduling dominates a point lookup). Falls back to the Spark
        scan if the index isn't on a local filesystem. The distributed
        path (search_df) keeps the Spark scan — there the 256 tasks ARE
        the parallelism. `shards` restricts the scan to those hive
        partitions (caller guarantees they cover every requested term's
        full presence list — partial coverage would silently truncate
        postings and corrupt the per-term cache)."""
        cols = ["term", "shard", "df", *self._block_cols, "postings"]
        if self.postings_format >= 3:
            # lazy-decode metadata (block-skipped BMW): skip pointers +
            # per-block byte offsets ride along
            cols[-1:-1] = ["block_last", "block_off"]
        tbl = self._arrow_lookup(
            "postings", terms, cols,
            partitioning="hive", shard_restrict=shards,
        )
        if tbl is not None:
            return tbl.to_pandas()
        pdf = self._postings_df.select(*cols).filter(F.col("term").isin(terms))
        if shards is not None:
            pdf = pdf.filter(F.col("shard").isin(shards))
        return pdf.toPandas()

    def _point_files(self, table: str):
        """Cached per-file point-lookup state for a local table: sorted
        [(shard|None, ParquetFile, key_col_name→(mins, maxs))] — the
        handles and per-row-group key statistics are parsed ONCE per
        open index (the snapshot is immutable), so a term lookup costs
        only the matching groups' reads. None ⇒ a source dir is
        non-local; the caller uses the dataset/Spark path instead.

        fd budget: one memory-mapped handle per shard file, held for
        the life of the open index — ≤ SHARD_BITMAP_MAX (4096) shards
        by construction plus a few files each, well under typical
        server nofile limits (this box: 20k); a constrained driver
        falls back to the dataset path by virtue of the open failing
        (caught below), not by crashing the query."""
        if not hasattr(self, "_pf_cache"):
            self._pf_cache: dict = {}
        if table in self._pf_cache:
            return self._pf_cache[table]
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        from ..indexer.storage import PARTITIONED_TABLES

        if table in PARTITIONED_TABLES:
            srcs = self.st.sources(table)
        else:
            srcs = [(self.st.path(table), None)]
        if not all(_os.path.isdir(base) for base, _ in srcs):
            self._pf_cache[table] = None  # non-local: dataset/Spark path
            return None
        files: list[tuple[int | None, str]] = []
        for base, shards in srcs:
            if table in PARTITIONED_TABLES:
                seen = set()
                for d in _os.scandir(base):
                    if not d.name.startswith("shard="):
                        continue
                    sid = int(d.name.split("=", 1)[1])
                    if shards is not None and sid not in shards:
                        continue
                    seen.add(sid)
                    for f in sorted(_glob.glob(_os.path.join(d.path, "*.parquet"))):
                        files.append((sid, f))
                missing = [s for s in (shards or []) if s not in seen]
                if missing:
                    # same loud contract as read_sharded: a manifest-
                    # referenced shard with no dir is corruption, not a
                    # legitimately empty shard
                    raise FileNotFoundError(
                        f"{table} manifest references missing shard "
                        f"partition(s) {missing[:5]} under {base}"
                    )
            else:
                for f in sorted(_glob.glob(_os.path.join(base, "*.parquet"))):
                    files.append((None, f))
        files.sort(key=lambda t: (-1 if t[0] is None else t[0], t[1]))
        entries = None
        try:
            entries = [(sid, _pq.ParquetFile(f, memory_map=True), {})
                       for sid, f in files]
        except (ImportError, OSError, ValueError):
            entries = None
        self._pf_cache[table] = entries
        return entries

    @staticmethod
    def _group_stats(handle, stats_by_col: dict, key_field: str):
        """(mins, maxs) of ``key_field`` across the file's row groups,
        parsed once and memoized on the entry; None in a slot ⇒ no
        statistics (treat the group as always-matching)."""
        got = stats_by_col.get(key_field)
        if got is not None:
            return got
        md = handle.metadata
        try:
            ci = md.schema.names.index(key_field)
        except ValueError:
            got = ([], [])
            stats_by_col[key_field] = got
            return got
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or not st.has_min_max:
                mins.append(None)
                maxs.append(None)
            else:
                mins.append(st.min)
                maxs.append(st.max)
        got = (mins, maxs)
        stats_by_col[key_field] = got
        return got

    def _point_read(self, table: str, keys: list, columns: list[str],
                    key_field: str, shard_restrict: list | None):
        """Stat-pruned threaded point read over cached ParquetFile
        handles. The generic dataset scanner pays ~1 ms of setup per
        file per scan and (with isin filters) skips no row groups at
        all; reading exactly the groups whose [min,max] covers a key
        through a shared thread pool measures 80–100 ms for a hot-term
        lookup over 256 shard files vs ~230 ms for the best dataset
        scan and ~5 s for the isin one. Returns None when any source
        is non-local (caller falls back to the dataset path)."""
        entries = self._point_files(table)
        if entries is None:
            return None
        import pyarrow as pa
        import pyarrow.compute as pc

        restrict = set(shard_restrict) if shard_restrict is not None else None
        want_shard = "shard" in columns
        file_cols = [c for c in columns if c != "shard"]
        if key_field not in file_cols:
            # the filter column rides along for the post-read exact
            # filter, then select(columns) drops it again
            file_cols = file_cols + [key_field]
        plan: list[tuple[int | None, object, list[int]]] = []
        for sid, h, statcache in entries:
            if restrict is not None and sid is not None and sid not in restrict:
                continue
            mins, maxs = self._group_stats(h, statcache, key_field)
            if not mins:
                gs = list(range(h.metadata.num_row_groups))
            else:
                gs = [
                    g
                    for g, (mn, mx) in enumerate(zip(mins, maxs))
                    if mn is None or any(mn <= k <= mx for k in keys)
                ]
            if gs:
                plan.append((sid, h, gs))
        if not plan:
            if not entries:
                return None
            fsch = entries[0][1].schema_arrow
            return pa.table({
                c: pa.array([], pa.int32() if c == "shard" else fsch.field(c).type)
                for c in columns
            })

        def rd(item):
            sid, h, gs = item
            t = h.read_row_groups(gs, columns=file_cols, use_threads=False)
            if want_shard:
                t = t.append_column(
                    "shard", pa.array([sid] * t.num_rows, pa.int32())
                )
            return t

        if len(plan) > 4:
            if not hasattr(self, "_pt_pool"):
                import concurrent.futures as _cf

                self._pt_pool = _cf.ThreadPoolExecutor(max_workers=8)
            parts = list(self._pt_pool.map(rd, plan))
        else:
            parts = [rd(p) for p in plan]
        tbl = pa.concat_tables(parts)
        mask = pc.is_in(tbl[key_field], value_set=pa.array(keys))
        return tbl.filter(mask).select(columns)

    def _arrow_lookup(self, table: str, keys: list, columns: list[str],
                      partitioning: str | None = None, key_field: str = "term",
                      shard_restrict: list | None = None):
        """Point lookup rows where key_field ∈ keys. Primary engine:
        :meth:`_point_read` (cached file handles + row-group key
        statistics + threaded pruned reads). Fallbacks, in order:
        cached pyarrow datasets (non-local-but-pyarrow-readable dirs),
        then None ⇒ the caller's Spark scan. The postings table is
        snapshot-versioned at partition granularity, so it may resolve
        to SEVERAL (base_dir, shard_ids) sources — one hive dataset
        each, scans restricted to the manifest's shards, results
        concatenated (pinned at first use, like every other resolved
        path on this SearchIndex: the open index IS a snapshot). A
        failed dataset open (non-local index dir) is cached so later
        queries don't re-pay directory discovery, and is logged once;
        read errors surface — a corrupt footer should fail loudly, not
        silently degrade to the 8×-slower Spark path forever."""
        got = self._point_read(table, keys, columns, key_field, shard_restrict)
        if got is not None:
            return got
        if not hasattr(self, "_arrow_cache"):
            self._arrow_cache: dict = {}
        if table not in self._arrow_cache:
            try:
                import pyarrow.dataset as ds_mod

                from ..indexer.storage import PARTITIONED_TABLES

                self._ds_mod = ds_mod
                if table in PARTITIONED_TABLES:
                    import os as _os

                    srcs = self.st.sources(table)
                    # manifest-restricted sources filter on the shard
                    # partition field — the dataset must discover it
                    if partitioning is None and any(
                        sh is not None for _, sh in srcs
                    ):
                        partitioning = "hive"
                    for base, shards in srcs:
                        if not _os.path.isdir(base):
                            continue  # non-local dir: dataset() below decides
                        missing = [
                            s
                            for s in (shards or [])
                            if not _os.path.isdir(_os.path.join(base, f"shard={s}"))
                        ]
                        if missing:
                            # same loud contract as read_sharded: a
                            # manifest-referenced shard with no dir is
                            # corruption, not a legitimately empty shard
                            raise FileNotFoundError(
                                f"{table} manifest references missing shard "
                                f"partition(s) {missing[:5]} under {base}"
                            )
                    self._arrow_cache[table] = [
                        (
                            ds_mod.dataset(base, format="parquet", partitioning=partitioning),
                            shards,
                        )
                        for base, shards in srcs
                    ]
                else:
                    self._arrow_cache[table] = [
                        (
                            ds_mod.dataset(
                                self.st.path(table), format="parquet", partitioning=partitioning
                            ),
                            None,
                        )
                    ]
            except FileNotFoundError:
                raise  # manifest corruption — never degrade to a fallback scan
            except (ImportError, OSError, ValueError) as e:
                import warnings

                warnings.warn(
                    f"pyarrow point-lookup unavailable for {table!r} "
                    f"({e.__class__.__name__}: {e}); using Spark scans"
                )
                self._arrow_cache[table] = None
        sources = self._arrow_cache[table]
        if sources is None:
            return None

        def key_filter():
            # parquet row-group statistics prune on comparisons and
            # their disjunctions but NOT on isin — measured on a
            # 256-file hot-term lookup: isin decompressed every row
            # group (~5.0 s) while OR(field==k) read only the groups
            # whose [min,max] covers a key (~0.23 s). Keys per lookup
            # are query terms or top-k doc ids, so the expression
            # stays tiny; isin remains the fallback for large sets
            # (linear expression depth eventually costs more than it
            # saves).
            f = self._ds_mod.field(key_field)
            if 0 < len(keys) <= 64:
                import functools
                import operator

                return functools.reduce(operator.or_, [f == k for k in keys])
            return f.isin(keys)

        tables = []
        for ds, shards in sources:
            flt = key_filter()
            if shards is not None:
                flt = flt & self._ds_mod.field("shard").isin(shards)
            if shard_restrict is not None:
                # term-presence pruning (hive partition skip): only the
                # fragments that can hold the requested terms are read
                flt = flt & self._ds_mod.field("shard").isin(shard_restrict)
            tables.append(ds.to_table(filter=flt, columns=columns))
        if len(tables) == 1:
            return tables[0]
        import pyarrow as pa

        return pa.concat_tables(tables)

    def _term_info(self, terms: list[str]) -> dict[str, tuple[int, list | None]]:
        """term → (exact global df, shard-presence list or None) via a
        direct pyarrow lookup on the term-sorted term_stats files
        (Spark-scan fallback). Presence comes from the explicit shard
        list (selective terms, ≤ TERM_SHARDS_MAX entries) or from the
        fixed-width shard_bits bitmap (every term while n_shards ≤
        SHARD_BITMAP_MAX — so mid-df terms prune too); None means
        'assume everywhere' — legacy indexes predating the columns,
        >4096-shard grids, or a full-coverage bitmap. Results are
        cached per term (term_stats is immutable for an open
        snapshot); absent terms cache as df=0 so repeat misses don't
        re-scan."""
        if not hasattr(self, "_tinfo_cache"):
            self._tinfo_cache: dict[str, tuple[int, list | None]] = {}
        missing = [t for t in terms if t not in self._tinfo_cache]
        if missing:
            fetched = self._term_info_uncached(missing)
            if len(self._tinfo_cache) < 65536:
                for t in missing:
                    self._tinfo_cache[t] = fetched.get(t, (0, []))
        else:
            fetched = {}
        out = {}
        for t in terms:
            d, sh = self._tinfo_cache.get(t) or fetched.get(t, (0, []))
            if d > 0:
                out[t] = (d, sh)
        return out

    def _term_info_uncached(self, terms: list[str]) -> dict[str, tuple[int, list | None]]:
        has_shards = "shards" in self._term_stats_df.columns
        has_bits = "shard_bits" in self._term_stats_df.columns
        has_bloom = "shard_bloom" in self._term_stats_df.columns
        cols = (
            ["term", "df"]
            + (["shards"] if has_shards else [])
            + (["shard_bits"] if has_bits else [])
            + (["shard_bloom"] if has_bloom else [])
        )
        tbl = self._arrow_lookup("term_stats", terms, cols)
        if tbl is not None:
            dfs = [int(x) for x in tbl["df"].to_pylist()]
            n = len(dfs)
            shl = tbl["shards"].to_pylist() if has_shards else [None] * n
            bl = tbl["shard_bits"].to_pylist() if has_bits else [None] * n
            bm = tbl["shard_bloom"].to_pylist() if has_bloom else [None] * n
            return {
                t: (d, self._presence(s, b, o))
                for t, d, s, b, o in zip(tbl["term"].to_pylist(), dfs, shl, bl, bm)
            }
        rows = self._term_stats_df.filter(F.col("term").isin(terms)).collect()
        return {
            r.term: (
                int(r.df),
                self._presence(
                    r.shards if has_shards else None,
                    r.shard_bits if has_bits else None,
                    r.shard_bloom if has_bloom else None,
                ),
            )
            for r in rows
        }

    def _presence(self, shards, bits, bloom=None) -> list | None:
        """Shard-presence list from a term_stats row: the explicit
        list when present (selective terms, ≤ TERM_SHARDS_MAX entries),
        else decoded from the fixed-width shard_bits bitmap (mid-df
        terms — the 65..n_shards-1 band that used to fall off the NULL
        cliff and scan everything), else the CANDIDATE set from the
        fixed-128 B shard_bloom (>SHARD_BITMAP_MAX grids — a sound
        superset: blooms have no false negatives, so pruning to it
        never drops a matching shard). None = unknown/everywhere
        (legacy index, or full coverage — which prunes nothing, and
        dropping it skips a useless n_shards-element isin filter)."""
        n_shards = int(self.meta["n_shards"])
        if shards is not None:
            return list(shards)
        if bits is not None:
            from ..indexer.codec import decode_shard_bits

            ids = decode_shard_bits(bytes(bits), n_shards)
            if len(ids) >= n_shards:
                return None
            return ids.tolist()
        if bloom is not None:
            from ..indexer.codec import bloom_candidate_shards

            ids = bloom_candidate_shards(bytes(bloom), n_shards)
            if len(ids) >= n_shards:
                return None
            return ids.tolist()
        return None

    def _term_df_map(self, terms: list[str]) -> dict[str, int]:
        return {t: d for t, (d, _) in self._term_info(terms).items()}

    def _query_shards(self, terms: list[str], info: dict, mode: str) -> list[int] | None:
        """Scan-pruning shard set for the query: AND = a matching doc's
        shard must hold postings for EVERY term → intersect the
        presence lists; OR = union (only when every present term has
        one). None = no pruning (some term is 'everywhere')."""
        if mode == "and":
            allowed: set | None = None
            for t in terms:
                sh = info.get(t, (0, None))[1]
                if sh is not None:
                    s = set(sh)
                    allowed = s if allowed is None else (allowed & s)
            return sorted(allowed) if allowed is not None else None
        present = [t for t in terms if t in info]
        if present and all(info[t][1] is not None for t in present):
            out: set = set()
            for t in present:
                out |= set(info[t][1])
            return sorted(out)
        return None

    @property
    def _one_file_per_shard(self) -> bool:
        """Gate for the single-stage distributed scorer: every shard
        partition is exactly ONE local parquet file smaller than the
        scan split size, so a scan task always holds COMPLETE shards
        and per-shard scoring needs no shuffle. Checked once per open
        index (it's a property of the snapshot)."""
        if not hasattr(self, "_ofps"):
            import os

            from ..utils import parse_byte_size

            try:
                split_s = self.spark.conf.get("spark.sql.files.maxPartitionBytes")
            except Exception:
                split_s = None
            # fail CLOSED on an unparseable split size: guessing a
            # default here could pass a file the scan actually splits,
            # and a task holding half a shard scores wrong results —
            # the grouped fallback is merely slower, never wrong
            split = parse_byte_size(split_s, default=-1)
            ok = split > 0
            for base, shards in [] if not ok else self.st.postings_sources():
                if not os.path.isdir(base):
                    continue
                dirs = (
                    [os.path.join(base, f"shard={s}") for s in shards]
                    if shards is not None
                    else [
                        os.path.join(base, d)
                        for d in os.listdir(base)
                        if d.startswith("shard=")
                    ]
                )
                for d in dirs:
                    if not os.path.isdir(d):
                        continue  # legacy format-1 zero-posting shard
                        # (format-2 absences raise at __init__)
                    try:
                        files = [
                            e
                            for e in os.scandir(d)
                            if e.is_file() and not e.name.startswith((".", "_"))
                        ]
                    except OSError:
                        ok = False
                        break
                    if len(files) > 1 or any(f.stat().st_size >= split for f in files):
                        ok = False
                        break
                if not ok:
                    break
            self._ofps = ok
        return self._ofps

    def term_data(self, terms: list[str]) -> list[TermData]:
        if not hasattr(self, "_term_cache"):
            self._term_cache: dict[str, TermData] = {}
        cached = {t: self._term_cache[t] for t in terms if t in self._term_cache}
        missing = [t for t in terms if t not in cached]
        if not missing:
            return [cached[t] for t in terms]
        fetched = self._term_data_uncached(missing)
        for td in fetched:
            if len(self._term_cache) < 4096:  # decoded-postings LRU-ish cap
                self._term_cache[td.term] = td
        by = {**cached, **{td.term: td for td in fetched}}
        return [by[t] for t in terms]

    def _term_data_uncached(self, terms: list[str]) -> list[TermData]:
        # prune the postings lookup to the terms' own shard-presence
        # union (mode-independent: each term's list covers ALL shards
        # holding it, so the fetched postings — and the per-term cache —
        # stay complete). A selective query reads a handful of hive
        # partitions instead of all n_shards; one dense term (no list)
        # disables pruning, and the full scan dominates anyway.
        shards = self._query_shards(terms, self._term_info(terms), "or")
        pdf = self.term_rows(terms, shards=shards).sort_values(["term", "shard"])
        groups = dict(tuple(pdf.groupby("term", sort=False)))
        out = []
        for t in terms:
            g = groups.get(t)
            if g is None or len(g) == 0:
                out.append(
                    TermData(t, 0, np.zeros(0, np.int64), np.zeros(0, np.int64),
                             np.zeros(0, np.float64), np.zeros(0, np.int64))
                )
                continue
            dfs = g["df"].to_numpy(dtype=np.int64)
            bases = g["shard"].to_numpy(dtype=np.int64) * self.shard_size
            blobs = [bytes(b) for b in g["postings"]]
            # block bounds: concatenate the per-segment block columns
            # and evaluate the (elementwise) bound formula ONCE per
            # term — a hot term spans hundreds of shard segments and
            # the old per-row iterrows() pass cost ~0.2 s of a 1.3 s
            # cold query in pandas Series construction alone
            cols = {
                c: [np.asarray(x, dtype=np.float64) for x in g[c].to_numpy()]
                for c in self._block_cols
            }
            first = cols[self._block_cols[0]]
            nbs = np.array([len(x) for x in first], dtype=np.int64)
            cat_row = {
                c: (np.concatenate(v) if v else np.zeros(0, np.float64))
                for c, v in cols.items()
            }
            bm_all = self._block_bounds(cat_row)
            # per-block posting counts: 128 everywhere except each
            # segment's last block, which holds the remainder
            sizes = np.full(int(nbs.sum()), 128, dtype=np.int64)
            nz = nbs > 0
            last_idx = np.cumsum(nbs) - 1
            sizes[last_idx[nz]] = dfs[nz] - 128 * (nbs[nz] - 1)
            if self.postings_format >= 3:
                # LAZY term: no decode here. Assemble the global block
                # metadata (skip pointers, absolute byte offsets into
                # the concatenated blob stream, per-block predecessor
                # doc ids) — the scorer decodes only the blocks the
                # top-k threshold cannot prune.
                seg_lens = np.array([len(b) for b in blobs], dtype=np.int64)
                seg_off = np.cumsum(seg_lens) - seg_lens
                bl_lists = [np.asarray(x, dtype=np.int64) for x in g["block_last"]]
                bo_lists = [np.asarray(x, dtype=np.int64) for x in g["block_off"]]
                block_last = (
                    np.concatenate(bl_lists) if bl_lists else np.zeros(0, np.int64)
                )
                block_off = (
                    np.concatenate([bo + so for bo, so in zip(bo_lists, seg_off)])
                    if bo_lists
                    else np.zeros(0, np.int64)
                )
                block_bytes = (
                    np.concatenate(
                        [
                            np.diff(np.append(bo, ln))
                            for bo, ln in zip(bo_lists, seg_lens)
                        ]
                    )
                    if bo_lists
                    else np.zeros(0, np.int64)
                )
                block_prev = (
                    np.concatenate(
                        [
                            np.concatenate(([b], bl[:-1]))
                            for b, bl in zip(bases, bl_lists)
                        ]
                    )
                    if bl_lists
                    else np.zeros(0, np.int64)
                )
                blob_cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
                out.append(
                    LazyTermData(
                        t, int(dfs.sum()), blob_cat, bm_all, sizes,
                        block_last, block_prev, block_off, block_bytes,
                    )
                )
                continue
            doc_ids, tfs = decode_postings_batch(blobs, dfs, bases)
            out.append(TermData(t, int(dfs.sum()), doc_ids, tfs, bm_all, sizes))
        return out

    # ---------------- search (driver path) ----------------

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        page: int | None = None,
        with_preview: bool = False,
        dedup: bool = False,
        link_scores: dict | None = None,
    ) -> pd.DataFrame:
        """Top-k search. ``page=p`` returns the p-th k-sized slice of
        the ranked (and filtered) list — reference pagination is
        10/page over the full cached result list (search.cpp:756-758).
        ``link_scores`` (doc_id → SALSA/HITS score) switches on the
        reference's combine stage: exp-boost × size-penalized text
        score, harmonic mean (search.cpp:539-553).
        """
        import time

        with self._admission_lock:
            if self._in_flight >= self.max_in_flight:
                raise TooManyRequestsError(self._in_flight)
            self._in_flight += 1
        try:
            return self._search_inner(query, k, mode, page, with_preview, dedup, link_scores)
        finally:
            with self._admission_lock:
                self._in_flight -= 1

    def _search_inner(self, query, k, mode, page, with_preview, dedup, link_scores) -> pd.DataFrame:
        import time

        text_query, filt = parse_search_query(query)
        terms = tokenize_query(text_query)
        if not terms:
            raise EmptyQueryError(query)
        want = (page + 1) * k if page is not None else k
        fetch_k = want if filt.is_empty() else max(want * 10, 1000)
        if dedup:
            fetch_k = max(fetch_k * 2, fetch_k + 100)

        now = time.monotonic()
        raw_key = (tuple(terms), mode, fetch_k)
        hit = self._raw_cache.get(raw_key)
        if hit is not None and hit[0] > now:
            self.cache_hits += 1
            doc_ids, scores = hit[1]
        elif self.doc_ceiling > self.driver_path_max_docs:
            # big-corpus route: raw scoring runs distributed (per-shard
            # scorers + TakeOrderedAndProject merge — the plan that
            # scales with executors); only the top-fetch_k rows ever
            # reach the driver. Same scores, same (-score, doc_id)
            # order as the in-process path (pinned by tests); caches,
            # filters, pagination and hydration below are shared.
            doc_ids, scores = self._topk_distributed(terms, mode, fetch_k)
            self._raw_cache[raw_key] = (now + self.cache_ttl, (doc_ids, scores))
        else:
            tds = self.term_data(terms)
            if mode == "and":
                doc_ids, scores = search_and(tds, self.dl_of, self.n_docs, self.avgdl, fetch_k)
            else:
                doc_ids, scores = search_or(tds, self.dl_of, self.n_docs, self.avgdl, fetch_k)
            self._raw_cache[raw_key] = (now + self.cache_ttl, (doc_ids, scores))

        filt_key = (query, mode, fetch_k, dedup)
        hit = self._filtered_cache.get(filt_key)
        if hit is not None and hit[0] > now:
            self.cache_hits += 1
            res = hit[1]
        else:
            res = pd.DataFrame({"doc_id": doc_ids, "score": scores})
            if dedup:
                from .rerank import dedup_results

                res = self._attach_meta(res, ("text_hash",))
                res = dedup_results(res).drop(columns=["text_hash"])
            if not filt.is_empty():
                res = self._apply_filter(res, filt)
            self._filtered_cache[filt_key] = (now + self.cache_ttl, res)

        if link_scores is not None and len(res):
            from .rerank import combine_scores

            sized = self._attach_meta(res, ("size",))
            res = combine_scores(sized, link_scores).drop(columns=["size"])
        if page is not None:
            res = res.iloc[page * k : (page + 1) * k]
        else:
            res = res.head(k)
        res = self._attach_meta(res, ("conv_id", "turn_idx", "role", "tool", "size"))
        if with_preview and len(res):
            res = self._hydrate_previews(res, terms)
        return res.reset_index(drop=True)

    def _topk_distributed(
        self, terms: list[str], mode: str, fetch_k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Global top-``fetch_k`` (doc_ids, scores) via the distributed
        per-shard scoring core — the driver never touches a postings
        blob. Ordering (-score, doc_id) matches the in-process path."""
        self._serving_pool()
        info = self._term_info(terms)
        local = self._scored_local_df(terms, info, mode, fetch_k)
        if local is None:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
        pdf = (
            local.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(fetch_k)
            .toPandas()
        )
        return (
            pdf["doc_id"].to_numpy(np.int64),
            pdf["score"].to_numpy(np.float64),
        )

    def _apply_filter(self, res: pd.DataFrame, filt: SearchFilter) -> pd.DataFrame:
        # per-spec conv sets from the precomputed first_turn_terms
        # table (df-sized), not a corpus-wide conv→tokens map; the row
        # predicate only ever tests membership of the FILTER terms, so
        # the per-row token set is reconstructed from those sets
        conv_sets = (
            # keys are the ANALYZED (lowered + stemmed) filter terms —
            # eval_filter_row stems its membership probes the same way
            {s_stem(term.lower()): self.first_turn_convs(term) for term, _ in filt.infirst}
            if filt.infirst
            else {}
        )
        # one vectorized metadata gather (point lookup + reindex), then
        # the per-row predicate
        req = res["doc_id"].to_numpy(dtype=np.int64)
        picked = self._meta_lookup(req).reindex(req)
        keep = [
            eval_filter_row(
                filt, tool, role, conv, int(size),
                {t for t, s in conv_sets.items() if conv in s},
            )
            for tool, role, conv, size in zip(
                picked["tool"], picked["role"], picked["conv_id"], picked["size"]
            )
        ]
        return res[np.asarray(keep, dtype=bool)]

    def _hydrate_previews(self, res: pd.DataFrame, terms: list[str]) -> pd.DataFrame:
        ids = [int(x) for x in res["doc_id"]]
        rows = (
            self.st.read(self.spark, "docs")
            .filter(F.col("doc_id").isin(ids))
            .select("doc_id", "text")
            .collect()
        )
        texts = {r.doc_id: r.text for r in rows}
        res = res.copy()
        res["preview"] = [make_snippet(texts.get(i, ""), terms) for i in ids]
        return res

    # ---------------- search (fielded, title_vector analog) ----------------

    def field_index(self, field: str = "first5") -> "SearchIndex":
        """Open (and cache) the field sub-index built by
        build_field_index — same doc_ids as the body index by
        construction (identical (conv_id, turn_idx) ordering)."""
        import os

        if self.st.at_snapshot is not None:
            # field sub-indexes are UNVERSIONED derived caches rebuilt
            # in place post-commit — serving one next to a pinned body
            # snapshot would silently mix generations
            raise RuntimeError(
                "field sub-indexes are not snapshot-versioned; fielded "
                "search is unavailable on a time-travel reader"
            )
        if not hasattr(self, "_field_cache"):
            self._field_cache: dict[str, SearchIndex] = {}
        if field not in self._field_cache:
            self._field_cache[field] = SearchIndex(
                self.spark, os.path.join(self.st.index_dir, f"field_{field}")
            )
        return self._field_cache[field]

    def search_fielded(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        title_weight: float = 50.0,
        field: str = "first5",
    ) -> pd.DataFrame:
        """W1 field-weighted search over the INDEX: candidates from the
        body match alone (the reference's WHERE uses search_vector only,
        search.cpp:441), score = body + w·title
        (ts_rank_cd(title)*50 + ts_rank_cd(search_vector),
        search.cpp:438-442). Rank-identical to oracle.search_fielded."""
        text_query, _ = parse_search_query(query)
        terms = tokenize_query(text_query)
        if not terms:
            raise EmptyQueryError(query)
        tds = self.term_data(terms)
        if mode == "and":
            if any(td.doc_ids.size == 0 for td in tds):
                return pd.DataFrame({"doc_id": [], "score": []})
            by_df = sorted(tds, key=lambda t: t.doc_ids.size)
            cand = by_df[0].doc_ids
            for td in by_df[1:]:
                pos = np.searchsorted(td.doc_ids, cand)
                pos_c = np.minimum(pos, td.doc_ids.size - 1)
                cand = cand[(pos < td.doc_ids.size) & (td.doc_ids[pos_c] == cand)]
                if cand.size == 0:
                    return pd.DataFrame({"doc_id": [], "score": []})
        else:
            nonempty = [td.doc_ids for td in tds if td.doc_ids.size]
            if not nonempty:
                return pd.DataFrame({"doc_id": [], "score": []})
            cand = np.unique(np.concatenate(nonempty))
        body = _exact_scores(cand, tds, self.dl_of, self.n_docs, self.avgdl)
        ft = self.field_index(field)
        ttds = ft.term_data(terms)
        title = _exact_scores(cand, ttds, ft.dl_of, ft.n_docs, ft.avgdl)
        ids, sc = _topk_order(cand, body + title_weight * title, k)
        return pd.DataFrame({"doc_id": ids, "score": sc})

    # ---------------- search (distributed path) ----------------

    def _filter_column(self, filt: SearchFilter, docs: DataFrame):
        """evalFilter as a Spark boolean Column over the docs table
        (OR within type, AND across; XOR negation except size, whose
        direction is pre-folded at parse time) — the distributed
        rendering of search.cpp:643-676."""
        cond = F.lit(True)
        if filt.size:
            # negation is folded into the direction at parse time
            # (search.cpp:224) — strict compare, no XOR
            per = [
                (F.col("size") > v) if op == ">" else (F.col("size") < v)
                for op, v in filt.size
            ]
            any_ = per[0]
            for p in per[1:]:
                any_ = any_ | p
            cond = cond & (F.col("size") != 0) & any_
        for field, specs in (("tool", filt.tool), ("role", filt.role)):
            if specs:
                per = [
                    (F.coalesce(F.col(field), F.lit("")).startswith(p)) != F.lit(neg)
                    for p, neg in specs
                ]
                any_ = per[0]
                for x in per[1:]:
                    any_ = any_ | x
                cond = cond & any_
        if filt.conv:
            per = [(F.col("conv_id") == c) != F.lit(neg) for c, neg in filt.conv]
            any_ = per[0]
            for x in per[1:]:
                any_ = any_ | x
            cond = cond & any_
        if filt.infirst:
            # flag columns `_inf{i}` are attached by search_df via
            # broadcast joins against the first_turn_terms table — no
            # conv data is ever collected to the driver on this path
            per = [
                (F.coalesce(F.col(f"_inf{i}"), F.lit(False))) != F.lit(neg)
                for i, (_, neg) in enumerate(filt.infirst)
            ]
            any_ = per[0]
            for x in per[1:]:
                any_ = any_ | x
            cond = cond & any_
        return cond

    def _first_terms_df(self) -> DataFrame:
        """The (conv_id, term) infirst flag table as a DataFrame —
        build-time table when present, else derived distributively
        (legacy indexes), never collected."""
        if not hasattr(self, "_ftt_df"):
            if self.st.exists("first_turn_terms"):
                self._ftt_df = self.st.read(self.spark, "first_turn_terms")
            else:
                from ..indexer.build import tokenize_tokens

                docs = self.st.read(self.spark, "docs")
                self._ftt_df = (
                    tokenize_tokens(
                        docs.filter(F.col("turn_idx") == 0).select("doc_id", "text"),
                        hygiene=self.meta.get("hygiene", False),
                    )
                    .join(docs.select("doc_id", "conv_id"), "doc_id")
                    .select("conv_id", "term")
                    .distinct()
                )
        return self._ftt_df

    def search_df(self, query: str, k: int = 10, mode: str = "and") -> DataFrame:
        """Spark-plan search: per-shard scoring, post-rank filters as a
        join against docs, then global top-k merge. Returns a
        DataFrame(doc_id, score).

        Two physical strategies, same semantics (both oracle-gated):

        - **single-stage** (default when every shard partition is one
          unsplit local file and the dl broadcast fits): the postings
          scan itself feeds ``mapInPandas``; each scan task holds only
          COMPLETE shards, so per-shard scoring happens inside the scan
          with NO shuffle, and the global top-k is a
          TakeOrderedAndProject. One stage, ~scan-task-count tasks —
          the applyInPandas shuffle cost (~1.5 s fixed at 256 shards)
          is gone.
        - **grouped** fallback: ``groupBy(shard).applyInPandas`` (multi
          file shards, norms-join dl delivery, non-local index).

        Scan pruning: selective terms carry a shard-presence list in
        term_stats; AND intersects, OR unions — a one-shard term scans
        one partition, not n_shards (hive partition pruning).
        """
        text_query, filt = parse_search_query(query)
        terms = tokenize_query(text_query)
        if not terms:
            raise EmptyQueryError(query)
        self._serving_pool()
        # exact global df per term (idf must be identical on every
        # shard); point lookup via pyarrow like term_rows — a Spark job
        # here costs ~1 s of scheduling for a handful of rows
        info = self._term_info(terms)
        fetch_k = k if filt.is_empty() else max(k * 10, 1000)
        local = self._scored_local_df(terms, info, mode, fetch_k)
        if local is None:
            return self.spark.createDataFrame([], "doc_id long, score double")
        if not filt.is_empty():
            meta_cols = self.st.read(self.spark, "docs").select(
                "doc_id", "conv_id", "role", "tool", "size"
            )
            local = local.join(meta_cols, "doc_id")
            for i, (term, _) in enumerate(filt.infirst):
                flags = (
                    self._first_terms_df()
                    .filter(F.col("term") == s_stem(term.lower()))
                    .select("conv_id")
                    .distinct()
                    .withColumn(f"_inf{i}", F.lit(True))
                )
                local = local.join(F.broadcast(flags), "conv_id", "left")
            local = local.filter(self._filter_column(filt, meta_cols)).select(
                "doc_id", "score"
            )
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _scored_local_df(self, terms, info, mode: str, fetch_k: int):
        """The distributed scoring CORE shared by ``search_df`` and the
        big-corpus driver route: per-shard top-``fetch_k`` scoring as a
        DataFrame(doc_id, score) — unordered, unfiltered, unlimited
        (callers order/filter/limit). Returns None when the result is
        provably empty (AND with a vanished term, or the shard-presence
        intersection pruned every shard)."""
        df_map = {t: d for t, (d, _) in info.items()}
        if mode == "and" and len(df_map) < len(terms):
            return None
        n_docs, avgdl, shard_size = self.n_docs, self.avgdl, self.shard_size
        q_terms = list(terms)

        posts = self._postings_df.filter(F.col("term").isin(list(terms)))
        allowed = self._query_shards(q_terms, info, mode)
        if allowed is not None:
            if not allowed:
                return None
            posts = posts.filter(F.col("shard").isin(allowed))
        # doc-length delivery: a per-query broadcast JOIN of the norms
        # blobs re-broadcasts ~tens of MB on EVERY query (~1.7 s). For
        # corpora whose dl array fits a broadcast variable, broadcast it
        # ONCE per index — executors cache broadcast values, so repeat
        # queries pay nothing. Larger corpora keep the norms join (a
        # 10^12-doc dl array can't live in one broadcast; each shard
        # then decodes only its own blob).
        use_dl_bc = self.doc_ceiling <= self.dl_broadcast_max_docs
        sel_cols = ["shard", "term", "df", *self._block_cols, "postings"]
        if self.postings_format >= 3:
            sel_cols[-1:-1] = ["block_last", "block_off"]
        if use_dl_bc:
            b_dl = self._dl_broadcast()
            joined = posts.select(*sel_cols)
        else:
            b_dl = None
            # project BEFORE the join: format-2 postings carry their own
            # per-shard `dls` pseudo-column, which would collide with the
            # norms table's `dls` (and the blobs are dead weight anyway)
            joined = posts.select(*sel_cols).join(
                F.broadcast(self._norms_df.select("shard", "base", "dls")),
                "shard",
            )

        # executor-side block-bound derivation: block_bounds_arr is
        # module-level and the closure captures scalars only (capturing
        # `self` would drag the SparkSession into the pickled function)
        fmt = self.postings_format

        def _score_one(pdf: pd.DataFrame, dl_global) -> pd.DataFrame:
            """Score ONE complete shard's postings rows (pandas kernel,
            format ≤ 2)."""
            shard0 = int(pdf["shard"].iloc[0])
            base = shard0 * shard_size
            tds = []
            rows_by_term = {t: None for t in q_terms}
            for _, r in pdf.iterrows():
                rows_by_term[r["term"]] = r
            for t in q_terms:
                r = rows_by_term.get(t)
                if r is None:
                    tds.append(TermData(t, df_map.get(t, 0), np.zeros(0, np.int64),
                                        np.zeros(0, np.int64), np.zeros(0, np.float64),
                                        np.zeros(0, np.int64)))
                    continue
                d, tf = decode_postings(bytes(r["postings"]), base=base)
                bm = block_bounds_arr(r, fmt, avgdl)
                sizes = np.full(len(bm), 128, dtype=np.int64)
                if len(bm):
                    sizes[-1] = len(d) - 128 * (len(bm) - 1)
                tds.append(TermData(t, df_map.get(t, 0), d, tf, bm, sizes))
            fn = search_and if mode == "and" else search_or
            ids, sc = fn(tds, dl_global, n_docs, avgdl, fetch_k)
            return pd.DataFrame({"doc_id": ids, "score": sc})

        def _score_one_arrow(sub, dl_global):
            """Arrow kernel (format 3): zero-copy blob/metadata handoff
            + per-shard block skipping via LazyTermData."""
            import pyarrow as pa

            tds = _lazy_terms_arrow(sub, q_terms, df_map, shard_size, avgdl, fmt)
            fn = search_and if mode == "and" else search_or
            ids, sc = fn(tds, dl_global, n_docs, avgdl, fetch_k)
            return pa.record_batch(
                {"doc_id": pa.array(ids, pa.int64()), "score": pa.array(sc, pa.float64())}
            )

        out_schema = "doc_id long, score double"
        if use_dl_bc and self._one_file_per_shard:
            # single-stage: score inside the scan (see the kernels)
            if fmt >= 3:
                local = posts.select(*sel_cols).mapInArrow(
                    _arrow_stream_scorer(_score_one_arrow, b_dl), schema=out_schema
                )
            else:
                local = posts.select(*sel_cols).mapInPandas(
                    _stream_scorer(_score_one, b_dl), schema=out_schema
                )
        elif fmt >= 3:
            local = joined.groupBy("shard").applyInArrow(
                _arrow_group_scorer(_score_one_arrow, b_dl), schema=out_schema
            )
        else:
            local = joined.groupBy("shard").applyInPandas(
                _group_scorer(_score_one, b_dl), schema=out_schema
            )
        return local

    def exact_scores_df(self, terms: list[str], mode: str = "and") -> DataFrame:
        """DataFrame(doc_id, score): EXACT BM25 scores for every doc
        matching ``terms`` under ``mode`` — no top-k, no block-max
        pruning (the building block of the fielded distributed path,
        where another field's contribution can reorder any candidate).

        Physical strategies mirror search_df: term→shard pruning on the
        scan, then score INSIDE the scan (mapInPandas; scan tasks hold
        complete shards) when every shard partition is one unsplit
        local file and the dl broadcast fits — no shuffle at all —
        else groupBy(shard).applyInPandas with dls delivered via the
        norms join."""
        info = self._term_info(terms)
        dfm = {t: d for t, (d, _) in info.items()}
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not terms or (mode == "and" and len(dfm) < len(terms)):
            return empty
        n_docs, avgdl, shard_size = self.n_docs, self.avgdl, self.shard_size
        q_terms = list(terms)

        posts = self._postings_df.filter(F.col("term").isin(terms))
        allowed = self._query_shards(q_terms, info, mode)
        if allowed is not None:
            if not allowed:
                return empty
            posts = posts.filter(F.col("shard").isin(allowed))
        use_dl_bc = self.doc_ceiling <= self.dl_broadcast_max_docs
        b_dl = self._dl_broadcast() if use_dl_bc else None
        fmt = self.postings_format

        def _score_one(pdf: pd.DataFrame, dl_global) -> pd.DataFrame:
            base = int(pdf["shard"].iloc[0]) * shard_size
            rows = {r["term"]: r for _, r in pdf.iterrows()}
            tds = []
            for t in q_terms:
                r = rows.get(t)
                if r is None:
                    tds.append(TermData(t, dfm.get(t, 0), np.zeros(0, np.int64),
                                        np.zeros(0, np.int64), np.zeros(0, np.float64),
                                        np.zeros(0, np.int64)))
                    continue
                d, tf = decode_postings(bytes(r["postings"]), base=base)
                tds.append(TermData(t, dfm.get(t, 0), d, tf,
                                    np.zeros(0, np.float64), np.zeros(0, np.int64)))
            if mode == "and":
                if any(td.doc_ids.size == 0 for td in tds):
                    return pd.DataFrame({"doc_id": [], "score": []})
                by_df = sorted(tds, key=lambda t: t.doc_ids.size)
                cand = by_df[0].doc_ids
                for td in by_df[1:]:
                    pos = np.searchsorted(td.doc_ids, cand)
                    pos_c = np.minimum(pos, td.doc_ids.size - 1)
                    cand = cand[(pos < td.doc_ids.size) & (td.doc_ids[pos_c] == cand)]
                    if cand.size == 0:
                        return pd.DataFrame({"doc_id": [], "score": []})
            else:
                nonempty = [td.doc_ids for td in tds if td.doc_ids.size]
                if not nonempty:
                    return pd.DataFrame({"doc_id": [], "score": []})
                cand = np.unique(np.concatenate(nonempty))
            sc = _exact_scores(cand, tds, dl_global, n_docs, avgdl)
            return pd.DataFrame({"doc_id": cand, "score": sc})

        def _exact_one_arrow(sub, dl_global):
            """Arrow kernel (format 3): AND-mode decodes the rarest term
            plus only the blocks covering surviving candidates; OR-mode
            must score every match, so it materializes (but blobs and
            metadata still hand off zero-copy)."""
            import pyarrow as pa

            def _empty():
                return pa.record_batch(
                    {"doc_id": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )

            tds = _lazy_terms_arrow(sub, q_terms, dfm, shard_size, avgdl, fmt)
            if mode == "and":
                if any(td.n_postings == 0 for td in tds):
                    return _empty()
                by_df = sorted(tds, key=lambda t: t.n_postings)
                cand = by_df[0].doc_ids
                for td in by_df[1:]:
                    hit, _ = td.lookup(cand)
                    cand = cand[hit]
                    if cand.size == 0:
                        return _empty()
            else:
                nonempty = [td.doc_ids for td in tds if td.n_postings]
                if not nonempty:
                    return _empty()
                cand = np.unique(np.concatenate(nonempty))
            sc = _exact_scores(cand, tds, dl_global, n_docs, avgdl)
            return pa.record_batch(
                {"doc_id": pa.array(cand, pa.int64()),
                 "score": pa.array(sc, pa.float64())}
            )

        sel_cols = ["shard", "term", "postings"]
        if fmt >= 3:
            sel_cols = ["shard", "term", "df", *self._block_cols,
                        "block_last", "block_off", "postings"]
        out_schema = "doc_id long, score double"
        if use_dl_bc and self._one_file_per_shard:
            if fmt >= 3:
                return posts.select(*sel_cols).mapInArrow(
                    _arrow_stream_scorer(_exact_one_arrow, b_dl), schema=out_schema
                )
            return posts.select(*sel_cols).mapInPandas(
                _stream_scorer(_score_one, b_dl), schema=out_schema
            )

        joined = posts.select(*sel_cols) if b_dl is not None else posts.select(
            *sel_cols
        ).join(
            F.broadcast(self._norms_df.select("shard", "base", "dls")),
            "shard",
        )
        if fmt >= 3:
            return joined.groupBy("shard").applyInArrow(
                _arrow_group_scorer(_exact_one_arrow, b_dl), schema=out_schema
            )
        return joined.groupBy("shard").applyInPandas(
            _group_scorer(_score_one, b_dl), schema=out_schema
        )

    def search_df_fielded(
        self,
        query: str,
        k: int = 10,
        mode: str = "and",
        title_weight: float = 50.0,
        field: str = "first5",
    ) -> DataFrame:
        """Distributed rendering of search_fielded as a composition of
        two shuffle-free passes + one small join: the BODY pass scores
        every candidate (the reference's WHERE uses search_vector only,
        search.cpp:441), the TITLE pass scores every doc matching ANY
        term in the title field, and score = body + w·title via a left
        join (missing title ⇒ +0.0, exactly the 0.0 the fused kernel
        added). Score-identical to the driver path: per-field sums run
        in the same per-term order inside _exact_scores, and the
        combine is the same mul-then-add on float64.

        vs the previous union+groupBy plan: postings blobs never
        shuffle (each pass scores inside its own index's scan when the
        single-stage gate holds); the join moves one 16-byte row per
        matching doc, and AND-mode candidate sets are intersection-
        small. The global top-k is a TakeOrderedAndProject."""
        text_query, _ = parse_search_query(query)
        terms = tokenize_query(text_query)
        if not terms:
            raise EmptyQueryError(query)
        ft = self.field_index(field)
        w = float(title_weight)
        body = self.exact_scores_df(terms, mode)
        title = ft.exact_scores_df(terms, "or").withColumnRenamed("score", "_ts")
        out = (
            body.join(title, "doc_id", "left")
            .select(
                "doc_id",
                (F.col("score") + F.lit(w) * F.coalesce(F.col("_ts"), F.lit(0.0))).alias(
                    "score"
                ),
            )
        )
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
