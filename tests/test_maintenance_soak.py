"""Maintenance-loop soak (r4 verdict #2): the delta/changelog/compact
pieces are each tested in isolation elsewhere; production runs them as
a LOOP, forever (reference analog: the crawler fires twice weekly via
systemd/tlgs_crawler.timer:5 and PostgreSQL absorbs the churn). This
drives ~100 successive ``apply_changes`` batches — edits skewed to a
few hot conversations, plus inserts and deletes — against one index,
with periodic ``compact_index`` and ``vacuum``, asserting throughout:

- search identity vs a from-scratch build of the tracked corpus state
  at checkpoints (hydrated results + float-exact scores);
- docs-table exactness vs the tracked state at the end (live keys and
  text hashes);
- ``doc_ceiling/n_docs`` drift stays bounded and compaction resets it;
- the snapshot log stays trimmed under periodic vacuum, and the GC
  backlog is bounded by the COMPACTION INTERVAL, never by index age:
  between compactions it retains the partially-referenced old
  partitioned bases (delta manifests point unchanged shards into prior
  version dirs — that is the design, not a leak) and one post-compact
  vacuum drains the whole queue;
- update latency stays flat (no per-batch cost creep as snapshots,
  manifests and id gaps accumulate).

The 21M-scale twin of this loop is tools/soak_probe.py (run by hand;
results recorded in BASELINE.md).
"""

import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tlgs_spark.corpus import generate_pandas
from tlgs_spark.indexer.build import build_index
from tlgs_spark.indexer.storage import IndexStorage, index_status
from tlgs_spark.streaming.incremental import apply_changes, compact_index

N_BATCHES = 100
HOT_CONVS = 4  # edits skew to these conversations
VACUUM_EVERY = 20
COMPACT_AT = {40, 80}
CHECKPOINTS = {24, 49, 74, N_BATCHES - 1}


def _sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def _delete_rows(template: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
    dl = keys.copy()
    for c in template.columns:
        if c in ("conv_id", "turn_idx"):
            continue
        dl[c] = pd.NaT if str(template[c].dtype).startswith("datetime") else None
    return dl[template.columns]


def _fingerprint(spark, idx, queries):
    from tlgs_spark.query.engine import SearchIndex

    si = SearchIndex(spark, idx)
    out = []
    for q in queries:
        for mode in ("and", "or"):
            r = si.search(q, k=10, mode=mode)
            out.append(
                (
                    q,
                    mode,
                    tuple(
                        sorted(
                            zip(
                                [round(float(s), 10) for s in r["score"]],
                                r["conv_id"].tolist(),
                                r["turn_idx"].tolist(),
                            ),
                            key=lambda x: (-x[0], x[1], x[2]),
                        )
                    ),
                )
            )
    return out


def test_maintenance_loop_soak(spark, tmp_path):
    state = generate_pandas(30).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    idx = str(tmp_path / "idx_soak")
    build_index(spark, _sdf(spark, state), idx, n_shards=8)
    hot = sorted(state["conv_id"].unique())[:HOT_CONVS]
    queries = ("tok0000 tok0001", "tok0002", "marker000", "soakedit")

    lat = []
    ceiling_ratios = []
    last_compact_b = -1
    next_conv = 9000  # brand-new conversations insert from here
    for b in range(N_BATCHES):
        rng = np.random.default_rng(1000 + b)
        used_keys: set = set()
        # -- edits: 3 turns, skewed to the hot conversations --
        edit_rows = []
        pool = state[state["conv_id"].isin(hot)] if b % 4 else state
        for _ in range(3):
            row = pool.iloc[int(rng.integers(0, len(pool)))]
            key = (row["conv_id"], int(row["turn_idx"]))
            if key in used_keys:
                continue
            used_keys.add(key)
            r = row.copy()
            r["text"] = f"{r['text']} soakedit b{b}"
            edit_rows.append(r)
        batch = pd.DataFrame(edit_rows)
        # -- inserts: every 3rd batch a new turn on a hot conv, every
        # 9th also a brand-new conversation --
        if b % 3 == 0:
            conv = hot[b // 3 % len(hot)]
            turns = state.loc[state["conv_id"] == conv, "turn_idx"]
            tmpl = state[state["conv_id"] == conv].iloc[-1].copy()
            tmpl["turn_idx"] = int(turns.max()) + 1
            tmpl["text"] = f"inserted turn soakinsert b{b}"
            if (tmpl["conv_id"], int(tmpl["turn_idx"])) not in used_keys:
                used_keys.add((tmpl["conv_id"], int(tmpl["turn_idx"])))
                batch = pd.concat([batch, tmpl.to_frame().T], ignore_index=True)
        if b % 9 == 0:
            tmpl = state.iloc[0].copy()
            tmpl["conv_id"] = f"conv{next_conv:06d}"
            next_conv += 1
            tmpl["turn_idx"] = 0
            tmpl["text"] = f"fresh conversation soaknew b{b}"
            batch = pd.concat([batch, tmpl.to_frame().T], ignore_index=True)
        # -- deletes: every 5th batch one cold turn --
        del_keys = None
        if b % 5 == 0:
            cold = state[~state["conv_id"].isin(hot)]
            row = cold.iloc[int(rng.integers(0, len(cold)))]
            key = (row["conv_id"], int(row["turn_idx"]))
            if key not in used_keys:
                used_keys.add(key)
                del_keys = pd.DataFrame(
                    {"conv_id": [key[0]], "turn_idx": [key[1]]}
                )
                batch = pd.concat(
                    [batch, _delete_rows(state, del_keys)], ignore_index=True
                )
        batch = batch.astype(state.dtypes.to_dict())

        t0 = time.time()
        res = apply_changes(spark, _sdf(spark, batch), idx)
        lat.append(time.time() - t0)
        assert res["mode"] == "delta"

        # -- mirror the batch into the tracked state --
        upserts = batch[batch["text"].notna()]
        keys = set(zip(upserts["conv_id"], upserts["turn_idx"].astype(int)))
        state = state[
            ~state.apply(
                lambda r: (r["conv_id"], int(r["turn_idx"])) in keys, axis=1
            )
        ]
        state = pd.concat([state, upserts], ignore_index=True)
        if del_keys is not None:
            dk = (del_keys.iloc[0]["conv_id"], int(del_keys.iloc[0]["turn_idx"]))
            state = state[
                ~((state["conv_id"] == dk[0]) & (state["turn_idx"] == dk[1]))
            ]
        state = state.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

        st = IndexStorage(idx)
        ceiling_ratios.append(index_status(spark, idx)["id_space"]["ceiling_ratio"])
        if b in COMPACT_AT:
            res_c = compact_index(spark, idx)
            assert index_status(spark, idx)["id_space"]["ceiling_ratio"] == 1.0
            assert res_c["ceiling_after"] <= res_c["ceiling_before"]
            # compaction is the backlog's drain point: every pre-compact
            # version dir is now fully superseded (the fresh manifests
            # reference only the compacted bases), so one vacuum clears
            # the whole accumulated queue
            IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=1)
            drained = len(IndexStorage(idx)._gc_pending())
            assert drained <= 4, f"post-compact vacuum left {drained} queued"
            last_compact_b = b
        if (b + 1) % VACUUM_EVERY == 0:
            IndexStorage(idx).vacuum(grace_s=0.0, retain_snapshots=1)
            st2 = IndexStorage(idx)
            # snapshot log trimmed to the retained window
            assert len(st2.snapshots()) <= 2
            # Between compactions the GC queue legitimately RETAINS the
            # partially-referenced old partitioned-table bases (a delta
            # manifest points unchanged shards into prior version dirs
            # — deleting those would corrupt the live index), so the
            # backlog grows ~linearly with batches since the last
            # compact and is RESET by it. Bounded debt = linear in the
            # compaction interval, never in total index age.
            since = b - last_compact_b
            pending = len(st2._gc_pending())
            assert pending <= 4 * since + 8, (b, since, pending)

        if b in CHECKPOINTS:
            fresh = str(tmp_path / f"idx_fresh_{b}")
            build_index(spark, _sdf(spark, state), fresh, n_shards=8)
            assert _fingerprint(spark, idx, queries) == _fingerprint(
                spark, fresh, queries
            ), f"search identity diverged at batch {b}"

    # -- end-state exactness: live docs == tracked state --
    docs = (
        IndexStorage(idx)
        .read(spark, "docs")
        .select("conv_id", "turn_idx", "text_hash")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        _sdf(spark, state)
        .select("conv_id", "turn_idx", F.xxhash64("text").alias("text_hash"))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(docs, want)

    # -- id-space drift stayed bounded (deletes are rare and compaction
    # resets the ceiling) --
    assert max(ceiling_ratios) < 1.5

    # -- flat latency: the last quarter's median must not creep past
    # 2x the first quarter's (generous: ambient load noise). For the
    # tail, discard the single worst batch before bounding at 5x the
    # early median: over 100 batches on this shared box one batch can
    # eat a neighbor-load stall or a full GC (observed: a lone 65 s
    # spike at an unremarkable batch, flat quartiles either side) —
    # one outlier is weather, two is a pattern. A catastrophic cap
    # still applies to the absolute worst batch.
    q = N_BATCHES // 4
    early, late = float(np.median(lat[:q])), float(np.median(lat[-q:]))
    assert late < 2.0 * early, (early, late)
    worst_two = sorted(lat)[-2:]
    assert worst_two[0] < 5.0 * early, (early, worst_two)
    assert worst_two[1] < 25.0 * early, (early, worst_two)
