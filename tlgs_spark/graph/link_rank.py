"""HITS and SALSA link analysis as iterative DataFrame jobs.

Reference: hitsRank (search.cpp:253-306) and salsaRank
(search.cpp:316-412) run per-query over an in-memory adjacency list.
Here the graph is an edges DataFrame ``(src long, dst long)`` and each
iteration is a join+groupBy aggregate — GraphFrames-style
aggregateMessages without the dependency.

Recurrence parity (pinned by tests/test_graph.py):

- **HITS is Jacobi**: both calc sums read the PREVIOUS iteration's
  auth/hub snapshot (search.cpp:271-279). A node whose calc sum is 0
  KEEPS its previous score (:281-285); each vector normalizes by
  ``max(sum, 1.0)`` (:287-288); normalized scores strictly below
  float epsilon (~1.1920929e-7) flush to 0 (:297-301) AFTER the
  convergence delta is taken. hitsRank's return value is the auth
  vector — we return hub too as a bonus column.
- **SALSA keeps ONE combined score vector** over ALL nodes:
  classification ``is_auth = in_deg > out_deg`` runs on the original
  graph (:324-328), same-side edges are dropped (:331-354), scores
  init to 1/num_auths resp. 1/num_hubs counted over ALL nodes, each
  side updates from the previous iteration's snapshot via the
  two-hop degree-normalized average, and the whole vector normalizes
  ONCE by ``max(sum(previous scores), 1.0)`` (:403-408 accumulates
  the OLD vector). Nodes isolated in the bipartite graph drop to 0
  (no keep-old rule in SALSA). No denormal flush (HITS-only).
- Convergence: sum of |Δ| across the full vector(s), loop while
  delta > eps; HITS eps=0.005, SALSA eps=0.005*2 (:259,356).

Documented divergence: the reference accumulates neighbor sums and
stores the SALSA local averages in float32, in adjacency order — a
declarative engine has no stable accumulation order to mirror, so all
arithmetic here is float64. Everything else is recurrence-exact.

Scale notes: the reference runs link analysis per query over the
candidate graph only — root set capped at 50k (search.cpp:442) — so
the common case is a SMALL graph regardless of corpus size. Both
entry points therefore dispatch: graphs whose edge count fits the
driver (≤ ``driver_threshold``) run a NumPy ``bincount`` scatter-add
loop (one Spark job to fetch the edges, zero per iteration); larger
graphs fall back to the distributed iterative-join formulation, where
the edges DataFrame is cached once, scores are localCheckpoint()ed
every ``checkpoint_every`` iterations to cut lineage (I7 in SURVEY
§2.8), normalization stays IN the plan (broadcast 1-row cross
join — no per-iteration collect), and convergence is tested
driver-side on exactly ONE 1-row aggregate per iteration (sum |Δ|
over both score vectors), never by collecting scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# std::numeric_limits<float>::epsilon() — the HITS denormal-avoidance
# flush threshold (search.cpp:297-301). NOT FLT_MIN: the reference
# zeroes anything below ~1.19e-7, which changes rankings on fringe
# nodes of large candidate graphs.
HITS_FLUSH_EPS = float(np.finfo(np.float32).eps)  # 1.1920928955078125e-07

# per-query candidate graphs are ≤50k nodes in the reference; 2M edges
# ≈ 32 MB on the driver — far under any sane driver memory
DRIVER_EDGE_THRESHOLD = 2_000_000


def _distinct_edge_index(pdf: pd.DataFrame):
    """→ (nodes, s_idx, d_idx): compact 0..n-1 node index over the
    DISTINCT edge set (matches the DataFrame paths' .distinct())."""
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s, d = inv[: len(src)], inv[len(src) :]
    n = len(nodes)
    uniq = np.unique(s * n + d)
    return nodes, (uniq // n).astype(np.int64), (uniq % n).astype(np.int64)


def _hits_driver(spark, pdf: pd.DataFrame, eps: float, max_iter: int) -> DataFrame:
    nodes, s, d = _distinct_edge_index(pdf)
    n = len(nodes)
    schema = "node long, auth double, hub double"
    if n == 0:
        return spark.createDataFrame([], schema)
    auth = np.full(n, 1.0 / n)
    hub = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        # Jacobi: BOTH sums read the previous iteration's snapshot
        calc_auth = np.bincount(d, weights=hub[s], minlength=n)
        calc_hub = np.bincount(s, weights=auth[d], minlength=n)
        # keep the previous score where the calc sum is 0 (:281-285)
        new_auth = np.where(calc_auth != 0.0, calc_auth, auth)
        new_hub = np.where(calc_hub != 0.0, calc_hub, hub)
        asum = max(new_auth.sum(), 1.0)
        hsum = max(new_hub.sum(), 1.0)
        na, nh = new_auth / asum, new_hub / hsum
        delta = np.abs(auth - na).sum() + np.abs(hub - nh).sum()
        # flush AFTER the delta (the reference flushes the stored
        # scores in the same pass that measured the delta, :290-301)
        auth = np.where(na < HITS_FLUSH_EPS, 0.0, na)
        hub = np.where(nh < HITS_FLUSH_EPS, 0.0, nh)
        if delta <= eps:
            break
    return spark.createDataFrame(
        pd.DataFrame({"node": nodes, "auth": auth, "hub": hub}), schema
    )


def _salsa_driver(spark, pdf: pd.DataFrame, eps: float, max_iter: int) -> DataFrame:
    nodes, s, d = _distinct_edge_index(pdf)
    n = len(nodes)
    schema = "node long, side string, score double"
    if n == 0:
        return spark.createDataFrame([], schema)
    outd = np.bincount(s, minlength=n)
    ind = np.bincount(d, minlength=n)
    is_auth = ind > outd  # side split on the ORIGINAL graph (:324-328)
    n_auth = int(is_auth.sum())
    n_hub = n - n_auth
    # init 1/num_auths resp. 1/num_hubs counted over ALL nodes; the
    # max(...,1) guards a side with zero members (no node reads it)
    score = np.where(is_auth, 1.0 / max(n_auth, 1), 1.0 / max(n_hub, 1))
    # bipartite graph: only hub→auth edges feed the updates (:331-354
    # keeps every cross-side edge, but auth→hub edges are never read)
    keep = (~is_auth[s]) & is_auth[d]
    bs, bd = s[keep], d[keep]
    hdeg = np.bincount(bs, minlength=n).astype(np.float64)  # |out(hub)|
    adeg = np.bincount(bd, minlength=n).astype(np.float64)  # |in(auth)|
    safe_h = np.maximum(hdeg, 1.0)
    safe_a = np.maximum(adeg, 1.0)
    for _ in range(max_iter):
        # local_out per hub j: (Σ_{a∈out(j)} score[a]/|in(a)|) / |out(j)|
        t = np.bincount(bs, weights=(score / safe_a)[bd], minlength=n) / safe_h
        # local_in per auth a: (Σ_{h∈in(a)} score[h]/|out(h)|) / |in(a)|
        u = np.bincount(bd, weights=(score / safe_h)[bs], minlength=n) / safe_a
        new_auth = np.bincount(bd, weights=t[bs], minlength=n)
        new_hub = np.bincount(bs, weights=u[bd], minlength=n)
        new_score = np.where(is_auth, new_auth, new_hub)
        # ONE normalization of the combined vector by the sum of the
        # PREVIOUS scores (:403 accumulates `score` pre-assignment)
        ns = new_score / max(score.sum(), 1.0)
        delta = np.abs(ns - score).sum()
        score = ns
        if delta <= eps:
            break
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "node": nodes,
                "side": np.where(is_auth, "auth", "hub"),
                "score": score,
            }
        ),
        schema,
    )


def hits_rank(
    edges: DataFrame,
    eps: float = 0.005,
    max_iter: int = 300,
    checkpoint_every: int = 3,
    driver_threshold: int = DRIVER_EDGE_THRESHOLD,
) -> DataFrame:
    """→ (node, auth, hub), reference recurrence (see module doc):
    Jacobi updates, keep-old-on-zero, max(sum,1) normalization,
    epsilon flush."""
    e = edges.select("src", "dst").distinct().cache()
    if e.count() <= driver_threshold:
        return _hits_driver(edges.sparkSession, e.toPandas(), eps, max_iter)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    inv_n = 1.0 / nodes.count()
    scores = nodes.select(
        "node", F.lit(inv_n).alias("auth"), F.lit(inv_n).alias("hub")
    )
    for i in range(max_iter):
        prev = scores
        calc_auth = (
            e.join(scores.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("ca"))
        )
        # Jacobi: the hub sum reads the PREVIOUS auth, not this
        # iteration's fresh one (search.cpp:278-279)
        calc_hub = (
            e.join(scores.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("ch"))
        )
        raw = (
            scores.join(calc_auth, "node", "left")
            .join(calc_hub, "node", "left")
            .select(
                "node",
                "auth",
                "hub",
                # keep-old where the calc sum is NULL (no in/out edges)
                # or exactly 0 (all contributors flushed)
                F.coalesce(F.nullif(F.col("ca"), F.lit(0.0)), F.col("auth")).alias("na"),
                F.coalesce(F.nullif(F.col("ch"), F.lit(0.0)), F.col("hub")).alias("nh"),
            )
        )
        sums = raw.agg(
            F.greatest(F.sum("na"), F.lit(1.0)).alias("asum"),
            F.greatest(F.sum("nh"), F.lit(1.0)).alias("hsum"),
        )
        normed = raw.crossJoin(F.broadcast(sums)).select(
            "node",
            "auth",
            "hub",
            (F.col("na") / F.col("asum")).alias("na"),
            (F.col("nh") / F.col("hsum")).alias("nh"),
        )
        # ONE action per iteration: the convergence delta (pre-flush,
        # like the reference)
        delta = (
            normed.agg(
                F.sum(
                    F.abs(F.col("auth") - F.col("na"))
                    + F.abs(F.col("hub") - F.col("nh"))
                ).alias("d")
            ).collect()[0]["d"]
        )
        scores = normed.select(
            "node",
            F.when(F.col("na") < HITS_FLUSH_EPS, F.lit(0.0)).otherwise(F.col("na")).alias("auth"),
            F.when(F.col("nh") < HITS_FLUSH_EPS, F.lit(0.0)).otherwise(F.col("nh")).alias("hub"),
        )
        if (i + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint()
        if delta is not None and delta <= eps:
            break
    return scores


def salsa_rank(
    edges: DataFrame,
    eps: float = 0.01,
    max_iter: int = 300,
    checkpoint_every: int = 3,
    driver_threshold: int = DRIVER_EDGE_THRESHOLD,
) -> DataFrame:
    """SALSA, reference recurrence (see module doc): side split on
    original degrees over ALL nodes, hub→auth bipartite propagation,
    ONE combined score vector normalized by the previous iteration's
    sum. → (node, side, score) for every graph node."""
    e0 = edges.select("src", "dst").distinct().cache()
    if e0.count() <= driver_threshold:
        return _salsa_driver(edges.sparkSession, e0.toPandas(), eps, max_iter)
    deg = (
        e0.select(F.col("src").alias("node"), F.lit(1).alias("out_"), F.lit(0).alias("in_"))
        .union(e0.select(F.col("dst").alias("node"), F.lit(0), F.lit(1)))
        .groupBy("node")
        .agg(F.sum("out_").alias("outd"), F.sum("in_").alias("ind"))
        .withColumn("side", F.when(F.col("ind") > F.col("outd"), F.lit("auth")).otherwise(F.lit("hub")))
        .cache()
    )
    counts = {r["side"]: r["cnt"] for r in deg.groupBy("side").agg(F.count("*").alias("cnt")).collect()}
    n_auth = counts.get("auth", 0)
    n_hub = counts.get("hub", 0)
    side = deg.select("node", "side")
    e = (
        e0.join(side.withColumnRenamed("node", "src").withColumnRenamed("side", "side_src"), "src")
        .join(side.withColumnRenamed("node", "dst").withColumnRenamed("side", "side_dst"), "dst")
        .filter((F.col("side_src") == "hub") & (F.col("side_dst") == "auth"))
        .select("src", "dst")
        .cache()
    )
    # bipartite degrees, carried on every edge row
    hub_deg = e.groupBy("src").agg(F.count("*").alias("hdeg"))
    auth_deg = e.groupBy("dst").agg(F.count("*").alias("adeg"))
    ew = e.join(hub_deg, "src").join(auth_deg, "dst").cache()

    scores = side.select(
        "node",
        "side",
        F.when(F.col("side") == "auth", F.lit(1.0 / max(n_auth, 1)))
        .otherwise(F.lit(1.0 / max(n_hub, 1)))
        .alias("score"),
    )
    for i in range(max_iter):
        prev = scores
        sc = scores.select("node", "score")
        # local_out per hub src: (Σ_{dst} score[dst]/adeg[dst]) / hdeg
        t = (
            ew.join(sc.withColumnRenamed("node", "dst").withColumnRenamed("score", "sa"), "dst")
            .groupBy("src")
            .agg((F.sum(F.col("sa") / F.col("adeg")) / F.first("hdeg")).alias("t"))
        )
        new_auth = (
            ew.join(t, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("t").alias("raw"))
        )
        # local_in per auth dst: (Σ_{src} score[src]/hdeg[src]) / adeg
        u = (
            ew.join(sc.withColumnRenamed("node", "src").withColumnRenamed("score", "sh"), "src")
            .groupBy("dst")
            .agg((F.sum(F.col("sh") / F.col("hdeg")) / F.first("adeg")).alias("u"))
        )
        new_hub = (
            ew.join(u, "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("u").alias("raw"))
        )
        olds = scores.agg(F.greatest(F.sum("score"), F.lit(1.0)).alias("osum"))
        scores = (
            scores.join(new_auth, "node", "left")
            .join(new_hub.withColumnRenamed("raw", "raw_h"), "node", "left")
            .crossJoin(F.broadcast(olds))
            .select(
                "node",
                "side",
                (
                    F.coalesce(
                        F.when(F.col("side") == "auth", F.col("raw")).otherwise(F.col("raw_h")),
                        F.lit(0.0),
                    )
                    / F.col("osum")
                ).alias("score"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint()
        # ONE action for the convergence delta
        delta = (
            scores.join(prev.select("node", F.col("score").alias("p")), "node")
            .agg(F.sum(F.abs(F.col("score") - F.col("p"))).alias("d"))
            .collect()[0]["d"]
        ) or 0.0
        if delta <= eps:
            break
    return scores.select("node", "side", "score")
