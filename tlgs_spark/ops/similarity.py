"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline. One pass, JVM-side
  `aggregate`/`zip_with` arithmetic, no UDF. At scale this is a full
  scan but embarrassingly parallel (map-side top-k via sort+limit
  with AQE; no shuffle of the corpus).
- IVF-style bucketed ANN: assign every vector to its nearest of C
  deterministic centroids (a broadcast join), search only the probe's
  nearest n_probe buckets. The 100 TB path: partition pruning on the
  centroid id column.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector.
    → (vec_id, cos) ordered by (cos desc, vec_id). All JVM-side."""
    q = [float(x) for x in query_vec]
    qn = float(np.sqrt(np.dot(q, q)))
    if qn == 0.0:
        raise ValueError("cosine_topk: zero-norm query vector")
    qcol = F.array(*[F.lit(x) for x in q])
    v = _as_double(F.col(vec_col))
    # zero-norm rows (failed/padded embeds) divide 0/0 → NaN, and Spark
    # orders NaN ABOVE every real double — they would rank first in the
    # top-k. Exclude them (cosine is undefined there); the oracle SQL
    # carries the same norm>0 predicate.
    out = emb.filter(_norm(_as_double(F.col(vec_col))) > 0).select(
        F.col(id_col).alias("vec_id"),
        F.round(_dot(v, qcol) / (_norm(v) * F.lit(qn)), 4).alias("cos"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def ivf_fit_np(
    x: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """The spherical Lloyd's k-means kernel (shared by the Spark-sampled
    fit and the parquet-direct fit the oracle uses). Deterministic:
    seeded init, fixed iteration count; empty clusters reseed from the
    point farthest from its centroid. Returns unit row-vectors
    (n_centroids × dim)."""
    x = np.asarray(x, dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(nrm > 0, nrm, 1.0)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        sims = x @ cents.T                        # spherical: cosine argmax
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members) == 0:
                # reseed on the worst-served point
                worst = int(np.argmin(sims[np.arange(len(x)), assign]))
                cents[c] = x[worst]
                continue
            m = members.sum(axis=0)
            mn = np.linalg.norm(m)
            cents[c] = m / mn if mn > 0 else cents[c]
    if k < n_centroids:  # degenerate tiny corpus: pad deterministically
        pad = rng.standard_normal((n_centroids - k, x.shape[1]))
        pad /= np.linalg.norm(pad, axis=1, keepdims=True)
        cents = np.vstack([cents, pad])
    return cents


def ivf_fit(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_size: int = 50_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Fit IVF centroids with spherical Lloyd's k-means on a BOUNDED
    driver-side sample — the FAISS-style training regime: train on
    ≤ sample_size vectors (one sampled collect, never corpus-sized),
    assign the full corpus distributively afterwards. Deterministic
    given a fixed input partitioning (Spark's seeded sample is
    per-partition); for partitioning-independent determinism fit from
    a sorted parquet read via :func:`ivf_fit_np` instead."""
    n = emb.count()
    frac = min(1.0, (sample_size * 1.2) / max(n, 1))  # oversample, then cap
    pdf = (
        emb.select(_as_double(F.col(vec_col)).alias("v"))
        .sample(withReplacement=False, fraction=frac, seed=seed)
        .limit(sample_size)
        .toPandas()
    )
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    return ivf_fit_np(x, n_centroids=n_centroids, iters=iters, seed=seed)


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Assign each vector to its nearest centroid — pass ``centroids``
    from :func:`ivf_fit` for a trained index; without them, seeded
    unit random centroids (the cheap untrained fallback). Returns
    (emb + centroid_id, centroids). Assignment is a narrow map-side
    projection — no shuffle of emb.
    """
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        n_centroids = len(cents)
    else:
        rng = np.random.default_rng(seed)
        cents = rng.standard_normal((n_centroids, dim))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    v = _as_double(F.col(vec_col))
    nrm = _norm(v)
    scores = [
        (_dot(v, F.array(*[F.lit(float(x)) for x in cents[c]])) / nrm).alias(f"c{c}")
        for c in range(n_centroids)
    ]
    with_scores = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col), *scores)
    arr = F.array(*[F.col(f"c{c}") for c in range(n_centroids)])
    # argmax fully map-side: array_position of the max (first match ⇒
    # lowest centroid_id wins ties — same tie-break as the keep-best
    # window this replaces, minus that window's n_centroids× row
    # explode + full shuffle; assignment stays a narrow projection
    assigned = with_scores.select(
        "vec_id",
        vec_col,
        (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias("centroid_id"),
    )
    return assigned, cents


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Search only the n_probe nearest centroid buckets (partition
    pruning at scale). Recall < 1.0 by design; exactness is the
    brute-force baseline's job."""
    q = np.asarray(query_vec, dtype=np.float64)
    sims = centroids @ (q / np.linalg.norm(q))
    probe = np.argsort(-sims)[:n_probe].tolist()
    subset = assigned.filter(F.col("centroid_id").isin(probe))
    return cosine_topk(subset, list(q), k=k, vec_col=vec_col)
