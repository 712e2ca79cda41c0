"""Shared deterministic specs for the paired entry queries.

Every constant or fitted-literal generator here feeds BOTH renderings
of an entry — the Spark DataFrame plan in ``entry_queries`` and its
DuckDB oracle twin in ``oracle_sql`` — so the two sides cannot drift
apart. Nothing in this module touches Spark; it is plain
Python/NumPy/pyarrow producing values both engines embed as literals.
"""

from __future__ import annotations

# BM25 query-term sets (stemmed/deduped downstream by each renderer).
AND_TERMS = ["spark", "stream", "window"]
OR_TERMS = ["vector", "dup", "customer"]

# Synthetic URL cases for url_blacklist / robots_rules — rendered once
# as SQL CASE (oracle side) and once as a Column (Spark side).
SYNTH_HOSTS = ["git.example.org", "127.0.0.9", "capsule.onion", "good.example",
               "other.example"]
SYNTH_PATHS = ["/git/repo", "/orbit/next", "/cgi/cgi/cgi/x", "/commits/abc123/diff",
               "/posts/2024/hello.gmi", "/robots.txt", "/blog/entry"]

# snippet_preview highlight terms (stemmed once by each renderer).
SNIPPET_TERMS = ("spark", "data", "window")

# IVF-ANN configuration shared by ivf entry + its SQL generator.
IVF_N_CENTROIDS, IVF_ITERS, IVF_N_PROBE = 8, 8, 3

_IVF_CENT_CACHE: dict[str, object] = {}


def ivf_centroids(sf_dir: str):
    """Deterministic IVF training for the oracle pairing: read the
    embeddings table directly (pyarrow, vec_id-sorted, first ≤50k —
    partitioning-independent, unlike a Spark seeded sample), run the
    shared spherical-k-means kernel, round to 6 dp so the SAME double
    literals feed the Spark expressions and the DuckDB SQL."""
    import numpy as np
    import pyarrow.parquet as pq

    hit = _IVF_CENT_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    from .ops.similarity import ivf_fit_np

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = tbl["vec_id"].to_numpy()
    order = np.argsort(vec_ids)[:50_000]
    # zero-copy-ish: the list column's values buffer reshapes straight
    # into the (n, dim) float64 matrix — the old to_pylist() round-trip
    # built 20k Python lists to immediately re-convert them (~1 s of
    # the entry's first touch); same float64 values bit-for-bit
    lv = tbl["embedding"].combine_chunks()
    flat = lv.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(vec_ids), -1)
    x = mat[order]
    cents = np.round(
        ivf_fit_np(x, n_centroids=IVF_N_CENTROIDS, iters=IVF_ITERS, seed=42), 6
    )
    q_idx = np.nonzero(vec_ids == 0)[0]
    if q_idx.size == 0:
        raise ValueError(f"no vec_id==0 query row in {sf_dir}/embeddings.parquet")
    q_row = mat[int(q_idx[0])]
    out = (cents, q_row)
    _IVF_CENT_CACHE[sf_dir] = out
    return out


def ivf_probes(cents, qv) -> list[int]:
    """Mirror of ivf_search's probe selection (argsort desc, first
    n_probe) — shared by the entry and the SQL generator."""
    import numpy as np

    q = np.asarray(qv, dtype=np.float64)
    sims = cents @ (q / np.linalg.norm(q))
    return [int(i) for i in np.argsort(-sims)[:IVF_N_PROBE]]


def lsh_planes():
    """16 deterministic hyperplanes over the 64-dim embedding space,
    rounded to 6 dp so the SAME literals appear in the Spark
    expressions and the DuckDB SQL (seeded PCG64 — identical in every
    process)."""
    import numpy as np

    return np.round(np.random.default_rng(7).standard_normal((16, 64)), 6)
