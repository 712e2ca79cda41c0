"""HITS / SALSA DataFrame implementations vs NumPy mirrors on small
deterministic graphs."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def edges_df(spark):
    # two hubs (0,1) pointing at authorities (10,11,12); chain noise
    edges = [
        (0, 10), (0, 11), (0, 12),
        (1, 10), (1, 11),
        (2, 10),
        (3, 2), (4, 3),
    ]
    return spark.createDataFrame(edges, "src long, dst long")


def _numpy_hits(edges, n_iter):
    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    auth = np.ones(n) / n  # after initial L1 normalize (all-ones / n)
    hub = np.ones(n) / n
    for _ in range(n_iter):
        new_auth = np.zeros(n)
        for s, d in edges:
            new_auth[idx[d]] += hub[idx[s]]
        new_hub = np.zeros(n)
        for s, d in edges:
            new_hub[idx[s]] += new_auth[idx[d]]
        auth = new_auth / new_auth.sum() if new_auth.sum() else new_auth
        hub = new_hub / new_hub.sum() if new_hub.sum() else new_hub
    return {n_: (auth[idx[n_]], hub[idx[n_]]) for n_ in nodes}


@pytest.mark.parametrize("threshold", [0, 10**6], ids=["distributed", "driver"])
def test_hits_matches_numpy(spark, edges_df, threshold):
    from tlgs_spark.graph import hits_rank

    edges = [(r.src, r.dst) for r in edges_df.collect()]
    exp = _numpy_hits(edges, 3)
    got = {
        r.node: (r.auth, r.hub)
        for r in hits_rank(edges_df, eps=0.0, max_iter=3, driver_threshold=threshold).collect()
    }
    assert set(got) == set(exp)
    for n in exp:
        assert got[n][0] == pytest.approx(exp[n][0], abs=1e-12), f"auth {n}"
        assert got[n][1] == pytest.approx(exp[n][1], abs=1e-12), f"hub {n}"


def test_salsa_driver_matches_distributed(spark, edges_df):
    from tlgs_spark.graph import salsa_rank

    a = {(r.node, r.side): r.score
         for r in salsa_rank(edges_df, max_iter=10, driver_threshold=0).collect()}
    b = {(r.node, r.side): r.score
         for r in salsa_rank(edges_df, max_iter=10).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12), k


def test_hits_authorities_ranked_sensibly(spark, edges_df):
    from tlgs_spark.graph import hits_rank

    scores = {r.node: r.auth for r in hits_rank(edges_df, max_iter=30).collect()}
    # node 10 has in-links from both strong hubs + node 2 → top authority
    assert scores[10] == max(scores.values())
    assert scores[10] > scores[12] > 0


def test_hits_converges_before_max_iter(spark, edges_df):
    from tlgs_spark.graph import hits_rank

    a = {r.node: (r.auth, r.hub) for r in hits_rank(edges_df, eps=0.005, max_iter=300).collect()}
    b = {r.node: (r.auth, r.hub) for r in hits_rank(edges_df, eps=0.005, max_iter=301).collect()}
    for n in a:
        assert a[n][0] == pytest.approx(b[n][0], abs=1e-9)


def test_salsa_bipartite_sides(spark, edges_df):
    from tlgs_spark.graph import salsa_rank

    rows = salsa_rank(edges_df, max_iter=10).collect()
    side = {r.node: r.side for r in rows}
    # 10,11 have in>out → authorities; 0,1 out-only → hubs
    assert side[10] == "auth" and side[11] == "auth"
    assert side[0] == "hub" and side[1] == "hub"
    # per-side L1 normalization
    for s in ("auth", "hub"):
        tot = sum(r.score for r in rows if r.side == s)
        assert tot == pytest.approx(1.0, abs=1e-9)


def test_salsa_empty_bipartite_graph(spark):
    from tlgs_spark.graph import salsa_rank

    # a pure cycle: every node has in==out → all hubs, no hub→auth edges
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    rows = salsa_rank(edges, max_iter=5).collect()
    assert all(r.side == "hub" for r in rows) or rows == []
