"""HITS / SALSA DataFrame implementations vs literal transliterations
of the reference loops (search.cpp:253-306, 316-412) on small
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


def _adj(edges):
    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    in_nb = [[] for _ in nodes]
    out_nb = [[] for _ in nodes]
    for s, d in edges:
        out_nb[idx[s]].append(idx[d])
        in_nb[idx[d]].append(idx[s])
    return nodes, in_nb, out_nb


def _ref_hits(edges, eps, max_iter):
    """Line-for-line hitsRank (search.cpp:253-306): Jacobi updates,
    keep-old on a zero calc sum, max(sum,1) normalization, float-eps
    flush after the delta."""
    nodes, in_nb, out_nb = _adj(edges)
    n = len(nodes)
    flt_eps = float(np.finfo(np.float32).eps)
    auth = [1.0 / n] * n
    hub = [1.0 / n] * n
    delta, it = 9.0, 0
    while it < max_iter and delta > eps:
        na, nh = list(auth), list(hub)
        for i in range(n):
            ca = sum(hub[j] for j in in_nb[i])
            ch = sum(auth[j] for j in out_nb[i])
            if ca != 0:
                na[i] = ca
            if ch != 0:
                nh[i] = ch
        asum, hsum = max(sum(na), 1.0), max(sum(nh), 1.0)
        delta = 0.0
        for i in range(n):
            delta += abs(auth[i] - na[i] / asum) + abs(hub[i] - nh[i] / hsum)
            auth[i] = na[i] / asum
            hub[i] = nh[i] / hsum
            if auth[i] < flt_eps:
                auth[i] = 0.0
            if hub[i] < flt_eps:
                hub[i] = 0.0
        it += 1
    return {nd: (auth[i], hub[i]) for i, nd in enumerate(nodes)}


def _ref_salsa(edges, eps, max_iter):
    """Line-for-line salsaRank (search.cpp:316-412): side split on
    original degrees, same-side edges dropped, ONE combined score
    vector normalized by the PREVIOUS iteration's sum."""
    nodes, in_nb, out_nb = _adj(edges)
    n = len(nodes)
    is_auth = [len(in_nb[i]) > len(out_nb[i]) for i in range(n)]
    n_a, n_h = sum(is_auth), n - sum(is_auth)
    in_nb = [[j for j in in_nb[i] if is_auth[j] != is_auth[i]] for i in range(n)]
    out_nb = [[j for j in out_nb[i] if is_auth[j] != is_auth[i]] for i in range(n)]
    score = [1.0 / max(n_a, 1) if is_auth[i] else 1.0 / max(n_h, 1) for i in range(n)]
    delta, it = 9.0, 0
    while it < max_iter and delta > eps:
        new = [0.0] * n
        for i in range(n):
            if is_auth[i]:
                new[i] = sum(
                    sum(score[k] / max(len(in_nb[k]), 1) for k in out_nb[j])
                    / max(len(out_nb[j]), 1)
                    for j in in_nb[i]
                )
            else:
                new[i] = sum(
                    sum(score[k] / max(len(out_nb[k]), 1) for k in in_nb[j])
                    / max(len(in_nb[j]), 1)
                    for j in out_nb[i]
                )
        ssum = max(sum(score), 1.0)
        delta = sum(abs(new[i] / ssum - score[i]) for i in range(n))
        score = [new[i] / ssum for i in range(n)]
        it += 1
    return {
        nd: ("auth" if is_auth[i] else "hub", score[i]) for i, nd in enumerate(nodes)
    }


@pytest.mark.parametrize("threshold", [0, 10**6], ids=["distributed", "driver"])
def test_hits_matches_reference_loop(spark, edges_df, threshold):
    from tlgs_spark.graph import hits_rank

    edges = [(r.src, r.dst) for r in edges_df.collect()]
    exp = _ref_hits(edges, 0.0, 3)
    got = {
        r.node: (r.auth, r.hub)
        for r in hits_rank(edges_df, eps=0.0, max_iter=3, driver_threshold=threshold).collect()
    }
    assert set(got) == set(exp)
    for n in exp:
        assert got[n][0] == pytest.approx(exp[n][0], abs=1e-12), f"auth {n}"
        assert got[n][1] == pytest.approx(exp[n][1], abs=1e-12), f"hub {n}"


@pytest.mark.parametrize("threshold", [0, 10**6], ids=["distributed", "driver"])
def test_salsa_matches_reference_loop(spark, edges_df, threshold):
    from tlgs_spark.graph import salsa_rank

    edges = [(r.src, r.dst) for r in edges_df.collect()]
    exp = _ref_salsa(edges, 0.0, 4)
    got = {
        r.node: (r.side, r.score)
        for r in salsa_rank(edges_df, eps=0.0, max_iter=4, driver_threshold=threshold).collect()
    }
    assert set(got) == set(exp)
    for n in exp:
        assert got[n][0] == exp[n][0], f"side {n}"
        assert got[n][1] == pytest.approx(exp[n][1], abs=1e-12), f"score {n}"


def test_hits_keep_old_on_sources_and_sinks(spark):
    """A→B: B has no out-links, A no in-links — the reference KEEPS
    their previous hub/auth instead of zeroing (search.cpp:281-285),
    and normalizes by max(sum, 1.0) so sub-unit sums pass through."""
    from tlgs_spark.graph import hits_rank

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r.node: (r.auth, r.hub) for r in hits_rank(e, eps=0.0, max_iter=1).collect()}
    # init 1/2 each. calc_auth(1)=hub(0)=0.5 → new; calc_auth(0)=0 → keep 0.5
    # asum = max(1.0, 1) = 1 → auth stays (0.5, 0.5); hub symmetric
    assert got[0] == (0.5, 0.5) and got[1] == (0.5, 0.5)


def test_salsa_normalizes_by_previous_sum(spark):
    """First iteration: old sums are 1 (auth side) + 1 (hub side) = 2,
    so the combined vector is divided by 2, not per-side."""
    from tlgs_spark.graph import salsa_rank

    # A→C, B→C, C→A: C is auth (in 2 > out 1); A, B hubs
    e = spark.createDataFrame([(0, 2), (1, 2), (2, 0)], "src long, dst long")
    got = {r.node: r.score for r in salsa_rank(e, eps=0.0, max_iter=1).collect()}
    exp = _ref_salsa([(0, 2), (1, 2), (2, 0)], 0.0, 1)
    for n, sc in got.items():
        assert sc == pytest.approx(exp[n][1], abs=1e-15)
    # the combined vector sums to (new auth + new hub mass) / old sum 2
    assert got[2] == pytest.approx(1.0 / 2, abs=1e-15)


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
    # EVERY graph node is classified and scored (the reference keeps
    # all nodes in the vector), including bipartite-isolated ones
    assert len(rows) == 8


def test_salsa_all_same_side_graph(spark):
    from tlgs_spark.graph import salsa_rank

    # a pure cycle: every node has in==out → all hubs, no hub→auth
    # edges; every node still classifies and drops to score 0
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    rows = salsa_rank(edges, eps=0.0, max_iter=5).collect()
    assert len(rows) == 3
    assert all(r.side == "hub" and r.score == 0.0 for r in rows)
