"""Scorer-level tests: block-max pruning is exact AND actually prunes;
snippet spec; dedup keep-best semantics."""

import math

import numpy as np

from tlgs_spark import bm25
from tlgs_spark.query.scorer import TermData, search_and, search_or, tf_norm_vec
from tlgs_spark.query.snippet import make_snippet


def _mk_term(term, doc_ids, tfs, dls, avgdl, block=bm25.BLOCK_SIZE):
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    w = tf_norm_vec(tfs, np.asarray(dls, dtype=np.float64), avgdl)
    n = len(doc_ids)
    nb = (n + block - 1) // block
    bmax, bsz = [], []
    for b in range(nb):
        s, e = b * block, min((b + 1) * block, n)
        bmax.append(w[s:e].max())
        bsz.append(e - s)
    return TermData(term, n, doc_ids, tfs, np.array(bmax), np.array(bsz, dtype=np.int64))


def _rand_index(rng, n_docs=5000, n_terms=6):
    dl_of = rng.integers(20, 300, n_docs).astype(np.int64)
    avgdl = float(dl_of.mean())
    terms = []
    for t in range(n_terms):
        df = int(rng.integers(50, n_docs // 2))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 12, df).astype(np.int64)
        terms.append(_mk_term(f"t{t}", ids, tfs, dl_of[ids], avgdl))
    return terms, dl_of, avgdl, n_docs


def _exhaustive_or(terms, dl_of, n_docs, avgdl, k):
    scores = {}
    for td in terms:
        w_idf = math.log(1.0 + (n_docs - td.df_global + 0.5) / (td.df_global + 0.5))
        tfn = tf_norm_vec(td.tfs, dl_of[td.doc_ids].astype(np.float64), avgdl)
        for d, s in zip(td.doc_ids.tolist(), (w_idf * tfn).tolist()):
            scores[d] = scores.get(d, 0.0) + s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [d for d, _ in ranked]


def test_blockmax_or_equals_exhaustive():
    rng = np.random.default_rng(7)
    for trial in range(5):
        terms, dl_of, avgdl, n_docs = _rand_index(rng)
        ids, scores, stats = search_or(
            terms, dl_of, n_docs, avgdl, k=25, return_stats=True
        )
        exp = _exhaustive_or(terms, dl_of, n_docs, avgdl, 25)
        assert ids.tolist() == exp, f"trial {trial}"
        assert (np.diff(scores) <= 1e-15).all()  # non-increasing


def test_blockmax_actually_prunes():
    """With a rare high-idf term present, most of the union must be
    skipped (the point of block-max WAND)."""
    rng = np.random.default_rng(3)
    n_docs = 20000
    dl_of = rng.integers(50, 200, n_docs).astype(np.int64)
    avgdl = float(dl_of.mean())
    rare_ids = np.sort(rng.choice(n_docs, 40, replace=False)).astype(np.int64)
    hot_ids = np.sort(rng.choice(n_docs, 15000, replace=False)).astype(np.int64)
    terms = [
        _mk_term("rare", rare_ids, rng.integers(3, 9, 40), dl_of[rare_ids], avgdl),
        _mk_term("hot", hot_ids, rng.integers(1, 3, 15000), dl_of[hot_ids], avgdl),
    ]
    ids, scores, stats = search_or(terms, dl_of, n_docs, avgdl, k=10, return_stats=True)
    assert stats["pruned_frac"] > 0.5, stats
    exp = _exhaustive_or(terms, dl_of, n_docs, avgdl, 10)
    assert ids.tolist() == exp


def test_blockmax_or_sparse_id_space_equals_exhaustive():
    """Huge id space relative to postings forces the sparse (unique)
    upper-bound branch — the per-shard distributed regime where a dense
    O(n_docs) accumulator must never be allocated."""
    rng = np.random.default_rng(11)
    n_docs = 2_000_000  # > 1<<20 and >> 4 × total postings
    dl_of = rng.integers(20, 300, n_docs).astype(np.int64)
    avgdl = float(dl_of.mean())
    terms = []
    for t in range(4):
        df = int(rng.integers(200, 2000))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 12, df).astype(np.int64)
        terms.append(_mk_term(f"t{t}", ids, tfs, dl_of[ids], avgdl))
    ids, scores = search_or(terms, dl_of, n_docs, avgdl, k=25)
    assert ids.tolist() == _exhaustive_or(terms, dl_of, n_docs, avgdl, 25)


def test_seed_subset_theta_exact_on_hot_terms():
    """Every term hotter than the seed cap ⇒ θ comes from the capped
    high-tf subset; results must still match exhaustive scoring."""
    rng = np.random.default_rng(13)
    n_docs = 60_000
    dl_of = rng.integers(20, 300, n_docs).astype(np.int64)
    avgdl = float(dl_of.mean())
    terms = []
    for t in range(3):
        df = 30_000 + int(rng.integers(0, 10_000))  # all > seed cap 4096
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 12, df).astype(np.int64)
        terms.append(_mk_term(f"h{t}", ids, tfs, dl_of[ids], avgdl))
    ids, scores = search_or(terms, dl_of, n_docs, avgdl, k=10)
    assert ids.tolist() == _exhaustive_or(terms, dl_of, n_docs, avgdl, 10)


def _exhaustive_and(terms, dl_of, n_docs, avgdl, k):
    """Brute-force conjunctive reference: same float64 op order as the
    engine (per-term idf·tfn accumulated in query-term order)."""
    cand = set(terms[0].doc_ids.tolist())
    for td in terms[1:]:
        cand &= set(td.doc_ids.tolist())
    scores = {d: 0.0 for d in cand}
    for td in terms:
        w_idf = math.log(1.0 + (n_docs - td.df_global + 0.5) / (td.df_global + 0.5))
        tfn = tf_norm_vec(td.tfs, dl_of[td.doc_ids].astype(np.float64), avgdl)
        for d, s in zip(td.doc_ids.tolist(), (w_idf * tfn).tolist()):
            if d in scores:
                scores[d] += s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [d for d, _ in ranked], [s for _, s in ranked]


def test_and_blockmax_pruning_equals_exhaustive():
    """Hot-AND-hot: the intersection exceeds the pruning threshold
    (4·seed_cap = 16384), so the block-max bound + θ-seed branch runs —
    doc_ids AND float64 scores must match brute force exactly."""
    rng = np.random.default_rng(17)
    n_docs = 60_000
    dl_of = rng.integers(20, 300, n_docs).astype(np.int64)
    avgdl = float(dl_of.mean())
    terms = []
    for t in range(2):
        df = 45_000 + int(rng.integers(0, 5_000))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 12, df).astype(np.int64)
        terms.append(_mk_term(f"h{t}", ids, tfs, dl_of[ids], avgdl))
    # sanity: the branch actually triggers
    inter = np.intersect1d(terms[0].doc_ids, terms[1].doc_ids)
    assert inter.size > 4 * 4096
    ids, scores = search_and(terms, dl_of, n_docs, avgdl, k=10)
    exp_ids, exp_scores = _exhaustive_and(terms, dl_of, n_docs, avgdl, 10)
    assert ids.tolist() == exp_ids
    assert scores.tolist() == exp_scores  # bit-exact float64


def test_and_three_hot_terms_pruned_equals_exhaustive():
    rng = np.random.default_rng(23)
    n_docs = 50_000
    dl_of = rng.integers(20, 300, n_docs).astype(np.int64)
    avgdl = float(dl_of.mean())
    terms = []
    for t in range(3):
        df = 40_000 + int(rng.integers(0, 5_000))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, df).astype(np.int64)
        terms.append(_mk_term(f"h{t}", ids, tfs, dl_of[ids], avgdl))
    ids, scores = search_and(terms, dl_of, n_docs, avgdl, k=25)
    exp_ids, exp_scores = _exhaustive_and(terms, dl_of, n_docs, avgdl, 25)
    assert ids.tolist() == exp_ids
    assert scores.tolist() == exp_scores


def test_and_is_intersection():
    dl_of = np.full(100, 10, dtype=np.int64)
    a = _mk_term("a", [1, 2, 3, 50], [1, 1, 1, 1], [10] * 4, 10.0)
    b = _mk_term("b", [2, 3, 99], [1, 1, 1], [10] * 3, 10.0)
    ids, _ = search_and([a, b], dl_of, 100, 10.0, k=10)
    assert ids.tolist() == [2, 3]


def test_and_empty_term_short_circuits():
    dl_of = np.full(10, 5, dtype=np.int64)
    a = _mk_term("a", [1], [1], [5], 5.0)
    empty = TermData("e", 0, np.zeros(0, np.int64), np.zeros(0, np.int64),
                     np.zeros(0, np.float64), np.zeros(0, np.int64))
    ids, _ = search_and([a, empty], dl_of, 10, 5.0, k=5)
    assert ids.size == 0


def test_tie_break_by_doc_id():
    # identical docs → identical scores → ascending doc_id order
    dl_of = np.full(10, 3, dtype=np.int64)
    t = _mk_term("t", [4, 7, 9], [2, 2, 2], [3, 3, 3], 3.0)
    ids, scores = search_and([t], dl_of, 10, 3.0, k=3)
    assert ids.tolist() == [4, 7, 9]
    assert scores[0] == scores[1] == scores[2]


def test_snippet_highlight_and_window():
    words = [f"w{i}" for i in range(100)]
    words[50] = "needle"
    text = " ".join(words)
    snip = make_snippet(text, ["needle"])
    assert "[needle]" in snip
    n_words = len(snip.split(" "))
    assert 23 <= n_words <= 37


def test_snippet_no_match_leads_with_head():
    text = " ".join(f"w{i}" for i in range(100))
    snip = make_snippet(text, ["zzz"])
    assert snip.startswith("w0 w1")
    assert len(snip.split(" ")) == 23


def test_snippet_respects_5k_window():
    # match beyond the first 5000 chars is NOT highlighted (search.cpp:773-779)
    text = ("x " * 3000) + "needle"
    snip = make_snippet(text, ["needle"])
    assert "[needle]" not in snip


def test_snippet_sanitizes():
    snip = make_snippet("```\n# needle\tmore words here\n```", ["needle"])
    assert "\n" not in snip and "`" not in snip and "\t" not in snip


def test_sanitize_reference_parity():
    """sanitizeGemini quirks pinned (search.cpp:61-69): only the
    literal ``` fence is replaced (single backticks survive), and an
    all-marker string comes back unchanged instead of empty."""
    from tlgs_spark.query.snippet import sanitize

    assert sanitize("see `config.toml` for details") == "see `config.toml` for details"
    assert sanitize("#=>`*") == "#=>`*"
    assert sanitize("# needle more") == "needle more"


def test_single_term_fast_path_bit_identical():
    """The single-term fast path must match exhaustive scoring exactly
    (doc order AND float bits) — it bypasses all pruning phases."""
    rng = np.random.default_rng(11)
    for trial in range(3):
        terms, dl_of, avgdl, n_docs = _rand_index(rng, n_terms=1)
        ids, scores = search_or(terms, dl_of, n_docs, avgdl, k=25)
        exp = _exhaustive_or(terms, dl_of, n_docs, avgdl, 25)
        assert ids.tolist() == exp, f"trial {trial}"
        td = terms[0]
        w = math.log(1.0 + (n_docs - td.df_global + 0.5) / (td.df_global + 0.5))
        full = w * tf_norm_vec(td.tfs, dl_of[td.doc_ids].astype(np.float64), avgdl)
        by_doc = dict(zip(td.doc_ids.tolist(), full.tolist()))
        assert scores.tolist() == [by_doc[d] for d in ids.tolist()]  # bit-exact
        # AND with one term routes through the same path
        ids_a, scores_a = search_and(terms, dl_of, n_docs, avgdl, k=25)
        assert ids_a.tolist() == ids.tolist() and scores_a.tolist() == scores.tolist()


def test_flat_bounds_skip_exact():
    """Uniform tf + uniform dl ⇒ every block max identical ⇒ both the
    OR refinement skip and the AND whole-block skip trigger; results
    must still equal exhaustive scoring."""
    n_docs = 40_000
    dl_of = np.full(n_docs, 100, dtype=np.int64)
    avgdl = 100.0
    rng = np.random.default_rng(5)
    terms = []
    for t in range(2):
        ids = np.sort(rng.choice(n_docs, size=30_000, replace=False)).astype(np.int64)
        terms.append(_mk_term(f"t{t}", ids, np.ones(len(ids), np.int64), dl_of[ids], avgdl))
    assert all(float(td.block_max.max()) == float(td.block_max.min()) for td in terms)
    ids, scores = search_or(terms, dl_of, n_docs, avgdl, k=10)
    assert ids.tolist() == _exhaustive_or(terms, dl_of, n_docs, avgdl, 10)
    ids_a, _ = search_and(terms, dl_of, n_docs, avgdl, k=10)
    inter = np.intersect1d(terms[0].doc_ids, terms[1].doc_ids)
    # uniform scores ⇒ AND top-k = k smallest doc_ids of the intersection
    assert ids_a.tolist() == sorted(inter.tolist())[:10]


def test_sampled_seed_branch_exact_and_large_k():
    """>2^20-posting terms exercise the stride-sampled seed pool; k (and
    the derived per_term/seed_cap) larger than the pool must not crash
    (regression: np.argpartition kth out of bounds) and stays exact."""
    n_docs = 1 << 21  # 2M
    rng = np.random.default_rng(3)
    dl_of = rng.integers(50, 150, n_docs).astype(np.int64)
    avgdl = float(dl_of.mean())
    terms = []
    for t in range(2):
        df = (1 << 20) + 50_000  # > seed pool
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 5, df).astype(np.int64)
        terms.append(_mk_term(f"t{t}", ids, tfs, dl_of[ids], avgdl))
    # small k: exactness through the sampled branch
    ids10, s10 = search_or(terms, dl_of, n_docs, avgdl, k=10)
    union = np.unique(np.concatenate([td.doc_ids for td in terms]))
    from tlgs_spark.query.scorer import _exact_scores
    full = _exact_scores(union, terms, dl_of, n_docs, avgdl)
    order = np.lexsort((union, -full))[:10]
    assert ids10.tolist() == union[order].tolist()
    assert np.array_equal(s10, full[order])
    # huge k (> pool): no crash, still exact vs exhaustive on both modes
    k_big = (1 << 20) + 10_000
    ids_or, _ = search_or(terms, dl_of, n_docs, avgdl, k=k_big)
    assert ids_or.size == min(k_big, union.size)
    order_big = np.lexsort((union, -full))[:k_big]
    assert ids_or.tolist() == union[order_big].tolist()
    ids_and, _ = search_and(terms, dl_of, n_docs, avgdl, k=k_big)
    inter = np.intersect1d(terms[0].doc_ids, terms[1].doc_ids)
    fi = _exact_scores(inter, terms, dl_of, n_docs, avgdl)
    oi = np.lexsort((inter, -fi))[:k_big]
    assert ids_and.tolist() == inter[oi].tolist()
