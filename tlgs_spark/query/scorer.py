"""NumPy BM25 scorer: conjunctive (AND) retrieval and disjunctive (OR)
top-k with block-max pruning.

Semantics parity:
- AND mode = ``search_vector @@ plainto_tsquery`` (implicit AND of all
  query terms, tlgs/server/controllers/search.cpp:441).
- OR mode = classic top-k BM25 with **block-max WAND-style pruning**
  (north rule): a two-phase, fully vectorized document-at-a-time form —
  (1) seed a top-k threshold θ by exactly scoring the rarest term's
  postings; (2) bound every candidate doc by Σ_t idf_t ·
  blockmax_t(block(doc)) and exactly score only docs whose bound ≥ θ.
  Exact same results as exhaustive scoring (asserted in tests), with
  the block-max structures doing the pruning.

Float64 op order is pinned to match the pure-Python oracle: per-doc
score accumulates term contributions in query-term order; idf uses
``math.log`` (scalar), tf-norm is +,-,*,/ only (IEEE-exact), so engine
scores are bit-identical to oracle scores.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .. import bm25


@dataclass
class TermData:
    """One query term's postings, concatenated across shards in shard
    order (⇒ doc_ids globally sorted)."""

    term: str
    df_global: int
    doc_ids: np.ndarray  # int64, sorted
    tfs: np.ndarray  # int64
    block_max: np.ndarray  # float64 admissible ub of tf_norm per block
    block_sizes: np.ndarray  # int64 postings per block (sum == len(doc_ids))


def tf_norm_vec(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    t = tfs.astype(np.float64)
    d = dls.astype(np.float64)
    return t * (bm25.K1 + 1.0) / (t + bm25.K1 * (1.0 - bm25.B + bm25.B * d / avgdl))


def _exact_scores(
    cand: np.ndarray, terms: list[TermData], dl_of: np.ndarray, n_docs: int, avgdl: float
) -> np.ndarray:
    """Score candidate docs exactly; accumulation in query-term order."""
    scores = np.zeros(cand.shape[0], dtype=np.float64)
    dls = dl_of[cand]
    for td in terms:
        pos = np.searchsorted(td.doc_ids, cand)
        pos_c = np.minimum(pos, len(td.doc_ids) - 1) if len(td.doc_ids) else pos
        hit = (
            (pos < len(td.doc_ids)) & (td.doc_ids[pos_c] == cand)
            if len(td.doc_ids)
            else np.zeros(cand.shape, dtype=bool)
        )
        if not hit.any():
            continue
        w_idf = math.log(1.0 + (n_docs - td.df_global + 0.5) / (td.df_global + 0.5))
        tfn = tf_norm_vec(td.tfs[pos_c[hit]], dls[hit], avgdl)
        scores[hit] += w_idf * tfn
    return scores


def _topk_order(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


def search_and(
    terms: list[TermData], dl_of: np.ndarray, n_docs: int, avgdl: float, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive retrieval: intersect postings (rarest first), score
    survivors, top-k by (-score, doc_id)."""
    if not terms or any(td.doc_ids.size == 0 for td in terms):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    by_df = sorted(terms, key=lambda t: t.doc_ids.size)
    cand = by_df[0].doc_ids
    for td in by_df[1:]:
        cand = cand[np.isin(cand, td.doc_ids, assume_unique=True)]
        if cand.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float64)
    scores = _exact_scores(cand, terms, dl_of, n_docs, avgdl)
    return _topk_order(cand, scores, k)


def search_or(
    terms: list[TermData],
    dl_of: np.ndarray,
    n_docs: int,
    avgdl: float,
    k: int,
    return_stats: bool = False,
):
    """Disjunctive top-k with block-max pruning (see module docstring)."""
    terms = [td for td in terms if td.doc_ids.size > 0]
    if not terms:
        out = (np.zeros(0, np.int64), np.zeros(0, np.float64))
        return (*out, {}) if return_stats else out

    # phase 0: θ from exactly scoring the rarest term's docs
    rare = min(terms, key=lambda t: t.doc_ids.size)
    seed_scores = _exact_scores(rare.doc_ids, terms, dl_of, n_docs, avgdl)
    if seed_scores.size >= k:
        theta = np.partition(seed_scores, -k)[-k]
    else:
        theta = -np.inf

    # phase 1: per-doc upper bounds from block maxes
    all_docs = []
    all_ubs = []
    for td in terms:
        w_idf = math.log(1.0 + (n_docs - td.df_global + 0.5) / (td.df_global + 0.5))
        ub_per_posting = np.repeat(td.block_max * w_idf, td.block_sizes)
        all_docs.append(td.doc_ids)
        all_ubs.append(ub_per_posting)
    docs_cat = np.concatenate(all_docs)
    ubs_cat = np.concatenate(all_ubs)
    uniq, inv = np.unique(docs_cat, return_inverse=True)
    ub_doc = np.bincount(inv, weights=ubs_cat)
    survivors = uniq[ub_doc >= theta]

    # phase 2: exact-score survivors only
    scores = _exact_scores(survivors, terms, dl_of, n_docs, avgdl)
    out = _topk_order(survivors, scores, k)
    if return_stats:
        stats = {
            "n_union": int(uniq.size),
            "n_scored": int(survivors.size + rare.doc_ids.size),
            "pruned_frac": 1.0 - survivors.size / max(1, uniq.size),
        }
        return (*out, stats)
    return out
