"""Pure-Python single-node reference engine ("the oracle").

The reference repo has no end-to-end search tests (SURVEY §5); this
oracle is the correctness contract the Spark engine must match
rank-identically (doc_ids AND scores) on every query in the reference
query set. It uses the frozen tokenizer spec and the pinned BM25 math —
nothing else.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import bm25
from .tokenizer import term_freqs, tokenize_query


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    doc_lengths: dict[int, int] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc_id: tf}

    @property
    def total_terms(self) -> int:
        return len(self.postings)


def build_index(docs: list[tuple[int, str]], hygiene: bool = False) -> OracleIndex:
    """docs = [(doc_id, text)] with doc_ids unique (any order)."""
    idx = OracleIndex()
    total_dl = 0
    for doc_id, text in docs:
        tfs = term_freqs(text, hygiene=hygiene)
        dl = sum(tfs.values())
        idx.doc_lengths[doc_id] = dl
        total_dl += dl
        for term, tf in tfs.items():
            idx.postings.setdefault(term, {})[doc_id] = tf
    idx.n_docs = len(docs)
    idx.avgdl = (total_dl / idx.n_docs) if idx.n_docs else 0.0
    return idx


def search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "and",
    allowed_docs: set[int] | None = None,
) -> list[tuple[int, float]]:
    """Top-k BM25. mode='and' = conjunctive (plainto_tsquery semantics,
    search.cpp:441); mode='or' = disjunctive. Tie-break (-score, doc_id).
    Scores are summed in query-term order (pinned float64 op order).
    """
    terms = tokenize_query(query)
    if not terms:
        return []
    plists = []
    for t in terms:
        p = idx.postings.get(t)
        if p is None:
            if mode == "and":
                return []
            continue
        plists.append((t, p))
    if not plists:
        return []

    if mode == "and":
        cand = set(plists[0][1].keys())
        for _, p in plists[1:]:
            cand &= p.keys()
    else:
        cand = set()
        for _, p in plists:
            cand |= p.keys()
    if allowed_docs is not None:
        cand &= allowed_docs

    scores: dict[int, float] = {d: 0.0 for d in cand}
    for t, p in plists:
        w_idf = bm25.idf(idx.n_docs, len(p))
        for d in cand:
            tf = p.get(d)
            if tf:
                scores[d] += w_idf * bm25.tf_norm(tf, idx.doc_lengths[d], idx.avgdl)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


FIELD_TITLE_TOKENS = 5


def title_text(text: str) -> str:
    """The transcript 'title' field: first 5 [a-z0-9]+ tokens of the
    lowercased text (the page-heading analog — reference titles are the
    first heading1, crawler.cpp:443,452)."""
    import re

    return " ".join(re.findall(r"[a-z0-9]+", (text or "").lower())[:FIELD_TITLE_TOKENS])


def search_fielded(
    idx_body: OracleIndex,
    idx_title: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "and",
    title_weight: float = 50.0,
) -> list[tuple[int, float]]:
    """Field-weighted top-k: candidates come from the BODY match alone
    (the reference's WHERE uses search_vector only, search.cpp:441) and
    the score is body + w·title (ts_rank(title)*50 + ts_rank(body),
    search.cpp:438-442). Op order pinned to the engine: each field's
    per-doc sum accumulates in query-term order; the title sum is
    weighted ONCE, then added to the body sum."""
    terms = tokenize_query(query)
    if not terms:
        return []
    plists = []
    for t in terms:
        p = idx_body.postings.get(t)
        if p is None:
            if mode == "and":
                return []
            continue
        plists.append((t, p))
    if not plists:
        return []
    if mode == "and":
        cand = set(plists[0][1].keys())
        for _, p in plists[1:]:
            cand &= p.keys()
    else:
        cand = set()
        for _, p in plists:
            cand |= p.keys()

    body: dict[int, float] = {d: 0.0 for d in cand}
    for t, p in plists:
        w_idf = bm25.idf(idx_body.n_docs, len(p))
        for d in cand:
            tf = p.get(d)
            if tf:
                body[d] += w_idf * bm25.tf_norm(tf, idx_body.doc_lengths[d], idx_body.avgdl)
    title: dict[int, float] = {d: 0.0 for d in cand}
    for t in terms:
        p = idx_title.postings.get(t)
        if not p:
            continue
        w_idf = bm25.idf(idx_title.n_docs, len(p))
        for d in cand:
            tf = p.get(d)
            if tf:
                title[d] += w_idf * bm25.tf_norm(
                    tf, idx_title.doc_lengths[d], idx_title.avgdl
                )
    scores = {d: body[d] + title_weight * title[d] for d in cand}
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
