"""Score combination + result dedup — the post-retrieval stages of the
reference's search pipeline.

combine_scores (search.cpp:536-553):
    mx      = max over the WHOLE graph's link-score vector (not just
              the rows being reranked — search.cpp:538-541; 0 → 1)
    boost   = exp(6.5 * link_score / mx)
    penalty = if size > 48000: 1 / ln(e + (size - 48000) // 3000)
              — the reference divides in size_t, so the penalty is a
              3 kB step function and sizes 48001..50999 see ln(e+0)=1
    text'   = text_rank * penalty
    final   = 2 * boost * text' / (boost + text')        [harmonic mean]
No denormal flush here — that lives in the HITS loop
(search.cpp:297-301), not the combine stage. The reference computes
boost/rank in float32; we keep float64 (documented divergence: the
declarative engine has no stable accumulation order to mirror).

dedup_results (search.cpp:555-625): group by content hash, keep the
max-score row (tie → lowest doc_id). The reference's URL-equivalence
merge rules degenerate to exact-hash dedup for transcripts (SURVEY W4).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

SIZE_PENALTY_THRESHOLD = 48000
SIZE_PENALTY_SCALE = 3000.0
BOOST_FACTOR = 6.5


def combine_scores(
    results: pd.DataFrame,
    link_scores: dict[int, float],
    text_col: str = "score",
    size_col: str = "size",
) -> pd.DataFrame:
    """results: (doc_id, score, size, ...) → adds boost/final columns,
    re-sorts by (-final, doc_id)."""
    if len(results) == 0:
        out = results.copy()
        out["final"] = pd.Series(dtype="float64")
        return out
    link = np.array([link_scores.get(int(d), 0.0) for d in results["doc_id"]])
    # normalizer = max over the FULL graph score vector, including
    # base-set nodes that never made the result frame (search.cpp:538:
    # max_element over `score`, not over the reranked rows); 0 → 1
    all_scores = list(link_scores.values())
    mx = max(all_scores) if all_scores and max(all_scores) > 0 else 1.0
    boost = np.exp(BOOST_FACTOR * link / mx)
    text = results[text_col].to_numpy(np.float64).copy()
    size = results[size_col].to_numpy(np.int64)
    big = size > SIZE_PENALTY_THRESHOLD
    # size_t division in the reference: (size - 48000)/3000 floors to a
    # 3 kB step before entering the log (search.cpp:551)
    text[big] = text[big] / np.log(
        math.e + (size[big] - SIZE_PENALTY_THRESHOLD) // int(SIZE_PENALTY_SCALE)
    )
    denom = boost + text
    final = np.where(denom > 0, 2.0 * boost * text / denom, 0.0)
    out = results.copy()
    out["boost"] = boost
    out["final"] = final
    return out.sort_values(["final", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )


def dedup_results(results: pd.DataFrame, hash_col: str = "text_hash",
                  score_col: str = "score") -> pd.DataFrame:
    """Keep-best per content hash (stable: max score, then min doc_id)."""
    if len(results) == 0:
        return results
    srt = results.sort_values([score_col, "doc_id"], ascending=[False, True])
    return srt.drop_duplicates(subset=[hash_col], keep="first").sort_values(
        [score_col, "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
