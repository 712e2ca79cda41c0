"""Score combination + result dedup — the post-retrieval stages of the
reference's search pipeline.

combine_scores (search.cpp:539-553):
    boost   = exp(6.5 * link_score / max(link_score))
    penalty = if size > 48000: 1 / ln(e + (size - 48000) / 3000) else 1
    text'   = text_rank * penalty
    final   = 2 * boost * text' / (boost + text')        [harmonic mean]
with denormal flush (|x| < FLT_MIN → 0, search.cpp:297-301).

dedup_results (search.cpp:555-625): group by content hash, keep the
max-score row (tie → lowest doc_id). The reference's URL-equivalence
merge rules degenerate to exact-hash dedup for transcripts (SURVEY W4).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

FLT_MIN = 1.17549435e-38
SIZE_PENALTY_THRESHOLD = 48000
SIZE_PENALTY_SCALE = 3000.0
BOOST_FACTOR = 6.5


def _flush(x: np.ndarray) -> np.ndarray:
    out = x.copy()
    out[np.abs(out) < FLT_MIN] = 0.0
    return out


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
    mx = link.max() if link.size and link.max() > 0 else 1.0  # A7 max-score
    boost = np.exp(BOOST_FACTOR * _flush(link) / mx)
    text = results[text_col].to_numpy(np.float64).copy()
    size = results[size_col].to_numpy(np.float64)
    big = size > SIZE_PENALTY_THRESHOLD
    text[big] = text[big] / np.log(
        math.e + (size[big] - SIZE_PENALTY_THRESHOLD) / SIZE_PENALTY_SCALE
    )
    denom = boost + text
    final = np.where(denom > 0, 2.0 * boost * text / denom, 0.0)
    out = results.copy()
    out["boost"] = boost
    out["final"] = _flush(final)
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
