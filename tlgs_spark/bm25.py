"""BM25 scoring math — the single source of truth.

The reference scores with PostgreSQL ``ts_rank_cd`` but its author left
"XXX: Really want to use BM25 as text score" (search.cpp:542-543); the
north rule adopts BM25. Parameters and float64 op order are pinned here
and mirrored exactly by the pure-Python oracle, the NumPy/WAND scorer,
the Spark column expressions, and the DuckDB oracle SQL — rank identity
requires all four to agree.

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))      [Lucene form, >= 0]
    tfn(tf, dl)   = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(q, d)   = sum over t in q of idf(t) * tfn(tf_td, dl_d)
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128  # postings per block-max block


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def score_term(tf: float, dl: float, n_docs: int, df: int, avgdl: float) -> float:
    return idf(n_docs, df) * tf_norm(tf, dl, avgdl)


# --- SQL renderings (DuckDB oracle parity; same expression shape) ---------

def idf_sql(n: str = "n_docs", df: str = "df") -> str:
    return f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"


def tf_norm_sql(tf: str = "tf", dl: str = "dl", avgdl: str = "avgdl") -> str:
    return f"({tf} * ({K1} + 1.0) / ({tf} + {K1} * (1.0 - {B} + {B} * {dl} / {avgdl})))"


def score_sql(tf: str = "tf", dl: str = "dl", n: str = "n_docs", df: str = "df", avgdl: str = "avgdl") -> str:
    return f"({idf_sql(n, df)} * {tf_norm_sql(tf, dl, avgdl)})"
