"""Text-analysis operators for a training-data pipeline.

All of these are pure JVM-side column expressions (whole-stage
codegen'd, no Python in the data plane) except simhash, which is a
vectorized pandas UDF. Semantics are frozen so the DuckDB oracle SQL
in __spark_entry__ can mirror them exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenizer import STOPWORDS

TOKEN_PATTERN = "[a-z0-9]+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def ws_token_count(col: Column) -> Column:
    """Whitespace token count (empty string → 0)."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def regex_token_count(col: Column, pattern: str = TOKEN_PATTERN) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def stopword_ratio(col: Column) -> Column:
    """Fraction of [a-z0-9]+ tokens that are stopwords (round 4)."""
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), F.lit(0))
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*sorted(STOPWORDS))))
    return F.round(F.when(n == 0, F.lit(0.0)).otherwise(n_stop / n), 4)


def punct_ratio(col: Column) -> Column:
    """Non-alnum-non-space chars / total chars (round 4)."""
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.round(F.when(total == 0, F.lit(0.0)).otherwise(punct / total), 4)


def quality_score(col: Column) -> Column:
    """Deterministic heuristic quality in [0,1]: rewards mid-length
    docs, penalizes punctuation soup and stopword-free keyword mash.
    Spec (frozen, mirrored in oracle SQL):
        len_score  = least(1, n_ws_tokens / 50)
        q = round(len_score * (1 - punct_ratio) *
                  (0.5 + least(stopword_ratio, 0.5)), 4)
    (Real corpora want stopwords present — their absence signals
    keyword spam; the tlgs analog is the ASCII-art/hygiene family
    tlgsutils/utils.cpp:25-60.)"""
    len_score = F.least(F.lit(1.0), ws_token_count(col) / F.lit(50.0))
    return F.round(
        len_score
        * (F.lit(1.0) - punct_ratio(col))
        * (F.lit(0.5) + F.least(stopword_ratio(col), F.lit(0.5))),
        4,
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text (F12 sanitize + F9 hash analog, portable to SQL)."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(norm)


def lang_id_ngram(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Character-bigram language-ID heuristic (vectorized pandas UDF).

    Scores each text against per-language bigram profiles (tiny,
    hard-coded, deterministic) and argmaxes. A placeholder for a real
    fastText-style model — the Spark plumbing (Arrow batches, no
    per-row Python at the Spark level) is the deliverable.
    """
    profiles = {
        "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
        "de": ["en", "er", "ch", "de", "ei", "nd", "te", "in", "ie", "ge"],
        "fr": ["es", "le", "de", "en", "re", "nt", "on", "er", "te", "ou"],
        "es": ["de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "as"],
        "zh": [],  # CJK detection is by codepoint class below
    }

    @F.pandas_udf("string")
    def _lang(s: pd.Series) -> pd.Series:
        low = s.fillna("").str.lower()
        cjk = low.str.count(r"[一-鿿]")
        n = low.str.len().clip(lower=1)
        scores = {}
        for lang, grams in profiles.items():
            if not grams:
                continue
            tot = np.zeros(len(low))
            for g in grams:
                tot += low.str.count(g).to_numpy()
            scores[lang] = tot / n.to_numpy()
        mat = pd.DataFrame(scores)
        best = mat.idxmax(axis=1).where(mat.max(axis=1) > 0, "und")
        return best.where((cjk / n).to_numpy() < 0.3, "zh")

    return df.withColumn(out_col, _lang(F.col(text_col)))


def simhash64(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over [a-z0-9]+ tokens, token hash = xxhash-free
    deterministic numpy (FNV-1a 64). Vectorized pandas UDF."""

    @F.pandas_udf("long")
    def _simhash(s: pd.Series) -> pd.Series:
        import re

        tok_re = re.compile(TOKEN_PATTERN)
        out = np.zeros(len(s), dtype=np.int64)
        for i, text in enumerate(s.fillna("")):
            toks = tok_re.findall(text.lower())
            if not toks:
                continue
            # vectorized FNV-1a over the token list
            hs = np.array([_fnv1a64(t) for t in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            v = np.where(bits.sum(axis=0) * 2 >= len(toks), 1, 0).astype(np.uint64)
            out[i] = int((v << np.arange(64, dtype=np.uint64)).sum()) - 2**64 * int(
                v[63]
            )  # to signed
        return pd.Series(out)

    return df.withColumn(out_col, _simhash(F.col(text_col)))


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
