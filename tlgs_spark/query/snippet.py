"""Snippet / highlight generation — the ``ts_headline`` analog.

Reference: previews are computed over only the first 5,000 chars of
the body with MinWords=23, MaxWords=37, MaxFragments=1
(search.cpp:773-779 — "MUCH faster ... without loosing accuracy"), and
sanitized of newlines/tabs/code-fences/leading gemtext markers
(search.cpp:61-69: only the literal ``​```​`` fence is replaced — single
backticks survive — and a preview consisting entirely of marker chars
is returned unchanged, find_first_not_of == npos). Frozen spec here:
whitespace-run collapse + outer trim on top of the reference rules
(the PG ts_headline stage normalizes whitespace before sanitize runs
in the reference pipeline); whitespace words; a word matches if the
STEM of its lowercased [a-z0-9]-normalized form equals a query term.
TERM CONTRACT: ``terms`` must be ANALYZER OUTPUT (tokenize_query /
s_stem applied exactly once to the surface form) — ts_headline matches
through the same stemmer as retrieval, so "cats" highlights for the
query "cat". make_snippet does NOT re-stem the terms: spec v4's
stemmer is not idempotent (tokenizer.py docstring), so re-stemming an
already-stemmed term would corrupt it ("preced" → "prec") and miss
every highlight. The single fragment starts at the first matching
word and extends up to MaxWords, padding left to reach MinWords;
matches are wrapped in ``[ ]``.
"""

from __future__ import annotations

import re

from ..tokenizer import s_stem

HEAD_CHARS = 5000
MIN_WORDS = 23
MAX_WORDS = 37

_NORM_RE = re.compile(r"[^a-z0-9]+")
_LEAD_RE = re.compile(r"^[`*=>#]+")


def sanitize(s: str) -> str:
    # replaceAll("\n"/"\t"/"```" -> " ") then strip leading gemtext
    # markers, exactly like sanitizeGemini (search.cpp:61-69); single
    # backticks are NOT markers and survive
    s = s.replace("\n", " ").replace("\t", " ").replace("```", " ")
    stripped = _LEAD_RE.sub("", s)
    if not stripped:
        # the whole string is marker chars: the reference returns it
        # unchanged (find_first_not_of == npos)
        return s
    return re.sub(r"\s{2,}", " ", stripped).strip()


def make_snippet(text: str, terms: list[str]) -> str:
    """``terms`` are analyzer output — see the term contract above."""
    if not text:
        return ""
    head = sanitize(text[:HEAD_CHARS])
    words = head.split(" ")
    tset = {t.lower() for t in terms}
    norm = [s_stem(_NORM_RE.sub("", w.lower())) for w in words]
    hits = [i for i, w in enumerate(norm) if w in tset]
    if hits:
        start = hits[0]
        end = min(len(words), start + MAX_WORDS)
        start = max(0, min(start, end - MIN_WORDS))
    else:
        start, end = 0, min(len(words), MIN_WORDS)
    out = []
    for i in range(start, end):
        out.append(f"[{words[i]}]" if norm[i] in tset else words[i])
    return " ".join(out)
