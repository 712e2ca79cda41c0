"""Test-only reference implementation of the Porter stemming algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980
— public domain algorithm, implemented here from the published rule
tables; no code copied from any stemmer distribution).

Purpose: a measured stand-in for PostgreSQL's ``english`` dictionary
(tlgs/crawler/crawler.cpp:556-558 — PG uses Snowball "english", i.e.
Porter2, which differs from the 1980 algorithm only in a handful of
documented rule refinements; the divergence CLASSES that
tests/test_stemmer_divergence.py pins — -ness/-ment/-ization families
etc. — are identical between the two). This module is NOT part of the
engine: the engine's frozen analyzer is tlgs_spark.tokenizer (spec v3)
and must stay SQL-renderable; this exists so the residual between the
two is a pinned table instead of an anecdote.
"""

from __future__ import annotations

_V = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _V:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC){m}[V]."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _replace(w: str, suf: str, rep: str, min_m: int) -> str | None:
    """Apply ``suf``→``rep`` if the remaining stem has measure > min_m
    (Porter's "(m > k)" conditions). None = rule did not fire."""
    if not w.endswith(suf):
        return None
    stem = w[: len(w) - len(suf)]
    if _measure(stem) > min_m:
        return stem + rep
    return w  # suffix matched but condition failed: step ends (longest match)


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        stem = w[:-3]
        return stem + "ee" if _measure(stem) > 0 else w
    fired = None
    if w.endswith("ed") and _has_vowel(w[:-2]):
        fired = w[:-2]
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        fired = w[:-3]
    if fired is None:
        return w
    w = fired
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _ends_double_cons(w) and w[-1] not in "lsz":
        return w[:-1]
    if _measure(w) == 1 and _ends_cvc(w):
        return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_rule(w: str, rules, min_m: int) -> str:
    # longest matching suffix wins; its condition decides, no fallthrough
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is None:
        return w
    out = _replace(w, best[0], best[1], min_m)
    return out if out is not None else w


def _step4(w: str) -> str:
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is None:
        return w
    stem = w[: len(w) - len(best)]
    if best == "ion" and not (stem.endswith("s") or stem.endswith("t")):
        return w
    return stem if _measure(stem) > 1 else w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        return w[:-1]
    return w


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _longest_rule(w, _STEP2, 0)
    w = _longest_rule(w, _STEP3, 0)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w
