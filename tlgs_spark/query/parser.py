"""tlgs query grammar, re-pinned for the transcript corpus.

Reference: parseSearchQuery / parseSizeUnits
(tlgs/server/controllers/search.cpp:143-244) and evalFilter
(search.cpp:643-676). Two-pass parse: pass 1 classifies tokens as
Text / Filter / Logical(NOT); pass 2 binds NOT to the following filter
(a trailing or filter-less NOT stays a text term — reference behavior),
collects text terms, and appends ``infirst:`` values back onto the text
query (the ``intitle:`` analog, search.cpp:240-243).

Field mapping (graft): content_type→tool, domain→conv, + role;
intitle→infirst (term must appear in the conversation's turn-0 text);
size keeps the reference unit grammar ``([><])([.0-9]+)(units)`` with
K/Ki/M/Mi/G/Gi and a tolerated trailing b/byte (search.cpp:143-165).

Filter semantics (evalFilter): within one filter type constraints OR,
across types AND, each constraint's outcome XOR its negate flag;
``tool``/role use prefix match (content_type analog), conv exact
(domain analog). Docs with size==0 are excluded whenever a size filter
is present (search.cpp:646-649).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

SIZE_RE = re.compile(r"([><])([.0-9]+)([GBKMibyte]+)?", re.IGNORECASE)

_UNITS = {
    "": 1.0,
    "k": 1e3,
    "ki": 2**10,
    "m": 1e6,
    "mi": 2**20,
    "g": 1e9,
    "gi": 2**30,
}

FILTER_KEYS = {
    "tool": "tool",
    "role": "role",
    "conv": "conv",
    "size": "size",
    "infirst": "infirst",
    # reference-key aliases (doc_search.csp:15-45)
    "content_type": "tool",
    "domain": "conv",
    "intitle": "infirst",
}


def parse_size_value(spec: str) -> tuple[str, float] | None:
    m = SIZE_RE.fullmatch(spec.strip())
    if not m:
        return None
    op, num, unit = m.group(1), m.group(2), (m.group(3) or "")
    unit = unit.lower()
    # tolerate trailing 'b'/'byte' (search.cpp:152-156)
    for suffix in ("ibyte", "byte", "ib", "b"):
        if unit.endswith(suffix) and unit[: -len(suffix)] + ("i" if suffix.startswith("i") else "") in _UNITS:
            unit = unit[: -len(suffix)] + ("i" if suffix.startswith("i") else "")
            break
    if unit not in _UNITS:
        return None
    try:
        val = float(num) * _UNITS[unit]
    except ValueError:
        return None
    return op, val


@dataclass
class SearchFilter:
    tool: list[tuple[str, bool]] = field(default_factory=list)  # (prefix, negate)
    role: list[tuple[str, bool]] = field(default_factory=list)
    conv: list[tuple[str, bool]] = field(default_factory=list)  # exact
    size: list[tuple[str, float, bool]] = field(default_factory=list)  # (op, val, negate)
    infirst: list[tuple[str, bool]] = field(default_factory=list)

    def is_empty(self) -> bool:
        return not (self.tool or self.role or self.conv or self.size or self.infirst)


def parse_search_query(query: str) -> tuple[str, SearchFilter]:
    """→ (text_query, SearchFilter). Raises nothing; unparseable filter
    tokens fall back to text terms (reference behavior)."""
    tokens = [t for t in query.split(" ") if t]
    # pass 1: classify
    kinds: list[tuple[str, str, str]] = []  # (kind, key, value) / (text, "", tok)
    for tok in tokens:
        if tok in ("NOT", "not"):
            kinds.append(("logical", "", tok))
            continue
        if ":" in tok:
            key, _, val = tok.partition(":")
            k = FILTER_KEYS.get(key.lower())
            if k is not None and val:
                if k == "size":
                    if parse_size_value(val) is not None:
                        kinds.append(("filter", k, val))
                        continue
                else:
                    kinds.append(("filter", k, val))
                    continue
        kinds.append(("text", "", tok))

    # pass 2: bind NOT to following filter; build text + filters.
    # `pending_not` carries the ORIGINAL logical token ("NOT"/"not") so
    # an unbound NOT re-emits with the user's own casing (retrieval is
    # case-insensitive; the returned text_query string should not
    # misrepresent the query).
    text_terms: list[str] = []
    filt = SearchFilter()
    pending_not: str | None = None
    for kind, key, val in kinds:
        if kind == "logical":
            if pending_not is not None:
                text_terms.append(pending_not)  # double NOT: first becomes text
            pending_not = val
            continue
        if kind == "text":
            if pending_not is not None:
                text_terms.append(pending_not)
                pending_not = None
            text_terms.append(val)
            continue
        # filter token
        negate = pending_not is not None
        if key == "size":
            op, v = parse_size_value(val)  # validated in pass 1
            filt.size.append((op, v, negate))
        elif key == "infirst":
            filt.infirst.append((val, negate))
            if not negate:
                text_terms.append(val)  # intitle terms rejoin the text query
        else:
            getattr(filt, key).append((val, negate))
        pending_not = None
    if pending_not is not None:
        text_terms.append(pending_not)
    return " ".join(text_terms), filt


def eval_filter_row(
    filt: SearchFilter,
    tool: str | None,
    role: str | None,
    conv_id: str,
    size: int,
    first_text_terms: set[str],
) -> bool:
    """evalFilter (search.cpp:643-676): OR within type, AND across
    types, negation via XOR; size==0 excluded when size filters exist.
    ``first_text_terms`` = tokenized turn-0 text of the doc's conv."""

    def group(ok_list: list[bool], negs: list[bool]) -> bool:
        return any(ok ^ neg for ok, neg in zip(ok_list, negs))

    if filt.size:
        if size == 0:
            return False
        oks, negs = [], []
        for op, v, neg in filt.size:
            oks.append(size > v if op == ">" else size < v)
            negs.append(neg)
        if not group(oks, negs):
            return False
    if filt.tool:
        t = tool or ""
        if not group([t.startswith(p) for p, _ in filt.tool], [n for _, n in filt.tool]):
            return False
    if filt.role:
        r = role or ""
        if not group([r.startswith(p) for p, _ in filt.role], [n for _, n in filt.role]):
            return False
    if filt.conv:
        if not group([conv_id == c for c, _ in filt.conv], [n for _, n in filt.conv]):
            return False
    if filt.infirst:
        # first_text_terms holds ANALYZED terms (the tokenizer stems),
        # so the filter term goes through the same analyzer — the
        # reference runs intitle terms through the identical tsquery
        # stemmer as body terms (search.cpp:441,445)
        from ..tokenizer import s_stem

        if not group(
            [s_stem(term.lower()) in first_text_terms for term, _ in filt.infirst],
            [n for _, n in filt.infirst],
        ):
            return False
    return True
