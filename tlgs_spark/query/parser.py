"""tlgs query grammar, re-pinned for the transcript corpus.

Reference: parseSearchQuery / parseSizeUnits
(tlgs/server/controllers/search.cpp:143-244) and evalFilter
(search.cpp:643-676). Two-pass parse: pass 1 classifies tokens as
Text / Filter / Logical(NOT) — a ``size:`` token is Filter by KEY
alone (search.cpp:180-182), its value is validated later; pass 2 binds
NOT to the following filter (a trailing or filter-less NOT stays a
text term — reference behavior), collects text terms, and appends ALL
``infirst:`` values — negated ones included — onto the END of the text
query (search.cpp:240-243 appends every title value after the loop).

Field mapping (graft): content_type→tool, domain→conv, + role;
intitle→infirst (term must appear in the conversation's turn-0 text);
size keeps the reference unit grammar ``([><])([.0-9]+)(units)`` with
parseSizeUnits' exact rules (search.cpp:143-165): lowercase, at most
ONE trailing 'b' stripped when longer than one char, then exact match
against ''/b/byte/k/ki/m/mi/g/gi — so ``kb``/``kib`` parse but
``kbyte`` does not. An unparseable size value or unit DROPS the token
(and its pending NOT) from the query entirely (search.cpp:211-221
``continue``), never falling back to a text term. Values truncate to
integers (size_t arithmetic).

Filter semantics (evalFilter): within one filter type constraints OR,
across types AND; tool/role/conv/infirst negate via XOR, but size
filters fold negation into the comparison DIRECTION at parse time
(search.cpp:224 stores ``negate^greater``), so ``NOT size:>N`` means
``size < N`` strictly — the two disagree with outcome-XOR exactly at
size == N. ``tool``/role use prefix match (content_type analog), conv
exact (domain analog). Docs with size==0 are excluded whenever a size
filter is present (search.cpp:646-649).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

SIZE_RE = re.compile(r"([><])([.0-9]+)([GBKMibyte]+)?", re.IGNORECASE)
# std::stod's longest-valid-prefix number grammar (no exponent occurs:
# the regex admits only [.0-9])
_STOD_RE = re.compile(r"(\d+\.?\d*|\.\d+)")

_UNITS = {
    "": 1,
    "b": 1,
    "byte": 1,
    "k": 1000,
    "ki": 2**10,
    "m": 1000 * 1000,
    "mi": 2**20,
    "g": 1000 * 1000 * 1000,
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


def parse_size_units(unit: str) -> int | None:
    """parseSizeUnits (search.cpp:143-165), rule for rule: lowercase,
    strip at most ONE trailing 'b' when len > 1, exact lookup. The
    quirks are deliberate parity: 'bb'→'b' parses (=1), 'kbyte' does
    not (ends in 'e', no strip, no match)."""
    unit = unit.lower()
    if len(unit) > 1 and unit.endswith("b"):
        unit = unit[:-1]
    return _UNITS.get(unit)


def parse_size_value(spec: str) -> tuple[str, int] | None:
    m = SIZE_RE.fullmatch(spec.strip())
    if not m:
        return None
    op, num, unit = m.group(1), m.group(2), (m.group(3) or "")
    mult = parse_size_units(unit)
    if mult is None:
        return None
    m2 = _STOD_RE.match(num)
    if m2 is None:
        # std::stod would throw out of the reference's handler here
        # (e.g. value '.'); treat as an invalid filter instead
        return None
    # stod parses the longest valid prefix ('1.2.3' → 1.2), and the
    # reference stores the product in a size_t — truncate
    return op, int(float(m2.group(1)) * mult)


@dataclass
class SearchFilter:
    tool: list[tuple[str, bool]] = field(default_factory=list)  # (prefix, negate)
    role: list[tuple[str, bool]] = field(default_factory=list)
    conv: list[tuple[str, bool]] = field(default_factory=list)  # exact
    # (op, val): negation is already FOLDED into op at parse time, the
    # way the reference stores negate^greater (search.cpp:224)
    size: list[tuple[str, int]] = field(default_factory=list)
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
                # size tokens classify as Filter by KEY alone
                # (search.cpp:180-182); a bad value is handled in
                # pass 2 by DROPPING the token, not demoting to text
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
            parsed = parse_size_value(val)
            if parsed is not None:
                op, v = parsed
                # fold negation into the direction (search.cpp:224)
                greater = negate ^ (op == ">")
                filt.size.append((">" if greater else "<", v))
            # else: bad size value/unit — the token AND its pending NOT
            # vanish from the query (search.cpp:211-221)
        elif key == "infirst":
            filt.infirst.append((val, negate))
        else:
            getattr(filt, key).append((val, negate))
        pending_not = None
    if pending_not is not None:
        text_terms.append(pending_not)
    # every title value — negated included — rejoins the text query
    # AFTER the loop (search.cpp:240-243), so retrieval still requires
    # the term in AND mode exactly like plainto_tsquery's implicit AND
    text_terms.extend(val for val, _neg in filt.infirst)
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
        # direction pre-folded at parse time: strict compare, no XOR
        if not any(size > v if op == ">" else size < v for op, v in filt.size):
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
