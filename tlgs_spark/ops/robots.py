"""robots.txt parsing + wildcard path matching (P8/F26/U3).

Semantics from the reference's parser and its test tables
(tlgsutils/robots_txt_parser.cpp:9-136;
tlgsutils/tests/robots_txt_parser_test.cpp):

- line grammar ``[ \\t]*(key):[ \\t]*(value)`` with case-insensitive
  keys, CRLF tolerated, leading whitespace in key/value stripped
- consecutive ``User-agent`` lines accumulate into one group (a rule
  block can address several agents); a non-UA line closes the group
- rules before any ``User-agent`` line apply to everyone (default UA
  ``*`` — robots_txt_parser_test.cpp:121-125)
- an EMPTY ``Disallow:`` value CLEARS the accumulated set (allow-all
  reset, robots_txt_parser.cpp:43-49)
- wildcard path match (``wildcardPathMatch``, :67-122): literal
  prefixes must end at a ``/`` boundary, ``*`` prefix/suffix/middle
  fast paths, ``$`` anchor, regex fallback with metacharacter escaping

In the crawler these rules are crawl-control metadata: parsed on the
driver per (host, port), broadcast, and applied as a vectorized
predicate over candidate URLs (`blocked_path_column`). Rule sets per
host are tiny (tens of patterns), so the column rendering is an OR
chain of JVM-side predicates — no Python in the data plane.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# GREEDY key group — deliberate reference parity: tlgs uses the same
# regex (robots_txt_parser.cpp:17), so a value containing ':' (e.g.
# "Disallow: /a:b/c") mis-keys and drops the line THERE TOO. Pinned by
# test_robots_blacklist.py; a "fix" here would diverge from the
# reference's crawl behavior.
_LINE_RE = re.compile(r"[ \t]*(.*):[ \t]*(.*)")


def parse_robots_txt(text: str, agents: set[str] | list[str]) -> list[str]:
    """→ sorted disallowed path patterns relevant to any of ``agents``."""
    agents = set(agents)
    disallowed: set[str] = set()
    care = True
    last_line_was_ua = False
    for line in text.replace("\r\n", "\n").split("\n"):
        m = _LINE_RE.fullmatch(line)
        if not m:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == "user-agent":
            if last_line_was_ua:
                care |= val in agents
            else:
                care = val in agents
            last_line_was_ua = True
        else:
            last_line_was_ua = False
        if key == "disallow" and care:
            if not val:
                disallowed.clear()
            else:
                disallowed.add(val)
    return sorted(disallowed)


_ESCAPE_CHARS = set("\\.+()[]{}|")


def _pattern_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch in _ESCAPE_CHARS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def wildcard_path_match(pattern: str, path: str) -> bool:
    """One disallow pattern vs one URL path — the reference's decision
    tree (fast literal/star cases, regex fallback). Note the
    single-middle-star case replicates ``rfind(suffix) > n`` EXACTLY,
    including the npos quirk: a suffix absent from the path counts as
    a match (size_t npos > n) — the reference's own test table relies
    on it ("/~testuser/gci-bin/test.txt" vs "/~*/cgi-bin/" → blocked,
    robots_txt_parser_test.cpp:146)."""
    if not pattern:
        return False
    star_count = pattern.count("*")
    if star_count == 0:
        # len+1 boundary is deliberate reference parity
        # (robots_txt_parser.cpp:75 `str.size() > pattern.size()+1`):
        # for a slash-terminated pattern "/priv/", the child "/priv/a"
        # (exactly one char longer) escapes the rule THERE TOO. Pinned
        # by test_robots_blacklist.py.
        return (
            path == pattern
            or path == pattern + "/"
            or (
                len(path) > len(pattern) + 1
                and path.startswith(pattern)
                and (path[len(pattern)] == "/" or pattern[-1] == "/")
            )
        )
    if pattern[-1] == "$" and (pattern.startswith("*") or pattern.startswith("/*")):
        pattern = pattern[:-1]
    if pattern[0] == "*" and pattern[-1] == "*" and star_count == 2:
        return pattern[1:-1] in path
    if pattern.startswith("/*") and pattern[-1] == "*" and star_count == 2:
        return pattern[2:-1] in path
    if pattern[0] == "*" and star_count == 1:
        return path.endswith(pattern[1:])
    if pattern.startswith("/*") and star_count == 1:
        return path.endswith(pattern[2:])
    if pattern[-1] == "*" and star_count == 1:
        return path.startswith(pattern[:-1])
    n = pattern.find("*")
    if n != -1 and star_count == 1:
        suffix = pattern[n + 1 :]
        pos = path.rfind(suffix)
        return path.startswith(pattern[:n]) and (pos == -1 or pos > n)
    try:
        return re.fullmatch(_pattern_regex(pattern), path) is not None
    except re.error:
        return False


def is_path_blocked(path: str, disallowed: list[str] | str) -> bool:
    if isinstance(disallowed, str):
        disallowed = [disallowed]
    return any(wildcard_path_match(p, path) for p in disallowed)


# --- Spark column rendering -------------------------------------------------


def _rule_column(path_col: Column, pattern: str) -> Column:
    """One disallow pattern as a JVM-side boolean Column — same
    decision tree as wildcard_path_match."""
    star_count = pattern.count("*")
    if star_count == 0:
        boundary = (
            (F.length(path_col) > len(pattern) + 1)
            & path_col.startswith(pattern)
            & (
                F.lit(pattern[-1] == "/")
                | (F.substring(path_col, len(pattern) + 1, 1) == "/")
            )
        )
        return (path_col == pattern) | (path_col == pattern + "/") | boundary
    if pattern[-1] == "$" and (pattern.startswith("*") or pattern.startswith("/*")):
        pattern = pattern[:-1]
    if pattern[0] == "*" and pattern[-1] == "*" and star_count == 2:
        return path_col.contains(pattern[1:-1])
    if pattern.startswith("/*") and pattern[-1] == "*" and star_count == 2:
        return path_col.contains(pattern[2:-1])
    if pattern[0] == "*" and star_count == 1:
        return path_col.endswith(pattern[1:])
    if pattern.startswith("/*") and star_count == 1:
        return path_col.endswith(pattern[2:])
    if pattern[-1] == "*" and star_count == 1:
        return path_col.startswith(pattern[:-1])
    n = pattern.find("*")
    if n != -1 and star_count == 1:
        prefix, suffix = pattern[:n], pattern[n + 1 :]
        # rfind(suffix) > n, npos included: match iff suffix absent
        # entirely, OR some occurrence starts at 0-based position > n
        # (locate() is 1-based)
        return path_col.startswith(prefix) & (
            (F.locate(suffix, path_col) == 0) | (F.locate(suffix, path_col, n + 2) > 0)
        )
    return path_col.rlike("^" + _pattern_regex(pattern) + "$")


def blocked_path_column(path_col: Column, disallowed: list[str]) -> Column:
    """OR-chain of per-pattern predicates. Rule sets are small (per-host
    robots rules), so this stays whole-stage-codegen-friendly."""
    out = F.lit(False)
    for p in disallowed:
        out = out | _rule_column(path_col, p)
    return out
