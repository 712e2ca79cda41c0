"""URL blacklist — origin-keyed prefix rules + hygiene heuristics (P7/P9).

Two layers, mirroring the reference:

- ``UrlBlacklist`` (tlgsutils/url_blacklist.hpp:13-46): rules keyed by
  origin (scheme://host[:port]); a URL is blocked iff any stored path
  for its origin wildcard-matches its (normalized) path. Reuses the
  robots wildcard matcher — the reference shares ``isPathBlocked``.
- ``in_blacklist`` heuristics (tlgs/crawler/blacklist.cpp:9-351): the
  ~20 hardcoded hygiene rules that need no rule list — localhost
  subnets, .onion/.local hosts, git/xkcd/webring/rfc-mirror paths,
  control characters, ≥3 repeated path components, commit-hash paths.

Scale rendering: the rule list is a broadcast-sized dimension; the
heuristics are pure string/array predicates. ``blacklist_column``
renders the heuristic layer as JVM Column expressions (UDF-free, stays
inside whole-stage codegen) for corpus-hygiene filtering of
URL-bearing corpora.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

from .robots import is_path_blocked
from .urls import normalize_url

_COMMIT_RE = re.compile(r"commits/[a-z0-9A-Z]+[/.].*")

# webring navigation endpoints (LEO + friends) — they distort link
# ranking (blacklist.cpp:308-315)
_WEBRING_SUFFIXES = (
    "/next.cgi", "/prev.cgi", "/rand.cgi",
    "/next", "/prev", "/rand",
    "/next.gmi", "/prev.gmi", "/rand.gmi",
)


def _origin_and_path(url: str) -> tuple[str, str] | None:
    norm = normalize_url(url)
    if norm is None:
        return None
    parts = urlsplit(norm)
    return f"{parts.scheme}://{parts.netloc}", parts.path or "/"


class UrlBlacklist:
    """Origin-keyed multimap of disallowed path patterns."""

    def __init__(self, urls: list[str] | None = None):
        self._rules: dict[str, list[str]] = {}
        for u in urls or []:
            self.add(u)

    def add(self, url: str) -> None:
        op = _origin_and_path(url)
        if op is None:
            raise ValueError(f"Invalid URL: {url}")
        origin, path = op
        self._rules.setdefault(origin, []).append(path)

    def is_blocked(self, url: str) -> bool:
        op = _origin_and_path(url)
        if op is None:
            return False
        origin, path = op
        rules = self._rules.get(origin)
        return bool(rules) and is_path_blocked(path, rules)


def _repeated_dir_component(path: str) -> bool:
    """≥3 identical path components ⇒ likely a redirect loop
    (blacklist.cpp:330-339; 2 repeats allowed: /image/gemlog/images)."""
    comps = ["/"] + [p for p in path.split("/") if p]
    if len(comps) < 3:
        return False
    counts: dict[str, int] = {}
    for c in comps:
        counts[c] = counts.get(c, 0) + 1
        if counts[c] >= 3:
            return True
    return False


def in_blacklist(
    url: str,
    domains: set[str] | None = None,
    url_rules: UrlBlacklist | None = None,
) -> bool:
    """The reference's full decision chain. ``domains``/``url_rules``
    carry the configured lists (the reference hardcodes its production
    lists; they're data, not semantics)."""
    if url is None or any(ord(c) < 32 for c in url):
        return True
    op = _origin_and_path(url)
    if op is None:
        return True
    parts = urlsplit(normalize_url(url))
    host, path = parts.hostname or "", parts.path or "/"
    if domains and host in domains:
        return True
    if url_rules is not None and url_rules.is_blocked(url):
        return True
    if path in ("/robots.txt", "/favicon.txt"):
        return True
    if host.startswith("127.0.0."):
        return True
    if host.endswith((".local", ".localhost", ".localdomain", ".onion")):
        return True
    if path.startswith("/git/") or host.startswith("git."):
        return True
    if ".git/tree/" in url or ".git/blob/" in url or url.endswith("/git.sh"):
        return True
    if "/~xkcd/" in url or "/xkcd/" in url:
        return True
    if path.endswith(_WEBRING_SUFFIXES):
        return True
    if "gopher:/:/" in url or "rfc-mirror" in url:
        return True
    if _repeated_dir_component(path):
        return True
    n = url.find("commits/")
    if n != -1 and _COMMIT_RE.fullmatch(url[n:]):
        return True
    return False


# --- Spark column rendering -------------------------------------------------


def blacklist_column(url_col: Column, domains: list[str] | None = None) -> Column:
    """Heuristic layer as pure JVM predicates over a URL string column.
    ``domains`` (small, broadcast-sized) adds exact-host blocking."""
    host = F.lower(F.coalesce(F.parse_url(url_col, F.lit("HOST")), F.lit("")))
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))
    comps = F.filter(F.split(path, "/"), lambda x: x != "")
    repeated = (F.size(comps) >= 2) & (
        F.array_max(
            F.transform(comps, lambda x: F.size(F.filter(comps, lambda y: y == x)))
        )
        >= 3
    )
    cond = (
        url_col.rlike("[\\x00-\\x1f]")
        | path.isin("/robots.txt", "/favicon.txt")
        | host.startswith("127.0.0.")
        | host.endswith(".local")
        | host.endswith(".localhost")
        | host.endswith(".localdomain")
        | host.endswith(".onion")
        | path.startswith("/git/")
        | host.startswith("git.")
        | url_col.contains(".git/tree/")
        | url_col.contains(".git/blob/")
        | url_col.endswith("/git.sh")
        | url_col.contains("/~xkcd/")
        | url_col.contains("/xkcd/")
        | url_col.contains("gopher:/:/")
        | url_col.contains("rfc-mirror")
        | repeated
        # first-occurrence anchoring, like the Python twin and the
        # reference (blacklist.cpp:341-346 matches from url.find): an
        # unanchored rlike would block when a LATER 'commits/' matches
        # even though the first one doesn't
        | F.regexp_extract(url_col, "commits/.*", 0).rlike(
            "^commits/[a-z0-9A-Z]+[/.]"
        )
    )
    for s in _WEBRING_SUFFIXES:
        cond = cond | path.endswith(s)
    if domains:
        cond = cond | host.isin(list(domains))
    return cond
