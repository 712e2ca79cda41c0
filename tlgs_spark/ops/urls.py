"""URL operators — generic capability parity with tlgsutils.

Not needed for the transcript corpus (no URLs in the data model), but
the reference's URL toolkit is part of its operator surface, so the
rebuild carries the same semantics as reusable functions + Spark
column expressions:

- parse/normalize (url_parser.cpp:8-259): lowercase scheme+host,
  lexically-normal path, default-port elision (gemini 1965, http 80,
  https 443, ftp 21, titan 1965, spartan 300)
- linkCompose (utils.cpp:85-105): relative-link resolution incl. `..`
- isNonUriAction (utils.cpp:107-119): mailto:/javascript:-style
- urlEncode/urlDecode (utils.cpp:62-83): RFC3986-ish, `+` = space on
  decode
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import quote, unquote_plus, urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PORTS = {
    "gemini": 1965,
    "titan": 1965,
    "http": 80,
    "https": 443,
    "ftp": 21,
    "spartan": 300,
}

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def normalize_url(url: str) -> str | None:
    """Lowercase scheme/host, collapse path lexically, drop default
    port. Returns None for unparseable/bad URLs (leading-dot host,
    control chars — url_parser_test.cpp:88-89 analog)."""
    if url is None or any(ord(c) < 0x20 for c in url):
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    if not parts.scheme or not parts.hostname:
        return None
    host = parts.hostname.lower()
    if host.startswith(".") or not host:
        return None
    scheme = parts.scheme.lower()
    port = parts.port
    netloc = host
    if port is not None and port != DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    norm = posixpath.normpath(path)
    if norm == ".":
        norm = "/"
    if path.endswith("/") and not norm.endswith("/"):
        norm += "/"
    return urlunsplit((scheme, netloc, norm, parts.query, parts.fragment))


def link_compose(base: str, link: str) -> str:
    """Relative-link resolution against a base URL (utils.cpp:85-105)."""
    if _SCHEME_RE.match(link):
        return link
    b = urlsplit(base)
    if link.startswith("//"):
        return f"{b.scheme}:{link}"
    if link.startswith("/"):
        path = link
    else:
        bdir = posixpath.dirname(b.path or "/")
        path = bdir.rstrip("/") + "/" + link
    norm = posixpath.normpath(path)
    if link.endswith("/") and not norm.endswith("/"):
        norm += "/"
    return urlunsplit((b.scheme, b.netloc, norm, "", ""))


def is_non_uri_action(s: str) -> bool:
    """mailto:/javascript:-style pseudo-links (utils.cpp:107-119)."""
    return bool(_SCHEME_RE.match(s)) and "://" not in s


def url_encode(s: str) -> str:
    return quote(s, safe="-_.~")


def url_decode(s: str) -> str:
    return unquote_plus(s)


# --- Spark column renderings (for URL-bearing corpora) ---

def non_uri_action_col(col: Column) -> Column:
    return col.rlike("^[A-Za-z][A-Za-z0-9+.-]*:") & ~col.contains("://")


def host_of(col: Column) -> Column:
    return F.lower(F.parse_url(col, F.lit("HOST")))
