"""The frozen text-analysis spec shared by the Spark engine, the
pure-Python oracle, and the DuckDB oracle SQL.

Reference semantics: PostgreSQL ``to_tsvector('english', ...)`` —
lowercase, split on non-word, drop stopwords
(tlgs/crawler/crawler.cpp:556-558); queries use the same analyzer with
implicit AND (``plainto_tsquery``, search.cpp:441). We freeze a
deterministic, dependency-free equivalent (spec v2, stemmed — the
spec is ours to pin; rank-identity is proven against *this* spec's
oracle):

1. optional hygiene pass: drop separator / ASCII-art / box-drawing
   lines (analog of tlgsutils/utils.cpp:25-60 isAsciiArt and
   gemini_parser.cpp:41-89 preformatted-drop rules)
2. lowercase
3. tokens = maximal runs of ``[a-z0-9]+`` (ASCII)
4. drop stopwords (fixed list below), drop tokens longer than 64 chars
5. stem (spec v2): the Harman "S-stemmer" (Harman 1991, *How
   effective is suffixing?*) — three plural-suffix rules, applied to
   tokens of ≥ 4 chars, AFTER the stopword/length check (raw-token
   stopwording, like PG's dictionary chain):
     a. ``…ies`` (not ``eies``/``aies``) → ``…y``
     b. ``…es``  (not ``aes``/``ees``/``oes``) → drop the ``s``
     c. ``…s``   (not ``us``/``ss``) → drop the ``s``
   This closes the round-1 plural/singular retrieval gap (PG
   ``to_tsvector('english')`` stems — crawler.cpp:556-558) with a
   spec small enough to stay bit-identical across the Arrow
   tokenizer, the JVM expression twin, and plain-SQL DuckDB oracles
   (a full Snowball run needs the fts extension, unavailable here).

   **Divergence contract (deliberate, frozen):** the S-stemmer
   handles plural/singular ONLY. Derivational forms that PG's
   'english' (Snowball) config conflates are DISTINCT terms here:
   "running" ≠ "run", "connection" ≠ "connect", "quickly" ≠ "quick".
   A user porting queries from the reference will see those misses;
   the trade is a spec with one SQL-renderable authority shared by
   every execution path and every oracle, versus a 1200-rule stemmer
   with no DuckDB twin (rank-identity would become unverifiable).
   The exact divergence surface is pinned by
   tests/test_tokenizer.py::test_stemmer_divergence_contract; any
   future spec v3 (e.g. a bounded derivational rule set) must bump
   ANALYZER_VERSION so incremental updates rebuild rather than mix
   analyzers.

Everything here must stay in lock-step with :func:`tokens_cte_sql` /
:func:`stem_sql_case`, which render the same pipeline as ANSI SQL for
the DuckDB oracle.
"""

from __future__ import annotations

import re
from collections import Counter

TOKEN_RE = re.compile(r"[a-z0-9]+")
MAX_TOKEN_LEN = 64

# Analyzer spec version, stamped into index_meta at build time and
# checked by incremental_update: an index whose postings were built
# under a different analyzer cannot reuse shards verbatim (the reused
# segments would hold differently-analyzed terms than the rebuilt
# ones — a silently mixed-analyzer index).
ANALYZER_VERSION = "tlgs_spark.tokenizer v2 (s-stem)"

# Classic minimal English stopword list (fixed forever — part of the spec).
STOPWORDS = frozenset(
    "a an and are as at be by for from has in is it its of on that the to was were will with".split()
)

# Hygiene: lines dropped before tokenization when hygiene=True.
#  - separator lines: >=3 of -=_~*#. only          (utils.cpp:34-41 analog)
#  - any-char repeated >=4 times filling the line  (utils.cpp:30-33 analog)
#  - lines containing box-drawing/block chars      (utils.cpp:43-52 analog)
_SEP_LINE = r"[\-=_~*#.]{3,}"
_REPEAT_LINE = r"(\S)\1{3,}"
_BOX_CHARS = "─-╿▀-▟"  # box drawing + block elements
HYGIENE_LINE_RE = re.compile(
    rf"(?m)^[ \t]*(?:{_SEP_LINE}|{_REPEAT_LINE}|[^\n]*[{_BOX_CHARS}][^\n]*)[ \t]*$"
)


def clean_text(text: str) -> str:
    """Apply the hygiene pass: junk lines become empty lines."""
    return HYGIENE_LINE_RE.sub("", text)


STEM_MIN_LEN = 4


def s_stem(t: str) -> str:
    """Spec step 5: the S-stemmer (see module docstring). Pure
    function of the kept token; never lengthens it, never empties it."""
    if len(t) < STEM_MIN_LEN:
        return t
    if t.endswith("ies"):
        return t if t.endswith(("eies", "aies")) else t[:-3] + "y"
    if t.endswith("es"):
        return t if t.endswith(("aes", "ees", "oes")) else t[:-1]
    if t.endswith("s"):
        return t if t.endswith(("us", "ss")) else t[:-1]
    return t


def tokenize(text: str, hygiene: bool = False) -> list[str]:
    """Frozen analyzer. Pure Python — this *is* the spec."""
    if text is None:
        return []
    if hygiene:
        text = clean_text(text)
    toks = TOKEN_RE.findall(text.lower())
    return [s_stem(t) for t in toks if t not in STOPWORDS and len(t) <= MAX_TOKEN_LEN]


def term_freqs(text: str, hygiene: bool = False) -> Counter:
    return Counter(tokenize(text, hygiene=hygiene))


def tokenize_query(query: str) -> list[str]:
    """plainto_tsquery analog: same analyzer, duplicate terms collapsed,
    first-occurrence order kept (search.cpp:441)."""
    seen: dict[str, None] = {}
    for t in tokenize(query):
        seen.setdefault(t, None)
    return list(seen)


# ---------------------------------------------------------------------------
# SQL renderings of the same spec (DuckDB oracle parity).
# ---------------------------------------------------------------------------

def stopwords_sql_list() -> str:
    return ", ".join(f"'{w}'" for w in sorted(STOPWORDS))


def stem_sql_case(e: str) -> str:
    """ANSI-SQL rendering of :func:`s_stem` over expression ``e`` —
    identical semantics in DuckDB and Spark SQL (both: 1-based
    substr, || concat, length)."""
    L = f"length({e})"

    def suf(n: int) -> str:
        return f"substr({e}, {L} - {n - 1}, {n})"

    return (
        f"CASE WHEN {L} < {STEM_MIN_LEN} THEN {e} "
        f"WHEN {suf(3)} = 'ies' THEN "
        f"(CASE WHEN {suf(4)} IN ('eies', 'aies') THEN {e} "
        f"ELSE substr({e}, 1, {L} - 3) || 'y' END) "
        f"WHEN {suf(2)} = 'es' THEN "
        f"(CASE WHEN {suf(3)} IN ('aes', 'ees', 'oes') THEN {e} "
        f"ELSE substr({e}, 1, {L} - 1) END) "
        f"WHEN {suf(1)} = 's' THEN "
        f"(CASE WHEN {suf(2)} IN ('us', 'ss') THEN {e} "
        f"ELSE substr({e}, 1, {L} - 1) END) "
        f"ELSE {e} END"
    )


def tokens_cte_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """A DuckDB CTE producing (doc_id, term, tf) under the frozen spec
    (no hygiene — hygiene-on paths are tested against the Python
    oracle). tf groups by the STEMMED term, merging e.g. window +
    windows counts exactly like the Python/Arrow paths."""
    return f"""
  raw_toks AS (
    SELECT {id_col} AS doc_id,
           unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS term
    FROM {table}
  ),
  toks AS (
    SELECT doc_id, {stem_sql_case("term")} AS term FROM raw_toks
    WHERE length(term) <= {MAX_TOKEN_LEN}
      AND term NOT IN ({stopwords_sql_list()})
  ),
  tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
  )""".strip()
