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
5. stem (spec v4): two sub-steps on tokens of ≥ 4 chars, AFTER the
   stopword/length check (raw-token stopwording, like PG's dictionary
   chain):

   5a. PLURAL — the Harman "S-stemmer" (Harman 1991, *How effective
   is suffixing?*), unchanged from spec v2:
     - ``…ies`` (not ``eies``/``aies``) → ``…y``
     - ``…es``  (not ``aes``/``ees``/``oes``) → drop the ``s``
     - ``…s``   (not ``us``/``ss``) → drop the ``s``

   5b. DERIVATIONAL (new in v3) — a bounded, Porter-step-1b/4-ish
   rule set applied to the plural-stemmed token (closes the most
   common derivational retrieval gap vs PG ``to_tsvector('english')``
   — crawler.cpp:556-558 — while staying plain-SQL renderable):
     - ``…ing`` (len ≥ 6, a vowel-or-y in the stem) → strip, then
       post-process (below):  running→run, looking→look, making→make
     - ``…ied`` (len ≥ 5, not ``eied``/``aied``) → ``…y`` (the past-
       tense mirror of the plural rule):  tried→try, applied→apply
     - ``…ed``  (len ≥ 5, not ``…eed``, vowel-or-y in stem) → strip +
       post-process:  edited→edit, stopped→stop, noted→note
       (``eed`` keeps feed/agreed/exceed whole)
     - ``…ly``  (len ≥ 6, non-vowel-y before it) → strip, undouble a
       trailing ``ll``:  quickly→quick, really→real; family/daily
       keep (vowel before ``ly``)
     - ``…ization``/``…yzation`` (len ≥ 10) → ``…ize``/``…yze`` (new
       in v4 — the Porter step-2 IZATION→IZE hop): organization→
       organize, civilization→civilize; checked before the ``ion``
       rule, which would otherwise strand these at ``…izat``
     - ``…izer``/``…yzer`` (len ≥ 7) → ``…ize``/``…yze`` (v4, Porter
       step-2 IZER→IZE + the ER-rule analog for -yze verbs):
       organizer→organize, analyzer→analyze; "sizer" keeps (length
       guard ≈ Porter's m>0 check)
     - ``…ion`` (len ≥ 8, ``s``/``t`` before it) → strip:
       connection→connect, decision→decis; action/section keep
       (length guard ≈ Porter's m>1 measure check)
     post-process after ``ing``/``ed`` strip (Porter 1b2 subset):
     a trailing doubled consonant (not ``l``/``s``/``z``) drops one
     letter (stopp→stop); a stem ending ``iz``/``yz`` regains ``e``
     (v4: organiz→organize, analyz→analyze — so -ized/-izing land on
     the same ``…ize`` stem as -ization/-izer); a 3-char c-v-c stem (last
     not ``w``/``x``/``y``) gains ``e`` (mak→make, hop→hope — a len-3
     cvc provably has Porter measure exactly 1, so this needs no
     measure machinery).

   **Divergence contract (deliberate, frozen at v4):** Snowball
   conflations OUTSIDE these rules remain distinct terms here:
   "happiness" ≠ "happy" (-ness untouched), "adjustment" ≠ "adjust"
   (-ment untouched), and e-final families can split where the 1b2
   subset can't restore the e ("create"/"creates" → create but
   "created"/"creating" → creat; the ``iz`` e-restore closes exactly
   the -ize family, whose stems are unambiguous — no English stem
   ends bare ``-iz``). The trade is unchanged from v2: one
   SQL-renderable authority shared by every execution path and
   every oracle, versus a 1200-rule stemmer with no DuckDB twin. The
   exact divergence surface is pinned by tests/test_tokenizer.py and
   tests/test_stemmer_divergence.py.

   **v4 is NOT idempotent** (v2 was): e.g. s_stem("preceded") =
   "preced" but s_stem("preced") = "prec". Every call site therefore
   stems EXACTLY ONCE from the raw surface form; make_snippet's term
   contract changed accordingly (callers pass analyzer output).
   Pinned by tests/test_tokenizer.py::test_single_stem_discipline.

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
ANALYZER_VERSION = "tlgs_spark.tokenizer v4 (s-stem + derivational subset + ize-family)"

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

_VOWELS = "aeiou"
_VOWELS_Y = "aeiouy"


def _plural_stem(t: str) -> str:
    """Spec step 5a: the Harman S-stemmer (the whole of spec v2)."""
    if t.endswith("ies"):
        return t if t.endswith(("eies", "aies")) else t[:-3] + "y"
    if t.endswith("es"):
        return t if t.endswith(("aes", "ees", "oes")) else t[:-1]
    if t.endswith("s"):
        return t if t.endswith(("us", "ss")) else t[:-1]
    return t


def _post_strip(s: str) -> str:
    """Porter-1b2 subset applied after an ``ing``/``ed`` strip:
    undouble a trailing doubled consonant (not l/s/z); restore ``e``
    on a stem ending ``iz`` (v4 — the -ize family: organiz→organize,
    so -ized/-izing conflate with -ize/-izer/-ization) or on a 3-char
    c-v-c stem (last char not w/x/y — and a 3-char cvc has Porter
    measure exactly 1, so no measure computation is needed)."""
    if len(s) >= 2 and s[-1] == s[-2] and s[-1] not in _VOWELS and s[-1] not in "lsz":
        return s[:-1]
    if len(s) >= 3 and s.endswith(("iz", "yz")):
        return s + "e"
    if (
        len(s) == 3
        and s[0] not in _VOWELS_Y
        and s[1] in _VOWELS
        and s[2] not in _VOWELS_Y
        and s[2] not in "wx"
    ):
        return s + "e"
    return s


def _deriv_stem(t: str) -> str:
    """Spec step 5b: the bounded derivational rules (docstring)."""
    if len(t) >= 6 and t.endswith("ing"):
        s = t[:-3]
        return _post_strip(s) if any(c in _VOWELS_Y for c in s) else t
    if len(t) >= 5 and t.endswith("ied"):
        # the past-tense mirror of the plural ies→y rule: tried→try,
        # applied→apply — conflating with tries/try, applies/apply
        return t if t.endswith(("eied", "aied")) else t[:-3] + "y"
    if len(t) >= 5 and t.endswith("ed") and not t.endswith("eed"):
        s = t[:-2]
        return _post_strip(s) if any(c in _VOWELS_Y for c in s) else t
    if len(t) >= 6 and t.endswith("ly") and t[-3] not in _VOWELS_Y:
        s = t[:-2]
        return s[:-1] if s.endswith("ll") else s
    # v4: the -ize/-yze family's nominal/agentive hops (Porter step 2
    # IZATION→IZE / IZER→IZE; the yz twins cover analyze-type verbs,
    # which Porter conflates through its ER/E rules). ization MUST
    # precede the ion rule, which would otherwise catch it (…t + ion)
    # and strand at …izat.
    if len(t) >= 10 and t.endswith(("ization", "yzation")):
        return t[:-5] + "e"
    if len(t) >= 7 and t.endswith(("izer", "yzer")):
        return t[:-1]
    if len(t) >= 8 and t.endswith("ion") and t[-4] in "st":
        return t[:-3]
    return t


def s_stem(t: str) -> str:
    """Spec step 5 (v4): plural S-stem, then the derivational subset.
    Pure function of the kept token; never lengthens it by more than
    the restored ``e``, never empties it. NOT idempotent (see module
    docstring) — stem exactly once from the raw surface form."""
    if len(t) < STEM_MIN_LEN:
        return t
    return _deriv_stem(_plural_stem(t))


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


_V_SQL = "('a','e','i','o','u')"
_VY_SQL = "('a','e','i','o','u','y')"
_VY_WX_SQL = "('a','e','i','o','u','y','w','x')"
_DOUBLE_EXCL_SQL = "('a','e','i','o','u','l','s','z')"


def _plural_sql_case(e: str) -> str:
    """Step 5a (the whole of spec v2) over expression ``e``. NOTE: no
    length-4 floor here — the composed stem_sql_case applies it once
    at the top, mirroring s_stem."""
    L = f"length({e})"

    def suf(n: int) -> str:
        return f"substr({e}, {L} - {n - 1}, {n})"

    return (
        f"(CASE WHEN {suf(3)} = 'ies' THEN "
        f"(CASE WHEN {suf(4)} IN ('eies', 'aies') THEN {e} "
        f"ELSE substr({e}, 1, {L} - 3) || 'y' END) "
        f"WHEN {suf(2)} = 'es' THEN "
        f"(CASE WHEN {suf(3)} IN ('aes', 'ees', 'oes') THEN {e} "
        f"ELSE substr({e}, 1, {L} - 1) END) "
        f"WHEN {suf(1)} = 's' THEN "
        f"(CASE WHEN {suf(2)} IN ('us', 'ss') THEN {e} "
        f"ELSE substr({e}, 1, {L} - 1) END) "
        f"ELSE {e} END)"
    )


def _deriv_sql_case(e: str) -> str:
    """Step 5b over expression ``e`` — same semantics as _deriv_stem
    (incl. _post_strip) in both DuckDB and Spark SQL (shared surface:
    1-based substr, ||, length, instr)."""
    L = f"length({e})"

    def suf(n: int) -> str:
        return f"substr({e}, {L} - {n - 1}, {n})"

    def ch(pos_from_end: int) -> str:
        # 1 = last char, 2 = second-to-last, ...
        return f"substr({e}, {L} - {pos_from_end - 1}, 1)"

    def head(pos: int) -> str:
        return f"substr({e}, {pos}, 1)"

    def novowel(strip: int) -> str:
        stem = f"substr({e}, 1, {L} - {strip})"
        return (
            "("
            + " + ".join(f"instr({stem}, '{c}')" for c in _VOWELS_Y)
            + ") = 0"
        )

    def post(strip: int) -> str:
        # _post_strip on the stem e[:-strip]: undouble trailing doubled
        # non-l/s/z consonant, else restore 'e' on a stem ending 'iz'
        # (v4: the -ize family) or on a 3-char c-v-c stem. The stem is
        # always >= 3 chars here (ing needs len >= 6, ed needs >= 5),
        # matching _post_strip's len guard.
        return (
            f"(CASE WHEN {ch(strip + 1)} = {ch(strip + 2)} "
            f"AND {ch(strip + 1)} NOT IN {_DOUBLE_EXCL_SQL} "
            f"THEN substr({e}, 1, {L} - {strip + 1}) "
            f"WHEN substr({e}, {L} - {strip + 1}, 2) IN ('iz','yz') "
            f"THEN substr({e}, 1, {L} - {strip}) || 'e' "
            f"WHEN {L} = {strip + 3} AND {head(1)} NOT IN {_VY_SQL} "
            f"AND {head(2)} IN {_V_SQL} AND {head(3)} NOT IN {_VY_WX_SQL} "
            f"THEN substr({e}, 1, 3) || 'e' "
            f"ELSE substr({e}, 1, {L} - {strip}) END)"
        )

    return (
        f"(CASE WHEN {L} >= 6 AND {suf(3)} = 'ing' THEN "
        f"(CASE WHEN {novowel(3)} THEN {e} ELSE {post(3)} END) "
        f"WHEN {L} >= 5 AND {suf(3)} = 'ied' THEN "
        f"(CASE WHEN {suf(4)} IN ('eied', 'aied') THEN {e} "
        f"ELSE substr({e}, 1, {L} - 3) || 'y' END) "
        f"WHEN {L} >= 5 AND {suf(2)} = 'ed' AND {suf(3)} <> 'eed' THEN "
        f"(CASE WHEN {novowel(2)} THEN {e} ELSE {post(2)} END) "
        f"WHEN {L} >= 6 AND {suf(2)} = 'ly' AND {ch(3)} NOT IN {_VY_SQL} THEN "
        f"(CASE WHEN substr({e}, {L} - 3, 2) = 'll' THEN substr({e}, 1, {L} - 3) "
        f"ELSE substr({e}, 1, {L} - 2) END) "
        f"WHEN {L} >= 10 AND {suf(7)} IN ('ization','yzation') THEN "
        f"substr({e}, 1, {L} - 5) || 'e' "
        f"WHEN {L} >= 7 AND {suf(4)} IN ('izer','yzer') THEN "
        f"substr({e}, 1, {L} - 1) "
        f"WHEN {L} >= 8 AND {suf(3)} = 'ion' AND {ch(4)} IN ('s','t') THEN "
        f"substr({e}, 1, {L} - 3) "
        f"ELSE {e} END)"
    )


def stem_sql_case(e: str) -> str:
    """ANSI-SQL rendering of :func:`s_stem` (spec v4: plural then
    derivational) over expression ``e`` — identical semantics in
    DuckDB and Spark SQL (both: 1-based substr, || concat, length,
    instr). The derivational CASE nests the plural CASE as its input
    expression (~90 repetitions), fine for DuckDB's interpreter but
    past the JVM's 64 KB method limit under Spark codegen — Spark
    F.expr sites must use :func:`stem_spark_sql` instead."""
    return (
        f"CASE WHEN length({e}) < {STEM_MIN_LEN} THEN {e} "
        f"ELSE {_deriv_sql_case(_plural_sql_case(e))} END"
    )


def stem_spark_stages(e: str) -> tuple[str, str]:
    """Spark rendering of the SAME spec for F.expr sites, as TWO
    projection stages over the same column name: apply stage 1
    (min-len guard + plural) aliased back to ``e``, then stage 2 (the
    derivational CASE, the identity on tokens shorter than 5) in a
    SECOND ``.select``. Catalyst keeps the projects separate
    (CollapseProject's cost heuristic refuses to inline a non-cheap
    alias referenced ~90×), so each stays well under Janino's 64 KB
    method limit and inside WholeStageCodegen — the composed
    :func:`stem_sql_case` rendering trips the limit under Spark and
    silently drops the whole projection to interpreted eval (a
    higher-order-function lambda binding was measured correct but is
    not codegen-supported at all). Even if a future optimizer DOES
    collapse them, results stay correct — only codegen falls back.

        st1, st2 = stem_spark_stages("term")
        df.select(..., F.expr(st1).alias("term"))
          .select(..., F.expr(st2).alias("term"))
    """
    stage1 = (
        f"CASE WHEN length({e}) < {STEM_MIN_LEN} THEN {e} "
        f"ELSE {_plural_sql_case(e)} END"
    )
    return stage1, _deriv_sql_case(e)


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
