"""Frozen tokenizer spec + hygiene rules (ported operator tables from
tlgsutils/tests/utils_test.cpp:4-70 and gemini_parser_test.cpp, adapted
to the transcript payload per FIXTURES.md §5)."""

from tlgs_spark.tokenizer import (
    MAX_TOKEN_LEN,
    STOPWORDS,
    clean_text,
    term_freqs,
    tokenize,
    tokenize_query,
)


def test_basic():
    assert tokenize("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize("foo_bar-baz") == ["foo", "bar", "baz"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_stopwords_dropped():
    assert tokenize("the cat and a dog") == ["cat", "dog"]
    assert "the" in STOPWORDS and "with" in STOPWORDS


def test_long_token_dropped():
    long = "x" * (MAX_TOKEN_LEN + 1)
    assert tokenize(f"ok {long} fine") == ["ok", "fine"]
    assert tokenize("y" * MAX_TOKEN_LEN) == ["y" * MAX_TOKEN_LEN]


def test_hygiene_separator_lines():
    # analog of utils.cpp isAsciiArt: separator / repeated-char lines
    assert tokenize("keep\n----\nalso", hygiene=True) == ["keep", "also"]
    assert tokenize("keep\n====\nalso", hygiene=True) == ["keep", "also"]
    assert tokenize("q\n****\nz", hygiene=True) == ["q", "z"]
    # without hygiene the separators simply produce no tokens anyway,
    # but repeated word chars would:
    assert tokenize("xxxx", hygiene=True) == []
    assert tokenize("xxxx", hygiene=False) == ["xxxx"]


def test_hygiene_box_drawing_and_blocks():
    assert tokenize("tree\n│ node x\nend", hygiene=True) == ["tree", "end"]
    assert tokenize("q\n████\nz", hygiene=True) == ["q", "z"]
    assert tokenize("q\n└── leaf\nz", hygiene=True) == ["q", "z"]


def test_hygiene_keeps_normal_lines():
    t = "normal line here\nanother normal one"
    assert clean_text(t) == t


def test_term_freqs():
    tf = term_freqs("dog cat dog dog")
    assert tf == {"dog": 3, "cat": 1}


def test_query_tokenize_dedup_keeps_order():
    assert tokenize_query("Dog CAT dog bird cat") == ["dog", "cat", "bird"]
    assert tokenize_query("the and of") == []


# ---------------------------------------------------------------------------
# property-based spec lock: Python stemmer ≡ its SQL rendering (DuckDB)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=12))
def test_s_stem_sql_rendering_matches_python(token):
    import duckdb

    from tlgs_spark.tokenizer import s_stem, stem_sql_case

    lit = "'" + token + "'"
    got = duckdb.sql(f"SELECT {stem_sql_case(lit)} AS s").fetchone()[0]
    assert got == s_stem(token)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefghij s.AB-", min_size=0, max_size=20), min_size=0, max_size=5
    )
)
def test_tokens_cte_matches_python_tokenize(lines):
    """Random texts through tokens_cte_sql (DuckDB) vs tokenize()
    (Python): same (term → tf) multiset under spec v2 (stemmed)."""
    from collections import Counter

    import duckdb

    from tlgs_spark.tokenizer import term_freqs, tokens_cte_sql

    text = "\n".join(lines)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 0::BIGINT AS doc_id, ? AS text", [text])
    rows = con.execute(
        f"WITH {tokens_cte_sql()} SELECT term, tf FROM tf"
    ).fetchall()
    assert Counter(dict(rows)) == Counter(term_freqs(text))


def test_stemmer_divergence_contract():
    """Pin the DELIBERATE divergence between spec v4 (Harman S-stemmer
    + bounded derivational subset + the -ize/-yze family) and PG's
    'english' Snowball config. See the tokenizer module docstring:
    this is the frozen contract, and any spec change must bump
    ANALYZER_VERSION."""
    from tlgs_spark.tokenizer import s_stem, tokenize

    # what the spec DOES normalize — plural/singular (5a, unchanged)
    assert s_stem("windows") == "window"
    assert s_stem("queries") == "query"
    assert s_stem("branches") == "branche"  # -es rule drops one 's' only
    assert s_stem("classes") == "classe"
    assert s_stem("boss") == "boss"  # -ss guard
    assert s_stem("virus") == "virus"  # -us guard
    # — derivational subset (5b, new in v3)
    assert s_stem("running") == "run"  # -ing + undouble
    assert s_stem("looking") == "look"
    assert s_stem("making") == "make"  # 3-char cvc restores the e
    assert s_stem("hoping") == "hope"
    assert s_stem("hopping") == "hop"  # doubling disambiguates
    assert s_stem("edited") == "edit"
    assert s_stem("stopped") == "stop"
    assert s_stem("missed") == "miss"  # ss never undoubles
    assert s_stem("falling") == "fall"  # ll never undoubles
    assert s_stem("agreed") == "agreed"  # -eed excluded (feed/exceed)
    assert s_stem("quickly") == "quick"
    assert s_stem("really") == "real"  # ly after ll undoubles
    assert s_stem("family") == "family"  # vowel before -ly: keep
    assert s_stem("connection") == "connect"  # -ion after s/t, len>=8
    assert s_stem("action") == "action"  # len guard ~ Porter m>1
    assert s_stem("string") == "string"  # vowelless stem: keep
    assert s_stem("using") == "using"  # -ing needs len >= 6
    assert s_stem("tried") == "try"  # -ied mirrors plural ies→y
    assert s_stem("applied") == "apply"
    assert s_stem("died") == "died"  # -ied needs len >= 5
    # — the -ize/-yze family (new in v4)
    assert s_stem("organization") == "organize"  # ization→ize hop
    assert s_stem("organizations") == "organize"  # plural chains in
    assert s_stem("organizer") == "organize"  # izer→ize hop
    assert s_stem("organized") == "organize"  # iz-stem regains the e
    assert s_stem("organizing") == "organize"
    assert s_stem("analyzer") == "analyze"  # yz twin (Porter's ER rule)
    assert s_stem("analyzed") == "analyze"
    assert s_stem("prized") == "prize"  # iz e-restore past the cvc rule
    assert s_stem("sizer") == "sizer"  # izer needs len >= 7 (m>0-ish)
    assert s_stem("citizen") == "citizen"  # no suffix match: untouched
    # what the spec deliberately does NOT do (PG english would):
    assert s_stem("happiness") == "happiness"  # -ss guard (PG: happi)
    assert s_stem("argument") == "argument"  # -ment untouched
    # v3 is NOT idempotent — the single-stem discipline is the
    # compensating contract (see test_single_stem_discipline)
    assert s_stem("preceded") == "preced"
    assert s_stem(s_stem("preceded")) == "prec"
    # the retrieval consequence, pinned end-to-end at analyzer level:
    # a "run" query NOW matches a "running" document (r3 VERDICT ask)…
    assert set(tokenize("run")) & set(tokenize("running fast"))
    # …the plural gap stays closed…
    assert set(tokenize("window")) & set(tokenize("many windows"))
    # …and out-of-ruleset derivational forms stay distinct
    assert set(tokenize("argue")).isdisjoint(tokenize("strong argument"))


def test_single_stem_discipline():
    """Spec v3 is not idempotent, so every call site must stem exactly
    once from the surface form. make_snippet's term contract is the
    one place that used to rely on idempotence: it must NOT re-stem
    the (already-analyzed) terms it receives."""
    from tlgs_spark.query.snippet import make_snippet
    from tlgs_spark.tokenizer import tokenize_query

    terms = tokenize_query("preceded")  # -> ["preced"]
    assert terms == ["preced"]
    snip = make_snippet("this preceded that event yesterday", terms)
    assert "[preceded]" in snip  # re-stemming would miss the highlight


def test_stemmer_divergence_retrieval(spark, search_index):
    """Engine-level pin of the divergence: plural AND in-ruleset
    derivational query forms hit the stemmed index; out-of-ruleset
    forms do not create matches the analyzer did not promise."""
    from tlgs_spark.query.engine import EmptyQueryError
    from tlgs_spark.tokenizer import tokenize_query

    si = search_index
    # plural and singular queries resolve to the same analyzed terms,
    # hence the same ranked results
    a = si.search("tok0000 tok0001", k=5, mode="and")
    b = si.search("tok0000s tok0001s", k=5, mode="and")
    assert list(a.doc_id) == list(b.doc_id)
    # derivational variants inside the v3 ruleset conflate end to end
    assert tokenize_query("running") == ["run"]
    assert tokenize_query("runs") == ["run"]
    # outside the ruleset they stay distinct
    assert tokenize_query("argument") == ["argument"]
