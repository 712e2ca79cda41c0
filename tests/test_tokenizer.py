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
    """Pin the DELIBERATE divergence between spec v2 (Harman
    S-stemmer: plural/singular only) and PG's 'english' Snowball
    config (which also conflates derivational forms). See the
    tokenizer module docstring: this is the frozen contract, and any
    spec change must bump ANALYZER_VERSION."""
    from tlgs_spark.tokenizer import s_stem, tokenize

    # what the spec DOES normalize (plural/singular)
    assert s_stem("windows") == "window"
    assert s_stem("queries") == "query"
    assert s_stem("branches") == "branche"  # -es rule drops one 's' only
    assert s_stem("classes") == "classe"
    assert s_stem("boss") == "boss"  # -ss guard
    assert s_stem("virus") == "virus"  # -us guard
    # what the spec deliberately does NOT do (PG english would):
    # derivational suffixes stay distinct terms
    assert s_stem("running") == "running"  # PG: run
    assert s_stem("connection") == "connection"  # PG: connect
    assert s_stem("quickly") == "quickly"  # PG: quick
    # the retrieval consequence, pinned end-to-end at analyzer level:
    # a "run" query cannot match a "running" document...
    assert set(tokenize("run")).isdisjoint(tokenize("running fast"))
    # ...while the plural gap IS closed
    assert set(tokenize("window")) & set(tokenize("many windows"))


def test_stemmer_divergence_retrieval(spark, search_index):
    """Engine-level pin of the divergence: plural query forms hit the
    singular-stemmed index; derivational forms do not create matches
    that the analyzer did not promise."""
    from tlgs_spark.query.engine import EmptyQueryError
    from tlgs_spark.tokenizer import tokenize_query

    si = search_index
    # plural and singular queries resolve to the same analyzed terms,
    # hence the same ranked results
    a = si.search("tok0000 tok0001", k=5, mode="and")
    b = si.search("tok0000s tok0001s", k=5, mode="and")
    assert list(a.doc_id) == list(b.doc_id)
    # derivational variants are different terms end to end
    assert tokenize_query("running") == ["running"]
    assert tokenize_query("runs") == ["run"]
