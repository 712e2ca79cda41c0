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
