"""Query-grammar parity with parseSearchQuery / parseSizeUnits
(tlgs/server/controllers/search.cpp:143-244)."""

import pytest

from tlgs_spark.query.parser import (
    eval_filter_row,
    parse_search_query,
    parse_size_value,
)


def test_plain_terms():
    text, filt = parse_search_query("hello world")
    assert text == "hello world" and filt.is_empty()


def test_filter_extraction():
    text, filt = parse_search_query("query tool:bash role:assistant")
    assert text == "query"
    assert filt.tool == [("bash", False)]
    assert filt.role == [("assistant", False)]


def test_reference_key_aliases():
    _, filt = parse_search_query("x content_type:bash domain:conv000001 intitle:y")
    assert filt.tool == [("bash", False)]
    assert filt.conv == [("conv000001", False)]
    assert filt.infirst == [("y", False)]


def test_not_binds_to_following_filter():
    text, filt = parse_search_query("x NOT tool:bash")
    assert text == "x"
    assert filt.tool == [("bash", True)]


def test_not_before_text_stays_text():
    text, filt = parse_search_query("x NOT y")
    assert text == "x NOT y" and filt.is_empty()


def test_trailing_not_stays_text():
    text, filt = parse_search_query("x NOT")
    assert text == "x NOT"


def test_intitle_terms_rejoin_text_query():
    # search.cpp:240-243 — intitle values are appended to the text query
    text, filt = parse_search_query("alpha infirst:beta")
    assert text == "alpha beta"
    assert filt.infirst == [("beta", False)]


@pytest.mark.parametrize(
    "spec,expected",
    [
        (">100", (">", 100.0)),
        ("<5", ("<", 5.0)),
        (">1K", (">", 1e3)),
        (">1Ki", (">", 1024.0)),
        ("<2M", ("<", 2e6)),
        ("<2Mi", ("<", 2 * 2**20)),
        (">1G", (">", 1e9)),
        (">1Gi", (">", 2**30)),
        (">1.5K", (">", 1500.0)),
        (">100b", (">", 100.0)),
        (">1kb", (">", 1e3)),
        (">1kib", (">", 1024.0)),
        (">2byte", (">", 2.0)),
    ],
)
def test_size_units(spec, expected):
    assert parse_size_value(spec) == expected


def test_bad_size_token_dropped():
    # an unparseable size filter vanishes from the query entirely
    # (search.cpp:211-221 `continue`), it does NOT become a text term
    text, filt = parse_search_query("x size:huge")
    assert text == "x" and not filt.size


def test_bad_size_consumes_pending_not():
    # NOT binds to the (key-classified) filter token before the value
    # is validated, so both vanish together
    text, filt = parse_search_query("x NOT size:>10zz")
    assert text == "x" and not filt.size


def test_negated_size_flips_direction():
    # negate^greater folded at parse (search.cpp:224): NOT size:>N is
    # size<N strictly — disagrees with outcome-XOR exactly at size==N
    _, filt = parse_search_query("x NOT size:>1000")
    assert filt.size == [("<", 1000)]
    assert not eval_filter_row(filt, None, None, "c", 1000, frozenset())
    assert eval_filter_row(filt, None, None, "c", 999, frozenset())


def test_negated_intitle_value_joins_text_query():
    # every title value — negated included — rejoins the text query
    # after the loop (search.cpp:240-243)
    text, filt = parse_search_query("x NOT infirst:y")
    assert text == "x y"
    assert filt.infirst == [("y", True)]


def test_size_unit_grammar_quirks():
    # parseSizeUnits strips at most ONE trailing 'b' (len > 1): 'bb'
    # parses, 'kbyte' does not (search.cpp:146-164)
    assert parse_size_value(">1bb") == (">", 1)
    assert parse_size_value(">1kbyte") is None
    assert parse_size_value(">1byteb") == (">", 1)


def test_size_value_stod_and_size_t_semantics():
    # stod parses the longest valid prefix; size_t truncates
    assert parse_size_value(">1.2.3") == (">", 1)
    assert parse_size_value(">0.5ki") == (">", 512)
    assert parse_size_value(">0.9") == (">", 0)
    assert parse_size_value(">.") is None


def test_eval_filter_or_within_and_across():
    # two tool constraints OR; role constraint ANDs with them
    _, filt = parse_search_query("q tool:bash tool:search role:user")
    assert eval_filter_row(filt, "bash", "user", "c", 10, frozenset())
    assert eval_filter_row(filt, "search", "user", "c", 10, frozenset())
    assert not eval_filter_row(filt, "editor", "user", "c", 10, frozenset())
    assert not eval_filter_row(filt, "bash", "assistant", "c", 10, frozenset())


def test_eval_filter_negation_xor():
    _, filt = parse_search_query("q NOT tool:bash")
    assert not eval_filter_row(filt, "bash", "user", "c", 10, frozenset())
    assert eval_filter_row(filt, "editor", "user", "c", 10, frozenset())


def test_eval_filter_size_zero_excluded():
    # size==0 docs excluded whenever a size filter exists (search.cpp:646-649)
    _, filt = parse_search_query("q size:>1")
    assert not eval_filter_row(filt, None, None, "c", 0, frozenset())
    assert eval_filter_row(filt, None, None, "c", 5, frozenset())


def test_eval_filter_prefix_match_tool():
    # content_type uses prefix match (search.cpp:667) → tool analog
    _, filt = parse_search_query("q tool:ba")
    assert eval_filter_row(filt, "bash", None, "c", 1, frozenset())


def test_eval_filter_infirst():
    _, filt = parse_search_query("q infirst:alpha")
    assert eval_filter_row(filt, None, None, "c", 1, frozenset({"alpha", "x"}))
    assert not eval_filter_row(filt, None, None, "c", 1, frozenset({"beta"}))
