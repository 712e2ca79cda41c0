"""URL toolkit (F14-F17), gemtext extraction (F19/F20), MIME parse
(F21), hex→u64 (F10), admission control (W5), purge (S8) — operator
tables ported from the reference's own unit tests."""

import pytest

from tlgs_spark.ops.gemtext import GeminiDocument, is_gemsub, parse_gemtext
from tlgs_spark.ops.urls import (
    is_non_uri_action,
    link_compose,
    normalize_url,
    url_decode,
    url_encode,
)
from tlgs_spark.utils import hex_to_u64, parse_mime


# --- URLs (url_parser_test.cpp semantics) ---

def test_default_port_elided():
    assert normalize_url("gemini://example.com:1965/") == "gemini://example.com/"
    assert normalize_url("http://example.com:80/") == "http://example.com/"
    assert normalize_url("gemini://example.com:1966/") == "gemini://example.com:1966/"


def test_path_lexical_normalization():
    # url_parser_test.cpp:58-61: /a/../b → /b
    assert normalize_url("gemini://h/a/../b") == "gemini://h/b"
    assert normalize_url("gemini://h/a/./b/") == "gemini://h/a/b/"


def test_case_normalization():
    assert normalize_url("GEMINI://ExAmPle.COM/Path") == "gemini://example.com/Path"


def test_bad_urls_rejected():
    # url_parser_test.cpp:88-89: leading-dot host rejected
    assert normalize_url("gemini://.example.com/") is None
    assert normalize_url("not a url") is None
    assert normalize_url("gemini://h/\x01x") is None


@pytest.mark.parametrize(
    "base,link,expected",
    [
        ("gemini://h/dir/page", "other", "gemini://h/dir/other"),
        ("gemini://h/dir/page", "/abs", "gemini://h/abs"),
        ("gemini://h/dir/sub/", "../up", "gemini://h/dir/up"),
        ("gemini://h/", "gemini://other/x", "gemini://other/x"),
        ("gemini://h/a/b", "//c/d", "gemini://c/d"),
    ],
)
def test_link_compose(base, link, expected):
    assert link_compose(base, link) == expected


def test_non_uri_action():
    assert is_non_uri_action("mailto:x@y.z")
    assert is_non_uri_action("javascript:void(0)")
    assert not is_non_uri_action("gemini://h/")
    assert not is_non_uri_action("relative/path")


def test_url_codec():
    assert url_encode("a b/c") == "a%20b%2Fc"
    assert url_decode("a+b%2Fc") == "a b/c"


# --- gemtext (gemini_parser_test.cpp:8-65 semantics) ---

def test_gemtext_nodes():
    doc = parse_gemtext(
        "# Title\n## Sub\ntext line\n=> gemini://h/x  A link\n=>gemini://h/y\n"
    )
    assert doc.title == "Title"
    assert ("gemini://h/x", "A link") in doc.links
    assert ("gemini://h/y", "") in doc.links
    assert "text line" in doc.text and "Sub" in doc.text


def test_gemtext_first_heading_is_title():
    doc = parse_gemtext("intro\n# First\n# Second\n")
    assert doc.title == "First"


def test_gemtext_preformatted_art_dropped():
    body = "keep\n```ascii art banner\nXX  XX\n```\nalso\n"
    doc = parse_gemtext(body, concise=True)
    assert "XX  XX" not in doc.text
    assert "keep" in doc.text and "also" in doc.text
    # code blocks with a meaningful meta survive
    doc2 = parse_gemtext("```python\nx = 1\n```\n", concise=True)
    assert "x = 1" in doc2.text


def test_gemtext_junk_lines_dropped():
    doc = parse_gemtext("a\n-----------\n│ tree\n=====\nb\n", concise=True)
    assert "tree" not in doc.text
    assert "---" not in doc.text and "===" not in doc.text


def test_gemsub_detection():
    feed = "\n".join(
        f"=> gemini://h/p{i} 2024-0{i+1}-15 Post {i}" for i in range(3)
    )
    assert is_gemsub("# My Gemlog\n" + feed)
    assert not is_gemsub("=> gemini://h/a 2024-01-01 One\n=> gemini://h/b Two")
    # run must be consecutive (gemini_parser_test.cpp:124-232)
    broken = (
        "=> gemini://h/a 2024-01-01 x\ntext\n"
        "=> gemini://h/b 2024-01-02 y\ntext\n=> gemini://h/c 2024-01-03 z"
    )
    assert not is_gemsub(broken)


def test_gemtext_spark_extraction(spark):
    from tlgs_spark.ops.gemtext import extract_gemtext_df

    rows = [
        (0, "# T\n=> gemini://h/a 2024-01-01 a\n=> gemini://h/b 2024-01-02 b\n=> gemini://h/c 2024-01-03 c"),
        (1, "plain text only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in extract_gemtext_df(df).collect()}
    assert out[0].title == "T" and out[0].is_feed
    assert out[1].title is None and not out[1].is_feed
    assert len(out[0].links) == 3


# --- misc utils ---

def test_hex_to_u64():
    assert hex_to_u64("C49AACF8080FE47F") == 0xC49AACF8080FE47F


def test_parse_mime():
    mime, params = parse_mime('text/gemini; charset=UTF-8; lang="en"')
    assert mime == "text/gemini"
    assert params == {"charset": "UTF-8", "lang": "en"}


# --- W5 admission control ---

def test_admission_control(search_index):
    from tlgs_spark.query.engine import TooManyRequestsError

    search_index._in_flight = search_index.max_in_flight
    try:
        with pytest.raises(TooManyRequestsError) as ei:
            search_index.search("tok0000", k=5)
        assert ei.value.retry_after == pytest.approx(2.0, abs=1e-9)  # 2^(64/64)
    finally:
        search_index._in_flight = 0
    # and it works again afterwards
    assert len(search_index.search("tok0000", k=5)) > 0


def test_unlabeled_code_block_kept():
    """Reference parity (gemini_parser.cpp:43-66): concise extraction
    keeps preformatted blocks with EMPTY meta — only art-keyword metas
    drop. Unlabeled ``` code blocks are the common case."""
    from tlgs_spark.ops.gemtext import parse_gemtext

    doc = parse_gemtext("before\n```\ndef f(): pass\n```\nafter\n", concise=True)
    assert "def f(): pass" in doc.text
    doc2 = parse_gemtext("a\n```ascii art\nXX\n```\nb\n", concise=True)
    assert "XX" not in doc2.text
