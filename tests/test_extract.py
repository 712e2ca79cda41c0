"""Document-extraction stage (crawler.cpp:415-496 semantics): charset
decode + binary sniff, MIME dispatch, feed classification, status-1x
bodies, title truncation — pure function + mapInPandas rendering."""

import pytest

from tlgs_spark.ops.extract import decode_to_utf8, extract_document, extract_documents

GEMTEXT = "# My Capsule\nHello world\n=> gemini://a.example/1 one\n"


def test_decode_basic_and_charset():
    assert decode_to_utf8("héllo".encode("utf-8"), "utf-8") == "héllo"
    assert decode_to_utf8("héllo".encode("latin-1"), "latin-1") == "héllo"
    assert decode_to_utf8(b"", "utf-8") == ""
    # unknown charset falls back to utf-8-ignore rather than failing
    assert decode_to_utf8(b"abc", "no-such-charset") == "abc"


def test_binary_sniff_rejects():
    # mostly non-UTF8 garbage: decoded length collapses below 1/5
    raw = bytes([0xFF, 0xFE, 0xFD, 0xFC, 0xFB] * 100) + b"hi"
    assert decode_to_utf8(raw, "utf-8") is None


def test_gemini_extraction_and_gemsub():
    d = extract_document("gemini://h/x", 20, "text/gemini", "utf-8", GEMTEXT.encode())
    assert d["title"] == "My Capsule"
    assert "Hello world" in d["body"]
    assert d["links"] == ["gemini://a.example/1"]
    assert d["feed_type"] is None
    feed_body = (
        "# log\n"
        "=> /p3 2023-03-01 three\n"
        "=> /p2 2023-02-01 two\n"
        "=> /p1 2023-01-01 one\n"
    )
    d = extract_document("gemini://h/log", 20, "text/gemini", "utf-8", feed_body.encode())
    assert d["feed_type"] == "gemsub"


def test_title_falls_back_to_url_and_truncates():
    d = extract_document("gemini://h/x", 20, "text/gemini", "utf-8", b"plain line\n")
    assert d["title"] == "gemini://h/x"
    long_title = "# " + "t" * 2000 + "\nbody\n"
    d = extract_document("gemini://h/x", 20, "text/gemini", "utf-8", long_title.encode())
    assert len(d["title"]) == 1000


@pytest.mark.parametrize("mime", ["text/plain", "plaintext", "text/markdown", "text/x-rst"])
def test_plain_mimes_body_passthrough(mime):
    d = extract_document("gemini://h/doc", 20, mime, "utf-8", b"raw body text")
    assert d["body"] == "raw body text"
    assert d["title"] == "gemini://h/doc"
    assert d["feed_type"] is None


def test_twtxt_by_path_suffix():
    d = extract_document("gemini://h/twtxt.txt", 20, "text/plain", "utf-8", b"x")
    assert d["feed_type"] == "twtxt"
    d = extract_document("gemini://h/twtxt.txt?page=2", 20, "text/plain", "utf-8", b"x")
    assert d["feed_type"] == "twtxt"


@pytest.mark.parametrize(
    "mime,feed", [("application/rss+xml", "rss"), ("application/atom+xml", "atom"), ("image/png", None)]
)
def test_other_mimes_empty_body(mime, feed):
    d = extract_document("gemini://h/f", 20, mime, "utf-8", b"\x89PNG...")
    assert d["body"] == "" and d["size"] == 0
    assert d["feed_type"] == feed


def test_status_1x_indexes_meta_as_body():
    d = extract_document("gemini://h/search", 10, None, "utf-8", b"Enter a query")
    assert d["body"] == "Enter a query"


def test_bad_status_dropped():
    assert extract_document("gemini://h/x", 51, "text/gemini", "utf-8", b"hi") is None
    assert extract_document("gemini://h/x", 30, "text/gemini", "utf-8", b"hi") is None


def test_extract_documents_spark(spark):
    rows = [
        ("gemini://h/a", 20, "text/gemini", "utf-8", GEMTEXT.encode()),
        ("gemini://h/b", 20, "text/plain", "utf-8", b"plain"),
        ("gemini://h/c", 20, "image/png", None, bytes([0xFF] * 100)),  # binary reject
        ("gemini://h/d", 51, "text/gemini", "utf-8", b"gone"),  # bad status
        ("gemini://h/e", None, "text/plain", "utf-8", b"null status"),  # NaN via Arrow
    ]
    df = spark.createDataFrame(
        rows, "url string, status int, mime string, charset string, raw binary"
    )
    out = {r.url: r for r in extract_documents(df).collect()}
    # null status defaults to 20 (indexable) instead of crashing the stage
    assert set(out) == {"gemini://h/a", "gemini://h/b", "gemini://h/e"}
    assert out["gemini://h/e"].body == "null status"
    assert out["gemini://h/a"].title == "My Capsule"
    assert out["gemini://h/a"].links == ["gemini://a.example/1"]
    assert out["gemini://h/b"].body == "plain"
