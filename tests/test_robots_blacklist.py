"""robots.txt parser + wildcard matcher + URL blacklist — the reference's
own test tables (tlgsutils/tests/robots_txt_parser_test.cpp,
tests/url_blacklist_test.cpp) ported, plus Spark column-rendering parity."""

import pytest

from tlgs_spark.ops.blacklist import UrlBlacklist, blacklist_column, in_blacklist
from tlgs_spark.ops.robots import (
    blocked_path_column,
    is_path_blocked,
    parse_robots_txt,
    wildcard_path_match,
)

# --- parseRobotsTxt (robots_txt_parser_test.cpp:4-126) ----------------------

ROBOTS_CASES = [
    ("User-agent: *\nDisallow: /\n", {"*"}, ["/"]),
    ("User-agent: gus\nDisallow: /\n", {"tlgs"}, []),
    (
        "User-agent: gus\nDisallow: /\n\nUser-agent: tlgs\nDisallow: /mydir",
        {"tlgs"},
        ["/mydir"],
    ),
    ("User-agent: gus\nUser-agent: tlgs\nDisallow: /\n", {"tlgs"}, ["/"]),
    ("User-agent: gus\nUser-agent: tlgs\nDisallow: /\n", {"gus"}, ["/"]),
    # empty Disallow clears the accumulated set (allow-all reset)
    (
        "User-agent: *\nDisallow: /\n\nUser-agent: tlgs\nDisallow: \n",
        {"tlgs", "*"},
        [],
    ),
    ("User-agent: *\nDisallow: /\n\nUser-agent: tlgs\nDisallow: \n", {"*"}, ["/"]),
    ("", {"tlgs", "*"}, []),
    (
        "User-agent: indexer\nDisallow: /test\nUser-agent: researcher\nDisallow: /\n",
        {"indexer", "*"},
        ["/test"],
    ),
    # case-insensitive keys
    ("user-agent: indexer\nDisallow: /test\n", {"indexer", "*"}, ["/test"]),
    ("User-agent: indexer\ndisallow: /test\n", {"indexer", "*"}, ["/test"]),
    ("User-AGEnT: indexer\ndisalloW: /test\n", {"indexer", "*"}, ["/test"]),
    # whitespace tolerance
    ("User-agent: \tindexer\nDisallow:         /test\n", {"indexer", "*"}, ["/test"]),
    ("        User-agent: indexer\n        Disallow: /test\n", {"indexer", "*"}, ["/test"]),
    # CRLF
    ("User-agent: indexer\r\nDisallow: /test\r\n", {"indexer", "*"}, ["/test"]),
    # rules before any User-agent line apply to everyone
    ("Disallow: /foo\n", {"indexer"}, ["/foo"]),
]


@pytest.mark.parametrize("text,agents,expected", ROBOTS_CASES)
def test_parse_robots_txt(text, agents, expected):
    assert parse_robots_txt(text, agents) == expected


# --- wildcardPathMatch (robots_txt_parser_test.cpp:128-157) -----------------

BLOCKED_PATH_CASES = [
    ("/", "/", True),
    ("/foo", "/", True),
    ("/bar", "/foo", False),
    ("/foo", "/foobar", False),
    ("/foo", "/foo/", False),
    ("/foo/", "/foo", True),
    ("/foo/bar/", "/foo", True),
    ("/foo/", "/foo/bar", False),
    ("/foo.txt", "/foo", False),
    ("/foo/bar.txt", "/foo", True),
    ("/foo/bar.txt", "/foo/*", True),
    ("/foo/bar.txt", "*.txt", True),
    ("/foo/bar.txt", "*.ogg", False),
    ("/foo/dir1/bar.txt", "*.txt", True),
    ("/foo/dir1/bar.txt", "*.txt$", True),
    ("/foo/some_dir/bar.txt", "*some_dir*", True),
    ("/foo/other_dir/bar.txt", "*some_dir*", False),
    ("/foo/other_dir/baz/bar.txt", "/foo/*/baz", True),
    ("/~testuser/gci-bin/test.txt", "/~*/cgi-bin/", True),
    ("/foo/123/bar/456/baz", "/foo/*/bar/*/baz", True),
    ("/foo/123/bar/baz", "/foo/*/bar/*/baz", False),
    ("/foo/123/bar/baz", "/foo/*/bar/*", True),
    ("/foo", "/***", True),
    # regex metacharacters escaped
    ("/foo/(", "/foo/(", True),
    ("/foo/asd/bar/1mp3", "/*/asd/*/.mp3", False),
    ("/foo/\\*", "/foo/*", True),
]


@pytest.mark.parametrize("path,pattern,expected", BLOCKED_PATH_CASES)
def test_wildcard_path_match(path, pattern, expected):
    assert wildcard_path_match(pattern, path) is expected


def test_is_path_blocked_any():
    assert is_path_blocked("/foo/x", ["/bar", "/foo"]) is True
    assert is_path_blocked("/baz", ["/bar", "/foo"]) is False
    assert is_path_blocked("/x", []) is False
    assert is_path_blocked("/x", "") is False  # empty pattern never matches


def test_blocked_path_column_matches_python(spark):
    """Spark column rendering ≡ the Python matcher over the full
    reference table — one action, all cases as literal expressions."""
    from pyspark.sql import functions as F

    exprs = [
        blocked_path_column(F.lit(path), [pattern]).alias(f"c{i}")
        for i, (path, pattern, _) in enumerate(BLOCKED_PATH_CASES)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, (path, pattern, expected) in enumerate(BLOCKED_PATH_CASES):
        assert row[f"c{i}"] is expected, (path, pattern)


# --- UrlBlacklist (url_blacklist_test.cpp) ----------------------------------


def test_url_blacklist_table():
    bl = UrlBlacklist()
    bl.add("gemini://example.com/")
    assert bl.is_blocked("gemini://") is False
    assert bl.is_blocked("gemini://example.com/") is True
    assert bl.is_blocked("gemini://example.com/index.gmi") is True
    assert bl.is_blocked("gemini://example.com") is True
    assert bl.is_blocked("gemini://example.org/") is False

    bl.add("gemini://example.org/")
    assert bl.is_blocked("gemini://example.org/") is True
    assert bl.is_blocked("gemini://example.org/index.gmi") is True

    bl.add("gemini://example.net/cgi-bin")
    assert bl.is_blocked("gemini://example.net/cgi-bin/get-data?123456") is True
    assert bl.is_blocked("gemini://example.net/cgi-bin/get-data?123456#123") is True
    assert bl.is_blocked("gemini://example.net/cgi-bin") is True
    assert bl.is_blocked("gemini://example.net/data/cgi-bin") is False

    assert bl.is_blocked("gemini://example.online/") is False
    assert bl.is_blocked("gemini://example") is False
    assert bl.is_blocked("http://example.com") is False

    bl.add("gemini://example.gov/data/")
    assert bl.is_blocked("gemini://example.gov/data") is False
    # path normalization folds ../
    assert bl.is_blocked("gemini://example.gov/test/../data/") is True

    bl.add("gemini://example.gov/data3")
    assert bl.is_blocked("gemini://example.gov/data3#test") is True


def test_url_blacklist_default_port_elision():
    bl = UrlBlacklist(["gemini://example.com/"])
    assert bl.is_blocked("gemini://example.com:1965/page") is True
    assert bl.is_blocked("gemini://example.com:1966/page") is False


def test_url_blacklist_rejects_bad_url():
    with pytest.raises(ValueError):
        UrlBlacklist().add("not a url")


# --- in_blacklist heuristics (blacklist.cpp:283-350) ------------------------

HEURISTIC_CASES = [
    ("gemini://ok.example/posts/2021/hello.gmi", False),
    ("gemini://ok.example/robots.txt", True),
    ("gemini://127.0.0.5/page", True),
    ("gemini://myhost.local/page", True),
    ("gemini://myhost.onion/page", True),
    ("gemini://host/git/repo", True),
    ("gemini://git.host/repo", True),
    ("gemini://host/proj.git/tree/main", True),
    ("gemini://host/x/git.sh", True),
    ("gemini://host/~xkcd/42", True),
    ("gemini://host/orbit/next", True),
    ("gemini://host/orbit/prev.gmi", True),
    ("gemini://host/ring/rand.cgi", True),
    ("gemini://host/a/rfc-mirror/b", True),
    # ≥3 repeated components blocked, 2 allowed
    ("gemini://host/cgi/cgi/cgi/x", True),
    ("gemini://host/image/gemlog/2020/images", False),
    ("gemini://host/commits/abc123/diff", True),
    ("gemini://host/commits/abc123.patch", True),
    ("gemini://host/commits/", False),
    ("gemini://host/path\x01ctl", True),
]


@pytest.mark.parametrize("url,expected", HEURISTIC_CASES)
def test_in_blacklist_heuristics(url, expected):
    assert in_blacklist(url) is expected


def test_in_blacklist_domains_and_rules():
    bl = UrlBlacklist(["gemini://spam.example/"])
    assert in_blacklist("gemini://localhost/x", domains={"localhost"}) is True
    assert in_blacklist("gemini://spam.example/anything", url_rules=bl) is True
    assert in_blacklist("gemini://fine.example/x", domains={"localhost"}, url_rules=bl) is False


def test_blacklist_column_matches_python(spark):
    from pyspark.sql import functions as F

    urls = [u for u, _ in HEURISTIC_CASES if "\x01" not in u]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.blocked
        for r in df.select("url", blacklist_column(F.col("url")).alias("blocked")).collect()
    }
    for u in urls:
        assert got[u] is in_blacklist(u), u


def test_reference_quirks_pinned():
    """Two deliberate reference-parity quirks (tlgs uses the same
    greedy line regex and the same len+1 boundary — see
    robots_txt_parser.cpp:17,75). These pins document that we ship the
    reference's behavior, not an 'improved' divergence."""
    from tlgs_spark.ops.robots import parse_robots_txt, wildcard_path_match

    # greedy key group: a ':' in the value mis-keys and DROPS the rule
    assert parse_robots_txt("User-agent: *\nDisallow: /a:b/c\n", {"*"}) == []
    # len+1 boundary: the one-char child of a slash-terminated pattern
    # escapes; the two-char child is blocked
    assert not wildcard_path_match("/priv/", "/priv/a")
    assert wildcard_path_match("/priv/", "/priv/ab")
    assert wildcard_path_match("/priv/", "/priv/")
    assert not wildcard_path_match("/priv/", "/priv")  # parent itself: no exact/+'/' arm matches


def test_commits_rule_first_occurrence(spark):
    """blacklist.cpp:341-346 matches the commit regex from the FIRST
    'commits/' occurrence only; the column rendering must agree with
    the Python predicate on URLs where a LATER occurrence matches."""
    from pyspark.sql import functions as F

    from tlgs_spark.ops.blacklist import blacklist_column, in_blacklist

    urls = [
        "gemini://h/commits/!/commits/abc1/f",  # first occ fails -> allowed
        "gemini://h/commits/abc1/diff",         # first occ matches -> blocked
        "gemini://h/plain/page",
    ]
    py = [in_blacklist(u) for u in urls]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    col = [
        r.b for r in df.select(blacklist_column(F.col("url")).alias("b"))
        .collect()
    ]
    assert py == col == [False, True, False]
