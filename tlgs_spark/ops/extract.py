"""Document-extraction stage: raw fetched bytes → indexable document.

The crawler's post-fetch pipeline (tlgs/crawler/crawler.cpp:415-496)
re-expressed as one Arrow-batched ``mapInPandas`` stage:

1. charset decode to UTF-8, errors ignored, with the binary sniff —
   decoded length < raw/5 ⇒ treat as binary and reject
   (crawler.cpp:46-59,433-436; iconv.hpp)
2. MIME dispatch (crawler.cpp:438-468):
   - ``text/gemini`` → gemtext concise extraction (text/title/links),
     gemsub feed heuristic, empty links dropped, title falls back to
     the URL
   - ``text/plain | plaintext | text/markdown | text/x-rst`` → body as
     is, title = URL, ``twtxt`` feed iff path ends ``/twtxt.txt``
   - anything else → empty body, size 0; ``rss``/``atom`` feed by MIME
3. Gemini status 1x (input prompts): the status meta IS the body
   (crawler.cpp:470-475)
4. title truncated to 1000 chars (crawler.cpp:484-486)

Input columns: url string, status int, mime string, charset string,
raw binary. Output adds: title, body, links array<string>, feed_type,
size long. Per-row Python is confined to this one vectorized stage —
downstream (tokenize/index) is the normal build path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .gemtext import is_gemsub, parse_gemtext

PLAIN_MIMES = {"text/plain", "plaintext", "text/markdown", "text/x-rst"}
FEED_MIMES = {"application/rss+xml": "rss", "application/atom+xml": "atom"}
TITLE_MAX = 1000
BINARY_SNIFF_RATIO = 5


def decode_to_utf8(raw: bytes, charset: str | None) -> str | None:
    """iconv-any→UTF-8 analog: decode ignoring errors; if the decoded
    text lost more than 4/5 of the input it was binary — reject."""
    if raw is None:
        return None
    if not raw:
        return ""
    try:
        text = raw.decode(charset or "utf-8", errors="ignore")
    except LookupError:
        text = raw.decode("utf-8", errors="ignore")
    if len(text.encode("utf-8", errors="ignore")) < len(raw) / BINARY_SNIFF_RATIO:
        return None
    return text


def extract_document(
    url: str, status: int, mime: str, charset: str | None, raw: bytes
) -> dict | None:
    """One document through the reference chain. None ⇒ not indexable."""
    # NaN guard: a nullable int column reaches the pandas batch as
    # float64 NaN; int(NaN) would kill the whole stage for one bad row
    status = 20 if status is None or status != status else int(status)
    if status // 10 == 1:
        # input-prompt pages: index the prompt text itself
        body = decode_to_utf8(raw, charset) or ""
        return {
            "title": url[:TITLE_MAX],
            "body": body,
            "links": [],
            "feed_type": None,
            "size": len(body.encode("utf-8")),
        }
    if status // 10 != 2:
        return None
    mime = (mime or "").strip().lower()
    text = decode_to_utf8(raw, charset)
    if text is None:
        return None
    if mime == "text/gemini":
        doc = parse_gemtext(text, concise=True)
        feed = "gemsub" if is_gemsub(text) else None
        title = doc.title or url
        return {
            "title": title[:TITLE_MAX],
            "body": doc.text,
            # parse_gemtext yields (url, link_text); the document carries
            # URLs only, empties dropped (crawler.cpp:448-451)
            "links": [u for u, _ in doc.links if u],
            "feed_type": feed,
            "size": len(doc.text.encode("utf-8")),
        }
    if mime in PLAIN_MIMES:
        feed = "twtxt" if url.split("?")[0].split("#")[0].endswith("/twtxt.txt") else None
        return {
            "title": url[:TITLE_MAX],
            "body": text,
            "links": [],
            "feed_type": feed,
            "size": len(text.encode("utf-8")),
        }
    return {
        "title": url[:TITLE_MAX],
        "body": "",
        "links": [],
        "feed_type": FEED_MIMES.get(mime),
        "size": 0,
    }


EXTRACT_SCHEMA = (
    "url string, title string, body string, links array<string>, "
    "feed_type string, size long"
)


def extract_documents(df: DataFrame) -> DataFrame:
    """Arrow-batched extraction over (url, status, mime, charset, raw).
    Rows that fail the binary sniff / bad status are dropped — the
    crawler's 'not indexable' path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, status, mime, charset, raw in zip(
                pdf["url"], pdf["status"], pdf["mime"], pdf["charset"], pdf["raw"]
            ):
                d = extract_document(
                    url, status, mime, charset, bytes(raw) if raw is not None else None
                )
                if d is not None:
                    out.append({"url": url, **d})
            yield pd.DataFrame(
                out,
                columns=["url", "title", "body", "links", "feed_type", "size"],
            )

    return df.mapInPandas(run, schema=EXTRACT_SCHEMA)
