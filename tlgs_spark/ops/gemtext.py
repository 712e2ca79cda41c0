"""Gemtext (text/gemini) document extraction — F19/F20 parity.

Reference: tlgsutils/gemini_parser.cpp. Semantics pinned by the
reference's own tests (gemini_parser_test.cpp:8-65,124-232):

- line types: `# ` heading1, `## ` heading2, `### ` heading3,
  `=> <url> [text]` link (whitespace/tab tolerant), ```` ``` ````
  preformatted toggles, plain text
- concise extraction (gemini_parser.cpp:36-98): drop preformatted
  blocks whose meta mentions ascii/art/banner/logo/figlet, drop
  all-same-char lines and `---xx---` separators and `│`-tree lines;
  title = first heading1; links collected
- gemsub feed heuristic (gemini_parser.cpp:100-160): a page is a
  gemsub feed iff it has ≥3 consecutive link lines whose link text
  starts with a `YYYY-M-D` date

Pure-Python core (driver/tests) + a vectorized mapInPandas wrapper
for corpus-scale extraction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_LINK_RE = re.compile(r"^=>[ \t]*(\S+)([ \t]+(.*))?$")
_DATED_RE = re.compile(r"^\d{4}-\d{1,2}-\d{1,2}")
_SEP_RE = re.compile(r"^-{3,}.*-{3,}$|^[-=_~*#.]{3,}$")
_ART_META_RE = re.compile(r"ascii|art|banner|logo|figlet|diagram", re.IGNORECASE)


@dataclass
class GeminiDocument:
    text: str = ""
    title: str | None = None
    links: list[tuple[str, str]] = field(default_factory=list)  # (url, label)


def parse_gemtext(body: str, concise: bool = True) -> GeminiDocument:
    doc = GeminiDocument()
    lines_out: list[str] = []
    in_pre = False
    pre_drop = False
    for raw in body.split("\n"):
        if raw.startswith("```"):
            if not in_pre:
                meta = raw[3:].strip()
                # drop only art-keyword metas: the reference KEEPS
                # unlabeled code blocks (gemini_parser.cpp:43-66 skips
                # a preformat only when first-content, meta keywords,
                # or isAsciiArt(text) — our frozen spec keeps the
                # meta-keyword arm here and handles ASCII-art text in
                # the corpus-hygiene pass)
                pre_drop = concise and bool(_ART_META_RE.search(meta))
            in_pre = not in_pre
            continue
        if in_pre:
            if not pre_drop:
                lines_out.append(raw)
            continue
        m = _LINK_RE.match(raw)
        if m:
            url = m.group(1)
            label = (m.group(3) or "").strip()
            doc.links.append((url, label))
            lines_out.append(label or url)
            continue
        if raw.startswith("# "):
            h = raw[2:].strip()
            if doc.title is None:
                doc.title = h
            lines_out.append(h)
            continue
        if raw.startswith("## ") or raw.startswith("### "):
            lines_out.append(raw.lstrip("#").strip())
            continue
        if concise:
            s = raw.strip()
            if s and len(set(s)) == 1 and len(s) >= 3:
                continue  # all-same-char line
            if _SEP_RE.match(s):
                continue
            if "│" in s:
                continue
        lines_out.append(raw)
    doc.text = "\n".join(lines_out) + ("\n" if lines_out else "")
    return doc


def is_gemsub(body: str, require_dated_run: int = 3) -> bool:
    """≥N consecutive link lines with YYYY-M-D-prefixed labels
    (gemini_parser.cpp:100-160)."""
    run = 0
    for raw in body.split("\n"):
        m = _LINK_RE.match(raw)
        if m:
            label = (m.group(3) or "").strip()
            if _DATED_RE.match(label):
                run += 1
                if run >= require_dated_run:
                    return True
                continue
        run = 0
    return False


def extract_gemtext_df(df, text_col: str = "text", concise: bool = True):
    """Corpus-scale extraction: mapInPandas → (…, title, clean_text,
    links array<string>, is_feed boolean)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            docs = [parse_gemtext(t or "", concise=concise) for t in pdf[text_col]]
            out = pdf.copy()
            out["title"] = [d.title for d in docs]
            out["clean_text"] = [d.text for d in docs]
            out["links"] = [[u for u, _ in d.links] for d in docs]
            out["is_feed"] = [is_gemsub(t or "") for t in pdf[text_col]]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", title string, clean_text string, links array<string>, is_feed boolean"
    return df.mapInPandas(run, schema=schema)
