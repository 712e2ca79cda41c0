"""DuckDB oracle SQL twins for the entry-query registry.

Test scaffolding, not engine code: each string (or generator) in
``SQL`` is the ANSI-SQL mirror of one Spark entry in
``tlgs_spark.entry_queries``, run by the driver in DuckDB over the
same parquet views for the per-round correctness gate. Column names,
float rounding (4 dp), and LIMIT tie-breaks are pinned identically on
both sides so the order-insensitive value-hash matches.

Shared literals (query terms, synthetic URL cases, fitted IVF
centroids, LSH hyperplanes) come from ``tlgs_spark.entry_specs`` so
the two renderings of every entry cannot drift apart; the tokenizer
CTE/stem/stopword renderers come from the frozen analyzer spec in
``tlgs_spark.tokenizer``.

Values in ``SQL`` are either a ready SQL string or a callable
``(sf_dir) -> str`` for generators that embed data-derived literals
(see ``entry_queries.resolve_sql``).
"""

from __future__ import annotations

from ..entry_specs import (
    AND_TERMS,
    OR_TERMS,
    SNIPPET_TERMS,
    SYNTH_HOSTS,
    SYNTH_PATHS,
    ivf_centroids,
    ivf_probes,
    lsh_planes,
)
from ..tokenizer import s_stem, stem_sql_case, stopwords_sql_list, tokens_cte_sql
from .. import bm25


def bm25_sql(terms: list[str], k: int, mode: str = "and", doc_filter: str = "TRUE",
             page: int | None = None) -> str:
    # mirror of _bm25_scored: stem, then dedupe (order-preserving)
    terms = list(dict.fromkeys(s_stem(t) for t in terms))
    vals = ", ".join(f"('{t}')" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    idf = f"ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))"
    tfn = (
        f"(m.tf * ({bm25.K1} + 1.0) / "
        f"(m.tf + {bm25.K1} * (1.0 - {bm25.B} + {bm25.B} * dl.dl / s.avgdl)))"
    )
    page_clause = (
        f"QUALIFY row_number() OVER (ORDER BY round(score,4) DESC, doc_id) "
        f"BETWEEN {page * k + 1} AND {(page + 1) * k}"
        if page is not None
        else f"ORDER BY round(score,4) DESC, doc_id LIMIT {k}"
    )
    return f"""
WITH {tokens_cte_sql()},
dlen AS (
  SELECT d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
  FROM documents d LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id) t
  USING (doc_id)
),
s AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) FROM dlen)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q(term) AS (VALUES {vals}),
scored AS (
  SELECT m.doc_id,
         sum({idf} * {tfn}) AS score
  FROM tf m
  JOIN q USING (term)
  JOIN dft d USING (term)
  JOIN dlen dl ON dl.doc_id = m.doc_id
  CROSS JOIN s
  GROUP BY m.doc_id
  {having}
)
SELECT sc.doc_id, round(sc.score, 4) AS score
FROM scored sc JOIN documents doc USING (doc_id)
WHERE {doc_filter}
{page_clause}
""".strip()


_SHINGLE_SQL = """
sh AS (
  SELECT DISTINCT doc_id, s AS shingle FROM (
    SELECT doc_id,
           unnest([x FOR x IN list_transform(
             list_zip(l, l[2:], l[3:]),
             t -> t[1] || ' ' || t[2] || ' ' || t[3]) IF x IS NOT NULL]) AS s
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents)
  )
)
""".strip()


def bands_sql(n_bands: int = 4, rows_per_band: int = 2) -> str:
    """DuckDB mirror of ops.dedup.minhash_bands: one md5 per shingle,
    the hash family by hex rotation, band sig = concat of its r
    row-minima. Bit-identical to the Spark kernel (lowercase hex md5,
    1-based substr on both engines)."""
    from ..ops.dedup import minhash_rotation_sql

    n_funcs = n_bands * rows_per_band
    mins = ",\n         ".join(
        f"min({minhash_rotation_sql('h', j)}) AS m{j}" for j in range(n_funcs)
    )
    selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {sig} AS sig FROM mins".format(
            b=b,
            sig=" || '|' || ".join(
                f"m{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
WITH {_SHINGLE_SQL},
hs AS (SELECT doc_id, md5(shingle) AS h FROM sh),
mins AS (
  SELECT doc_id,
         {mins}
  FROM hs GROUP BY doc_id
),
sigs AS (
  {selects}
)
""".strip()


_BANDS_SQL = bands_sql()


_LINKS_SQL = """
links AS (
  SELECT doc_id AS src, (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 5) % (SELECT count(*) FROM documents) FROM documents
)
""".strip()


_REDIRECTS_SQL = """
redirects AS (
  SELECT doc_id AS from_id, (doc_id * 3 + 7) % (SELECT count(*) FROM documents) AS to_id
  FROM documents WHERE doc_id % 5 = 0
)
""".strip()


_TITLE_EXPR_SQL = "array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:5], ' ')"


def _case_sql(values: list[str]) -> str:
    whens = "\n           ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values[:-1])
    )
    return f"CASE doc_id % {len(values)}\n           {whens}\n           ELSE '{values[-1]}' END"


_URL_SYNTH_SQL = f"""
synth AS (
  SELECT doc_id,
         {_case_sql(SYNTH_HOSTS)} AS host,
         {_case_sql(SYNTH_PATHS)} AS path
  FROM documents
)
""".strip()


# Deterministic synthesized crawl responses over documents, exercising
# every branch of the F19-F22 chain: gemtext headings/links/preformat
# (art-dropped AND kept blocks)/separator hygiene/gemsub runs, plain
# text (+twtxt), rss MIME feeds, 1x input prompts, binary-sniff drops.
_EXTRACT_STRIP = "' ' || chr(9) || chr(13) || chr(11) || chr(12)"


def _x_strip(e: str) -> str:
    return f"trim({e}, {_EXTRACT_STRIP})"


# pieces precomputed outside the f-string (py311: no backslash in {})
_X_LINK_TEST = r"regexp_matches(c.line, '^=>[ \t]*\S+')"
_X_LABEL = _x_strip(r"regexp_extract(c.line, '^=>[ \t]*\S+[ \t]+(.*)$', 1)")
_X_URL1 = r"regexp_extract(c.line, '^=>[ \t]*(\S+)', 1)"
_X_SEP = r"'^(-{3,}.*-{3,}|[-=_~*#.]{3,})$'"
_X_DATED = r"regexp_matches(line, '^=>[ \t]*\S+[ \t]+\d{4}-\d{1,2}-\d{1,2}')"

_EXTRACT_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         doc_id % 21 AS cls,
         doc_id % 3 AS m3,
         'gemini://h/' || doc_id ||
           CASE WHEN doc_id % 21 NOT IN (7, 14) AND doc_id % 3 = 1 AND doc_id % 5 = 0
                THEN '/twtxt.txt' ELSE '' END AS url,
         '# Doc ' || doc_id || chr(10) || substr(text, 1, 500) AS plain_body,
         '# Doc ' || doc_id || chr(10)
           || '=> gemini://l' || doc_id || '/a First link' || chr(10)
           || '=> gemini://l' || doc_id || '/b' || chr(10)
           || '## Section ' || doc_id || chr(10)
           || substr(text, 1, 200) || chr(10)
           || '```ascii banner' || chr(10)
           || 'ART-' || doc_id || chr(10)
           || '```' || chr(10)
           || '```code' || chr(10)
           || 'kept pre ' || doc_id || chr(10)
           || '```' || chr(10)
           || '---===---' || chr(10)
           || '#####' || chr(10)
           || '│tree│' || chr(10)
           || CASE WHEN doc_id % 6 = 0 THEN
                '=> /p1 2024-01-02 one' || chr(10)
                || '=> /p2 2024-01-03 two' || chr(10)
                || '=> /p3 2024-02-04 three' || chr(10)
              ELSE '' END
           || 'plain tail ' || doc_id AS gem_body
  FROM documents
),
prompt_out AS (
  SELECT url, substr(url, 1, 1000) AS title, NULL AS feed_type, plain_body AS body,
         0::BIGINT AS n_links, octet_length(encode(plain_body))::BIGINT AS size
  FROM base WHERE cls = 7
),
plain_out AS (
  SELECT url, substr(url, 1, 1000),
         CASE WHEN url LIKE '%/twtxt.txt' THEN 'twtxt' END,
         plain_body, 0::BIGINT, octet_length(encode(plain_body))::BIGINT
  FROM base WHERE cls NOT IN (7, 14) AND m3 = 1
),
rss_out AS (
  SELECT url, substr(url, 1, 1000), 'rss', '', 0::BIGINT, 0::BIGINT
  FROM base WHERE cls NOT IN (7, 14) AND m3 = 2
),
gdocs AS MATERIALIZED (
  SELECT doc_id, url, gem_body FROM base WHERE cls NOT IN (7, 14) AND m3 = 0
),
gl AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(l, 1) AS ln, unnest(l) AS line
  FROM (SELECT doc_id, string_split(gem_body, chr(10)) AS l FROM gdocs)
),
l2 AS MATERIALIZED (
  SELECT doc_id, ln, line,
         coalesce(sum(CASE WHEN line LIKE '```%' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY ln
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
  FROM gl
),
tog AS MATERIALIZED (
  SELECT doc_id, ln, row_number() OVER (PARTITION BY doc_id ORDER BY ln) AS tidx,
         {_x_strip("substr(line, 4)")} AS meta
  FROM l2 WHERE line LIKE '```%'
),
xform AS MATERIALIZED (
  SELECT c.doc_id, c.ln,
    CASE
      WHEN c.nb % 2 = 1 THEN
        CASE WHEN regexp_matches(lower(t.meta),
                  'ascii|art|banner|logo|figlet|diagram')
             THEN NULL ELSE c.line END
      WHEN {_X_LINK_TEST} THEN
        coalesce(NULLIF({_X_LABEL}, ''), {_X_URL1})
      WHEN c.line LIKE '# %' THEN {_x_strip("substr(c.line, 3)")}
      WHEN c.line LIKE '## %' OR c.line LIKE '### %'
        THEN {_x_strip("regexp_replace(c.line, '^#+', '')")}
      ELSE CASE
        WHEN length({_x_strip("c.line")}) >= 3
             AND {_x_strip("c.line")} = repeat(substr({_x_strip("c.line")}, 1, 1),
                                               length({_x_strip("c.line")})) THEN NULL
        WHEN regexp_matches({_x_strip("c.line")}, {_X_SEP}) THEN NULL
        WHEN strpos({_x_strip("c.line")}, '│') > 0 THEN NULL
        ELSE c.line END
    END AS outl,
    CASE WHEN c.nb % 2 = 0 AND c.line LIKE '# %' THEN {_x_strip("substr(c.line, 3)")} END AS h1,
    CASE WHEN c.nb % 2 = 0 AND {_X_LINK_TEST} THEN 1 ELSE 0 END AS is_link
  FROM l2 c LEFT JOIN tog t ON t.doc_id = c.doc_id AND t.tidx = c.nb AND c.nb % 2 = 1
  WHERE c.line NOT LIKE '```%'
),
t1 AS (SELECT doc_id, arg_min(h1, ln) AS title FROM xform WHERE h1 IS NOT NULL GROUP BY doc_id),
agg AS (
  SELECT doc_id, string_agg(outl, chr(10) ORDER BY ln) AS txt,
         count(outl) AS n_kept, sum(is_link)::BIGINT AS n_links
  FROM xform GROUP BY doc_id
),
fl AS (
  SELECT doc_id, ln,
         CASE WHEN {_X_DATED} THEN 1 ELSE 0 END AS dated
  FROM gl
),
isl AS (
  SELECT doc_id, ln - row_number() OVER (PARTITION BY doc_id ORDER BY ln) AS grp
  FROM fl WHERE dated = 1
),
gs AS (
  SELECT doc_id, TRUE AS is_gemsub
  FROM (SELECT doc_id, grp, count(*) AS c FROM isl GROUP BY doc_id, grp)
  WHERE c >= 3 GROUP BY doc_id
),
gem_out AS (
  SELECT g.url,
         substr(coalesce(t1.title, g.url), 1, 1000) AS title,
         CASE WHEN gs.is_gemsub THEN 'gemsub' END AS feed_type,
         CASE WHEN a.n_kept > 0 THEN a.txt || chr(10) ELSE '' END AS body,
         coalesce(a.n_links, 0)::BIGINT AS n_links,
         octet_length(encode(CASE WHEN a.n_kept > 0 THEN a.txt || chr(10) ELSE '' END))::BIGINT AS size
  FROM gdocs g
  LEFT JOIN t1 USING (doc_id) LEFT JOIN agg a USING (doc_id) LEFT JOIN gs USING (doc_id)
)
SELECT * FROM prompt_out
UNION ALL SELECT * FROM plain_out
UNION ALL SELECT * FROM rss_out
UNION ALL SELECT * FROM gem_out
""".strip()


_SYNTH_EDGES_SQL = """
base AS MATERIALIZED (SELECT doc_id FROM documents WHERE doc_id < 500),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, doc_id % 97 AS dst FROM base
    UNION ALL
    SELECT doc_id, (doc_id * 7 + 3) % (SELECT count(*) FROM base) FROM base
  ) WHERE src <> dst
)
""".strip()


def hits_sql(iters: int = 5) -> str:
    """Unrolled fixed-iteration HITS mirror of graph.hits_rank with
    eps=0 (no early stop), reference recurrence (search.cpp:253-306):
    JACOBI — both calc sums read the previous iteration's snapshot —
    keep-old where a calc sum is 0 or absent, normalize each vector by
    greatest(sum, 1.0), then flush normalized scores strictly below
    float epsilon (1.1920929e-7) to 0."""
    flt_eps = "1.1920928955078125e-07"
    parts = [
        _SYNTH_EDGES_SQL,
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM e "
        "UNION ALL SELECT dst FROM e))",
        "s0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS auth, "
        "1.0 / (SELECT count(*) FROM nodes) AS hub FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"ca{k} AS MATERIALIZED (SELECT e.dst AS node, sum(s.hub) AS raw "
            f"FROM e JOIN s{p} s ON s.node = e.src GROUP BY e.dst)"
        )
        # Jacobi: the hub sum reads s{p}.auth, never this iteration's
        parts.append(
            f"ch{k} AS MATERIALIZED (SELECT e.src AS node, sum(s.auth) AS raw "
            f"FROM e JOIN s{p} s ON s.node = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT n.node, "
            f"coalesce(NULLIF(ca.raw, 0), s.auth) AS na, "
            f"coalesce(NULLIF(ch.raw, 0), s.hub) AS nh "
            f"FROM nodes n JOIN s{p} s ON s.node = n.node "
            f"LEFT JOIN ca{k} ca ON ca.node = n.node "
            f"LEFT JOIN ch{k} ch ON ch.node = n.node)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT node, "
            f"CASE WHEN na / (SELECT greatest(sum(na), 1.0) FROM n{k}) < {flt_eps} "
            f"THEN 0.0 ELSE na / (SELECT greatest(sum(na), 1.0) FROM n{k}) END AS auth, "
            f"CASE WHEN nh / (SELECT greatest(sum(nh), 1.0) FROM n{k}) < {flt_eps} "
            f"THEN 0.0 ELSE nh / (SELECT greatest(sum(nh), 1.0) FROM n{k}) END AS hub "
            f"FROM n{k})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, round(auth, 6) AS auth, round(hub, 6) AS hub FROM s{iters}"
    )


def salsa_sql(iters: int = 5) -> str:
    """Unrolled fixed-iteration SALSA mirror of graph.salsa_rank with
    eps=0, reference recurrence (search.cpp:316-412): side = auth iff
    in_deg > out_deg on the ORIGINAL graph over ALL nodes; only
    hub→auth edges propagate; ONE combined score vector, initialized
    1/num_auths resp. 1/num_hubs and normalized each iteration by
    greatest(sum of the PREVIOUS scores, 1.0); bipartite-isolated
    nodes drop to 0 (no keep-old in SALSA, no flush)."""
    parts = [
        _SYNTH_EDGES_SQL,
        "deg AS MATERIALIZED (SELECT node, sum(out_) AS outd, sum(in_) AS ind FROM ("
        "SELECT src AS node, 1 AS out_, 0 AS in_ FROM e "
        "UNION ALL SELECT dst, 0, 1 FROM e) GROUP BY node)",
        "sides AS MATERIALIZED (SELECT node, CASE WHEN ind > outd THEN 'auth' ELSE 'hub' END AS side FROM deg)",
        "ke AS MATERIALIZED (SELECT e.src, e.dst FROM e "
        "JOIN sides ss ON ss.node = e.src AND ss.side = 'hub' "
        "JOIN sides sd ON sd.node = e.dst AND sd.side = 'auth')",
        "hdeg AS MATERIALIZED (SELECT src, count(*) AS hd FROM ke GROUP BY src)",
        "adeg AS MATERIALIZED (SELECT dst, count(*) AS ad FROM ke GROUP BY dst)",
        "s0 AS MATERIALIZED (SELECT node, side, CASE WHEN side = 'auth' "
        "THEN 1.0 / greatest((SELECT count(*) FROM sides WHERE side = 'auth'), 1) "
        "ELSE 1.0 / greatest((SELECT count(*) FROM sides WHERE side = 'hub'), 1) END AS score "
        "FROM sides)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        # local_out per hub src: (Σ_dst score[dst]/ad) / hd
        parts.append(
            f"t{k} AS MATERIALIZED (SELECT ke.src AS node, "
            f"sum(s.score / ad.ad) / min(hd.hd) AS t "
            f"FROM ke JOIN s{p} s ON s.node = ke.dst "
            f"JOIN adeg ad ON ad.dst = ke.dst "
            f"JOIN hdeg hd ON hd.src = ke.src GROUP BY ke.src)"
        )
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT ke.dst AS node, sum(t.t) AS raw "
            f"FROM ke JOIN t{k} t ON t.node = ke.src GROUP BY ke.dst)"
        )
        # local_in per auth dst: (Σ_src score[src]/hd) / ad
        parts.append(
            f"u{k} AS MATERIALIZED (SELECT ke.dst AS node, "
            f"sum(s.score / hd.hd) / min(ad.ad) AS u "
            f"FROM ke JOIN s{p} s ON s.node = ke.src "
            f"JOIN hdeg hd ON hd.src = ke.src "
            f"JOIN adeg ad ON ad.dst = ke.dst GROUP BY ke.dst)"
        )
        parts.append(
            f"hr{k} AS MATERIALIZED (SELECT ke.src AS node, sum(u.u) AS raw "
            f"FROM ke JOIN u{k} u ON u.node = ke.dst GROUP BY ke.src)"
        )
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT s.node, s.side, "
            f"coalesce(CASE WHEN s.side = 'auth' THEN ar.raw ELSE hr.raw END, 0.0) "
            f"/ (SELECT greatest(sum(score), 1.0) FROM s{p}) AS score "
            f"FROM s{p} s LEFT JOIN ar{k} ar ON ar.node = s.node "
            f"LEFT JOIN hr{k} hr ON hr.node = s.node)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, side, round(score, 6) AS score FROM s{iters}"
    )


def _simhash_cte_sql(src: str = "documents") -> str:
    """CTE chain computing sighex(doc_id, simhash) over ``src`` under
    the frozen simhash spec (ops.textstats.simhash_hex_col)."""
    return f"""
toks AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
  FROM {src}
),
tok AS (SELECT doc_id, unnest(l) AS t FROM toks),
h AS MATERIALIZED (SELECT doc_id, substr(md5(t), 1, 16) AS hx FROM tok),
jb AS (SELECT unnest(range(64)) AS j),
bits AS MATERIALIZED (
  SELECT h.doc_id, jb.j,
         sum(CASE WHEN ((strpos('0123456789abcdef', substr(hx, 1 + j // 4, 1)) - 1)
                        & ([8,4,2,1][(j & 3) + 1])) > 0 THEN 1 ELSE 0 END) AS n_set,
         count(*) AS n
  FROM h CROSS JOIN jb GROUP BY h.doc_id, jb.j
),
sb AS (
  SELECT doc_id, j, CASE WHEN 2 * n_set >= n THEN 1 ELSE 0 END AS bit FROM bits
),
nib AS (
  SELECT doc_id, j // 4 AS ni, sum(bit * ([8,4,2,1][(j & 3) + 1])) AS v
  FROM sb GROUP BY doc_id, j // 4
),
hexes AS (
  SELECT doc_id,
         string_agg(substr('0123456789abcdef', (v + 1)::INT, 1), '' ORDER BY ni) AS simhash
  FROM nib GROUP BY doc_id
),
sighex AS MATERIALIZED (
  SELECT d.doc_id, coalesce(hx.simhash, '0000000000000000') AS simhash
  FROM {src} d LEFT JOIN hexes hx USING (doc_id)
)
""".strip()


_SIMHASH_SQL = (
    "WITH " + _simhash_cte_sql() + "\nSELECT doc_id, simhash FROM sighex"
)


def simhash_pairs_sql() -> str:
    """Band-bucketed simhash near-dup pairs over documents augmented
    with near-duplicates (doc_id+100000, two tokens appended)."""
    ham = " + ".join(
        "bit_count(xor(strpos('0123456789abcdef', substr(sa, {i}, 1)) - 1, "
        "strpos('0123456789abcdef', substr(sb, {i}, 1)) - 1))".format(i=i)
        for i in range(1, 17)
    )
    return f"""
WITH aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' dupmarker extra' FROM documents WHERE doc_id % 11 = 0
),
{_simhash_cte_sql("aug")},
bands AS MATERIALIZED (
  SELECT doc_id, simhash, b AS band, substr(simhash, b * 4 + 1, 4) AS key
  FROM sighex, (SELECT unnest([0,1,2,3]) AS b)
),
sized AS MATERIALIZED (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band, key) AS bn FROM bands)
  WHERE bn <= 100
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM sized a JOIN sized b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, ({ham})::INT AS hamming
FROM cand WHERE ({ham}) <= 3
""".strip()


_URL_FRAME_SQL = """
uf AS (
  SELECT doc_id,
         doc_id % 50 AS content_hash,
         n_chars AS size,
         n_chars::DOUBLE AS score,
         CASE doc_id % 5
           WHEN 0 THEN 'gemini://host' || (doc_id % 7) || '.example/page' || (doc_id % 50)
           WHEN 1 THEN 'gemini://host' || (doc_id % 7) || '.example/page' || (doc_id % 50) || '/'
           WHEN 2 THEN 'gemini://host' || (doc_id % 7) || '.example/~alice/page' || (doc_id % 50)
           WHEN 3 THEN 'gemini://host' || (doc_id % 7) || '.example/users/alice/page' || (doc_id % 50)
           ELSE 'gemini://archive.example/host' || (doc_id % 7) || '.example/page' || (doc_id % 50)
         END AS url
  FROM documents
)
""".strip()


def lang_id_sql() -> str:
    """DuckDB mirror of ops.textstats.lang_id_ngram (spec v2):
    non-overlapping weighted n-gram counts on the boundary-padded text
    via replace-delta (≡ re.escape'd str.count for literal grams —
    both scan left-to-right non-overlapping), INTEGER weights so both
    engines sum exactly, argmax first-wins in profile order, all-zero
    → 'und', CJK ratio ≥ 0.3 (unpadded text) → 'zh'."""
    from ..ops.textstats import CJK_RANGE, CJK_THRESHOLD, LANG_PROFILES

    langs = [l for l, g in LANG_PROFILES.items() if g]
    score_exprs = []
    for lang in langs:
        terms = " + ".join(
            f"{w} * (length(ltp) - length(replace(ltp, '{g}', ''))) / {len(g)}"
            for g, w in LANG_PROFILES[lang]
        )
        score_exprs.append(f"({terms}) AS s_{lang}")
    # argmax, first profile wins ties (pandas idxmax semantics)
    argmax = "CASE "
    for i, lang in enumerate(langs):
        rest = [f"s_{lang} >= s_{o}" for o in langs[i + 1 :]]
        cond = " AND ".join(rest) if rest else "TRUE"
        argmax += f"WHEN {cond} THEN '{lang}' "
    argmax += "END"
    zero = " AND ".join(f"s_{l} = 0" for l in langs)
    return f"""
WITH base AS (
  SELECT doc_id, lower(coalesce(text, '')) AS lt,
         ' ' || lower(coalesce(text, '')) || ' ' AS ltp,
         greatest(length(lower(coalesce(text, ''))), 1)::DOUBLE AS n
  FROM documents
),
scored AS (
  SELECT doc_id, lt, n, {", ".join(score_exprs)},
         length(regexp_replace(lt, '[^{CJK_RANGE}]', '', 'g')) / n AS cjk
  FROM base
)
SELECT doc_id,
       CASE WHEN cjk >= {CJK_THRESHOLD} THEN 'zh'
            WHEN {zero} THEN 'und'
            ELSE {argmax} END AS lang_pred
FROM scored
""".strip()


def ann_ivf_sql(sf_dir: str) -> str:
    """DuckDB mirror of assign → n_probe bucket pruning → cosine top-k
    with the FITTED centroids embedded as literals (same 6-dp doubles
    the Spark plan uses; probe ids computed by the same numpy code as
    ivf_search)."""
    cents, qv = ivf_centroids(sf_dir)
    probes = ", ".join(str(p) for p in ivf_probes(cents, qv))
    dots = ", ".join(
        "list_dot_product(v, [" + ", ".join(repr(float(x)) for x in row) + "])"
        " / sqrt(list_dot_product(v, v))"
        for row in cents
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qq AS (SELECT v AS qv FROM e WHERE vec_id = 0),
scored AS (SELECT vec_id, v, [{dots}] AS cs FROM e),
assigned AS (
  SELECT vec_id, v, (list_position(cs, list_max(cs)) - 1)::INT AS cid FROM scored
)
SELECT a.vec_id,
       round(list_dot_product(a.v, qq.qv)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(qq.qv, qq.qv))), 4) AS cos
FROM assigned a CROSS JOIN qq
WHERE a.cid IN ({probes}) AND a.vec_id <> 0
  AND list_dot_product(a.v, a.v) > 0
ORDER BY cos DESC, vec_id LIMIT 10
""".strip()


def lsh_pairs_sql(threshold: float = 0.95, n_bands: int = 4) -> str:
    H = lsh_planes()
    width = len(H) // n_bands
    bits = " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in row)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for row in H
    )
    band_rows = "\n  UNION ALL ".join(
        f"SELECT id, v, {b} AS band, substr(s, {b * width + 1}, {width}) AS key FROM sig"
        for b in range(n_bands)
    )
    return f"""
WITH aug AS MATERIALIZED (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 2.0)
  FROM embeddings WHERE vec_id % 7 = 0
),
sig AS MATERIALIZED (
  SELECT id, v, {bits} AS s FROM aug
),
bands AS MATERIALIZED (
  {band_rows}
),
sized AS MATERIALIZED (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band, key) AS bn FROM bands)
  WHERE bn <= 100
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.v AS va, b.v AS vb
  FROM sized a JOIN sized b ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b,
       round(list_dot_product(va, vb)
             / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 4) AS cos
FROM cand
WHERE round(list_dot_product(va, vb)
            / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 4) >= {threshold}
""".strip()


def snippet_sql() -> str:
    """DuckDB mirror of query.snippet.make_snippet under the frozen
    spec: sanitize (newline/tab/backtick → space, leading gemtext
    markers stripped, runs collapsed, strip), single-space word split,
    [a-z0-9]-normalized + S-STEMMED match (ts_headline goes through
    the same stemmer as retrieval), first-hit 23–37 word window with
    left padding, [word] highlighting."""
    terms_in = "(" + ", ".join(f"'{s_stem(t)}'" for t in SNIPPET_TERMS) + ")"
    sanitize = (
        # sanitizeGemini parity (search.cpp:61-69): literal replaces for
        # \n/\t/the ``` fence (single backticks survive), leading
        # gemtext markers stripped UNLESS the whole string is markers
        # (then returned unchanged); whitespace collapse + trim on top
        # per the frozen spec
        "replace(replace(replace(substr(text, 1, 5000), chr(10), ' '), "
        "chr(9), ' '), '```', ' ')"
    )
    sanitize = (
        f"CASE WHEN regexp_replace({sanitize}, '^[`*=>#]+', '') = '' "
        f"THEN {sanitize} "
        f"ELSE trim(regexp_replace(regexp_replace({sanitize}, '^[`*=>#]+', ''), "
        + r"'\s{2,}', ' ', 'g'), "
        + _EXTRACT_STRIP
        + ") END"
    )
    return (
        """
WITH heads AS (
  SELECT doc_id, """ + sanitize + """ AS head
  FROM documents WHERE doc_id < 200
),
w AS (
  SELECT doc_id, ws, len(ws) AS n,
         list_transform(
           list_transform(ws, x -> regexp_replace(lower(x), '[^a-z0-9]+', '', 'g')),
           x -> """ + stem_sql_case("x") + """) AS nw
  FROM (SELECT doc_id, string_split(head, ' ') AS ws FROM heads)
),
pos AS (
  -- NULLIF: DuckDB list_position yields 0 (not NULL) when absent
  SELECT *, NULLIF(list_position(list_transform(nw, x -> x IN """ + terms_in + """), true), 0) AS hit
  FROM w
),
win AS (
  SELECT doc_id, ws, nw,
         CASE WHEN hit IS NULL THEN 0
              ELSE greatest(0, least(hit - 1, least(n, hit - 1 + 37) - 23)) END AS st,
         CASE WHEN hit IS NULL THEN least(n, 23)
              ELSE least(n, hit - 1 + 37) END AS en
  FROM pos
)
SELECT doc_id,
       array_to_string(
         list_transform(range(st + 1, en + 1),
           i -> CASE WHEN nw[i] IN """ + terms_in + """
                     THEN '[' || ws[i] || ']' ELSE ws[i] END),
         ' ') AS preview
FROM win
"""
    ).strip()


# Multimodal oracle: payload bytes are md5-chain-derived (see
# ops.multimodal.hashchain_bytes), so DuckDB reproduces them as hex
# strings and the driver gets a HARD value-hash check (this was the
# registry's one rows-only entry through r3). Geometry constants (32
# images, 100 videos at id 1000+, size/duration arithmetic) mirror
# synth_media_chain verbatim; the digest is sha256 over the payload's
# lowercase hex (DuckDB sha256 is VARCHAR-only); image channel sums are
# exact BIGINTs (no float contract).
_MULTIMODAL_SQL = """
WITH img_meta AS (
  SELECT range::BIGINT AS media_id,
         8 + (range::BIGINT * 7) % 24 AS w,
         8 + (range::BIGINT * 11) % 24 AS h
  FROM range(0, 32)
),
img_hdr AS (
  SELECT media_id, w, h, w * h * 3 AS npix,
         lower(hex('P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10))) AS hdr_hex
  FROM img_meta
),
blk AS (SELECT range::BIGINT AS j FROM range(0, 256)),
img_payload AS (
  SELECT m.media_id,
         substr(string_agg(md5('image:' || m.media_id || ':' || b.j), '' ORDER BY b.j),
                1, 2 * any_value(m.npix)) AS pix_hex
  FROM img_hdr m JOIN blk b ON b.j * 16 < m.npix
  GROUP BY m.media_id
),
img_bytes AS (
  SELECT p.media_id, b.pos,
         CAST('0x' || substr(p.pix_hex, 2 * b.pos + 1, 2) AS INTEGER) AS byte
  FROM img_payload p
  JOIN (SELECT range::BIGINT AS pos FROM range(0, 2883)) b
    ON 2 * b.pos + 1 < length(p.pix_hex)
),
img_sums AS (
  SELECT media_id,
         sum(byte) FILTER (pos % 3 = 0)::BIGINT AS sum_r,
         sum(byte) FILTER (pos % 3 = 1)::BIGINT AS sum_g,
         sum(byte) FILTER (pos % 3 = 2)::BIGINT AS sum_b
  FROM img_bytes GROUP BY media_id
),
img_rows AS (
  SELECT h.media_id AS media_id, CAST(NULL AS BIGINT) AS frame_ts_ms,
         'image' AS kind,
         CAST(length(h.hdr_hex || p.pix_hex) / 2 AS BIGINT) AS n_bytes,
         sha256(h.hdr_hex || p.pix_hex) AS sha256,
         s.sum_r, s.sum_g, s.sum_b
  FROM img_hdr h
  JOIN img_payload p USING (media_id)
  JOIN img_sums s USING (media_id)
),
vid_meta AS (
  SELECT 1000 + range::BIGINT AS media_id FROM range(0, 100)
),
vid_geom AS (
  SELECT media_id, 512 + (media_id * 37) % 3584 AS n_bytes,
         100 + (media_id * 997) % 59900 AS duration_ms
  FROM vid_meta
),
vid_payload AS (
  SELECT m.media_id,
         substr(string_agg(md5('video:' || m.media_id || ':' || b.j), '' ORDER BY b.j),
                1, 2 * any_value(m.n_bytes)) AS phex
  FROM vid_geom m JOIN blk b ON b.j * 16 < m.n_bytes
  GROUP BY m.media_id
),
vid_rows AS (
  SELECT m.media_id AS media_id, f.frame_ts_ms, 'video' AS kind,
         m.n_bytes AS n_bytes, sha256(p.phex) AS sha256,
         CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g,
         CAST(NULL AS BIGINT) AS sum_b
  FROM vid_geom m
  JOIN vid_payload p USING (media_id)
  JOIN (SELECT range::BIGINT AS frame_ts_ms FROM range(0, 60000, 5000)) f
    ON f.frame_ts_ms < m.duration_ms
)
SELECT * FROM (SELECT * FROM img_rows UNION ALL SELECT * FROM vid_rows)
ORDER BY media_id, frame_ts_ms
""".strip()


# ---------------------------------------------------------------------------
# the registry: entry name → SQL string | (sf_dir) -> str generator
# ---------------------------------------------------------------------------

SQL: dict[str, object] = {
    "bm25_topk_and": bm25_sql(AND_TERMS, 20, "and"),
    "bm25_topk_or": bm25_sql(OR_TERMS, 25, "or"),
    "engine_bm25_topk": bm25_sql(AND_TERMS, 20, "and"),
    "engine_bm25_wand_df": bm25_sql(OR_TERMS, 25, "or"),
    "bm25_filtered": bm25_sql(AND_TERMS, 20, "and", doc_filter="doc.lang IN ('en','de')"),
    "bm25_negated_filter": bm25_sql(AND_TERMS, 20, "and", doc_filter="doc.lang <> 'en'"),
    "bm25_page2": bm25_sql(OR_TERMS, 10, "or", page=1),
    "conjunctive_match": f"""
WITH {tokens_cte_sql()},
q(term) AS (VALUES ('spark'), ('merge'))
SELECT tf.doc_id, count(*)::BIGINT AS n_matched
FROM tf JOIN q USING (term)
GROUP BY tf.doc_id HAVING count(*) = 2
""".strip(),
    "term_df_top50": f"""
WITH {tokens_cte_sql()}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 50
""".strip(),
    "doc_lengths": f"""
WITH {tokens_cte_sql()}
SELECT d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
FROM documents d
LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id) t USING (doc_id)
""".strip(),
    "collection_stats": f"""
WITH {tokens_cte_sql()},
dlen AS (
  SELECT d.doc_id, coalesce(t.dl,0)::BIGINT AS dl
  FROM documents d LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT dl FROM tf GROUP BY doc_id) t USING (doc_id)
)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT sum(dl) FROM dlen)::BIGINT AS total_dl,
       round((SELECT sum(dl) FROM dlen)::DOUBLE / (SELECT count(*) FROM documents), 6) AS avgdl,
       (SELECT count(DISTINCT term) FROM tf)::BIGINT AS n_terms,
       (SELECT count(*) FROM tf)::BIGINT AS n_postings
""".strip(),
    "stats_by_lang":
    "SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars "
    "FROM documents GROUP BY lang ORDER BY n DESC, lang",
    "distinct_sources":
    "SELECT count(DISTINCT source)::BIGINT AS n_sources, count(*)::BIGINT AS n_docs "
    "FROM documents WHERE text IS NOT NULL",
    "dedup_exact":
    "SELECT md5(text) AS h, min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_dups "
    "FROM documents GROUP BY md5(text) HAVING count(*) > 1",
    "dedup_keep_best": """
SELECT lang, bucket, doc_id, n_chars FROM (
  SELECT lang, (n_chars // 100)::BIGINT AS bucket, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang, n_chars // 100
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn = 1
""".strip(),
    "minhash_bands": _BANDS_SQL + "\nSELECT doc_id, band::INT AS band, sig FROM sigs",
    "minhash_pairs": _BANDS_SQL
    + """
, sized AS (
  SELECT *, count(*) OVER (PARTITION BY band, sig) AS bucket_n FROM sigs
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM sized a JOIN sized b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
WHERE a.bucket_n <= 50 AND b.bucket_n <= 50
""",
    "ngram_jaccard": _BANDS_SQL
    + """
, sized AS (SELECT *, count(*) OVER (PARTITION BY band, sig) AS bucket_n FROM sigs),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  WHERE a.bucket_n <= 50 AND b.bucket_n <= 50
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.id_a, p.id_b, count(*)::BIGINT AS n_inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b
)
SELECT i.id_a, i.id_b,
       round(i.n_inter / (za.n_sh + zb.n_sh - i.n_inter), 4) AS jaccard
FROM inter i JOIN sizes za ON za.doc_id = i.id_a JOIN sizes zb ON zb.doc_id = i.id_b
""",
    "text_quality": f"""
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+'))::BIGINT AS ws_tokens,
       round(CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length(text) END, 4) AS punct_ratio,
       round(CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) = 0 THEN 0.0
             ELSE len([t FOR t IN regexp_extract_all(lower(text), '[a-z0-9]+')
                       IF list_contains([{stopwords_sql_list()}], t)])::DOUBLE
                  / len(regexp_extract_all(lower(text), '[a-z0-9]+')) END, 4) AS stopword_ratio,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS bpe_ish_tokens,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
""".strip(),
    "embedding_topk": """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(e.embedding::DOUBLE[], q.qv)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> 0
  AND list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0
ORDER BY cos DESC, vec_id LIMIT 10
""".strip(),
    "events_tumbling": """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
       count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
""".strip(),
    "events_sessions": """
WITH e AS (
  SELECT user_id, event_id, ts, epoch(date_trunc('second', ts))::BIGINT AS es FROM events
),
x AS (
  SELECT user_id, event_id, es,
         CASE WHEN lag(es) OVER w IS NULL
                   OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
),
y AS (
  SELECT user_id, event_id, es,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM x
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       min(es) AS start_epoch, max(es) AS end_epoch
FROM y GROUP BY user_id, session_id
""".strip(),
    "events_regex": """
SELECT event_type, count(*)::BIGINT AS n
FROM events WHERE regexp_matches(props, '"k": [0-9]{2}')
GROUP BY event_type ORDER BY event_type
""".strip(),
    "orders_date_window": """
SELECT o_orderpriority, count(*)::BIGINT AS n, round(sum(o_totalprice), 4) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-06-01'
  AND o_orderdate < TIMESTAMP '1995-06-01' + INTERVAL 90 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
""".strip(),
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""".strip(),
    "backlinks": f"""
WITH {_LINKS_SQL}
SELECT src, dst, (src % 10 <> dst % 10) AS is_cross
FROM links WHERE dst = 42 AND src <> dst ORDER BY src
""".strip(),
    "source_like":
    "SELECT source, count(*)::BIGINT AS n FROM documents "
    "WHERE source LIKE 'src1%' GROUP BY source ORDER BY source",
    "stale_count": """
SELECT count(*)::BIGINT AS n_stale
FROM events
WHERE ts IS NULL OR ts < TIMESTAMP '2024-01-28' - INTERVAL 3 DAY
""".strip(),
    "inlist_hydrate": """
SELECT doc_id, source, n_chars
FROM documents WHERE doc_id IN (3, 17, 42, 99, 123, 256, 511, 1024, 2047, 4095)
ORDER BY doc_id
""".strip(),
    "corpus_hygiene": """
SELECT doc_id,
       regexp_matches(text, '[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]') AS has_ctrl,
       (n_chars > 48000) AS too_large,
       len(regexp_extract_all(text, '\\n[-=_~*#]{3,}'))::BIGINT AS n_sep_lines
FROM documents
""".strip(),
    "redirect_resolve": f"""
WITH {_REDIRECTS_SQL},
h0 AS (SELECT doc_id, doc_id AS cur FROM documents),
h1 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h0 LEFT JOIN redirects r ON r.from_id = cur),
h2 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h1 LEFT JOIN redirects r ON r.from_id = cur),
h3 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h2 LEFT JOIN redirects r ON r.from_id = cur),
h4 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h3 LEFT JOIN redirects r ON r.from_id = cur),
h5 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h4 LEFT JOIN redirects r ON r.from_id = cur)
SELECT doc_id, cur AS final_id FROM h5 WHERE doc_id <> cur
""".strip(),
    "base_set_expansion": f"""
WITH {tokens_cte_sql()},
{_LINKS_SQL},
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT DISTINCT l.src AS doc_id, (l.src % 10 <> l.dst % 10) AS is_cross
FROM links l JOIN matched m ON l.dst = m.doc_id
WHERE l.src <> l.dst
""".strip(),
    "union_with_priority": f"""
WITH {tokens_cte_sql()},
{_LINKS_SQL},
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark'),
roots AS (SELECT doc_id, TRUE AS is_root FROM matched),
base AS (
  SELECT DISTINCT l.src AS doc_id, FALSE AS is_root
  FROM links l JOIN matched m ON l.dst = m.doc_id WHERE l.src <> l.dst
),
unioned AS (SELECT * FROM roots UNION ALL SELECT * FROM base)
SELECT doc_id, is_root FROM (
  SELECT doc_id, is_root,
         row_number() OVER (PARTITION BY doc_id ORDER BY is_root DESC) AS rn
  FROM unioned
) WHERE rn = 1
""".strip(),
    "bm25f_title_weighted": f"""
WITH titles AS (
  SELECT doc_id, {_TITLE_EXPR_SQL} AS title FROM documents
),
t_raw AS (
  SELECT doc_id, unnest(regexp_extract_all(title, '[a-z0-9]+')) AS term FROM titles
),
t_toks AS (
  SELECT doc_id, {stem_sql_case("term")} AS term FROM t_raw
  WHERE length(term) <= 64 AND term NOT IN ({stopwords_sql_list()})
),
t_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t_toks GROUP BY doc_id, term),
t_dlen AS (
  SELECT d.doc_id, coalesce(x.dl, 0)::BIGINT AS dl
  FROM documents d LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT dl FROM t_tf GROUP BY doc_id) x USING (doc_id)
),
t_s AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) FROM t_dlen)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
),
t_dft AS (SELECT term, count(*)::BIGINT AS df FROM t_tf GROUP BY term),
{tokens_cte_sql()},
dlen AS (
  SELECT d.doc_id, coalesce(x.dl, 0)::BIGINT AS dl
  FROM documents d LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT dl FROM tf GROUP BY doc_id) x USING (doc_id)
),
s AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(dl) FROM dlen)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
q(term) AS (VALUES ('spark'), ('window')),
body AS (
  SELECT m.doc_id,
         sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (m.tf * 2.2 / (m.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)))) AS score,
         count(*) AS nm
  FROM tf m JOIN q USING (term) JOIN dft d USING (term)
  JOIN dlen dl ON dl.doc_id = m.doc_id CROSS JOIN s
  GROUP BY m.doc_id HAVING count(*) = 2
),
title_sc AS (
  SELECT m.doc_id,
         sum(ln(1.0 + (t_s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (m.tf * 2.2 / (m.tf + 1.2 * (0.25 + 0.75 * dl.dl / t_s.avgdl)))) AS score
  FROM t_tf m JOIN q USING (term) JOIN t_dft d USING (term)
  JOIN t_dlen dl ON dl.doc_id = m.doc_id CROSS JOIN t_s
  GROUP BY m.doc_id
)
SELECT b.doc_id,
       round(50.0 * coalesce(t.score, 0.0) + b.score, 4) AS score
FROM body b LEFT JOIN title_sc t ON t.doc_id = b.doc_id
ORDER BY round(50.0 * coalesce(t.score, 0.0) + b.score, 4) DESC, b.doc_id
LIMIT 20
""".strip(),
    "url_blacklist": f"""
WITH {_URL_SYNTH_SQL}
SELECT doc_id,
       'gemini://' || host || path AS url,
       (host LIKE 'git.%'
        OR host LIKE '127.0.0.%'
        OR host LIKE '%.onion'
        OR path LIKE '/git/%'
        OR path IN ('/robots.txt', '/favicon.txt')
        OR path LIKE '%/next'
        OR list_max(list_transform(
             list_filter(string_split(path, '/'), x -> x <> ''),
             x -> len(list_filter(list_filter(string_split(path, '/'), z -> z <> ''), y -> y = x))
           )) >= 3
        OR regexp_matches(regexp_extract('gemini://' || host || path, 'commits/.*'),
                          '^commits/[a-z0-9A-Z]+[/.]')
       ) AS blocked
FROM synth
""".strip(),
    "robots_rules": f"""
WITH {_URL_SYNTH_SQL}
SELECT doc_id, path,
       (path = '/cgi-bin' OR path = '/cgi-bin/'
        OR (length(path) > length('/cgi-bin') + 1
            AND path LIKE '/cgi-bin%'
            AND substr(path, length('/cgi-bin') + 1, 1) = '/')
        OR path LIKE '%.gmi'
        OR (path LIKE '/commits/%'
            AND (position('/diff' IN path) = 0 OR position('/diff' IN path) > 10))
       ) AS blocked
FROM synth
""".strip(),
    "extract_documents": _EXTRACT_SQL,
    "hits_rank": hits_sql(5),
    "salsa_rank": salsa_sql(5),
    "simhash_pairs": simhash_pairs_sql(),
    "dedup_merge_rules": _URL_FRAME_SQL.replace("uf AS (", "WITH uf AS MATERIALIZED (")
    + """
, parsed AS (
  SELECT doc_id AS id, content_hash AS h, url,
         lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) AS host,
         coalesce(regexp_extract(url, '^[a-z]+://[^/]+(/.*)?$', 1), '') AS path,
         regexp_replace(
           replace(replace(replace(url, '/~', chr(1)), '/users', chr(1)), '/user', chr(1)),
           '/$', '') AS norm
  FROM uf WHERE size > 0
),
sized AS (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY h) AS grp_n FROM parsed)
  WHERE grp_n <= 200
)
SELECT a.id AS id_a, b.id AS id_b,
       CASE WHEN a.host = b.host THEN 'same_host'
            WHEN a.path = b.path THEN 'same_path'
            WHEN a.norm = b.norm THEN 'norm_eq'
            WHEN suffix(b.url, a.host || a.path) OR suffix(a.url, b.host || b.path)
              THEN 'archive'
       END AS rule
FROM sized a JOIN sized b ON a.h = b.h AND a.id < b.id
WHERE CASE WHEN a.host = b.host THEN 'same_host'
           WHEN a.path = b.path THEN 'same_path'
           WHEN a.norm = b.norm THEN 'norm_eq'
           WHEN suffix(b.url, a.host || a.path) OR suffix(a.url, b.host || b.path)
             THEN 'archive'
      END IS NOT NULL
""",
    "simhash": _SIMHASH_SQL,
    "lang_id": lang_id_sql(),
    "host_backpressure": """
WITH frontier AS (
  SELECT doc_id AS item_id,
         'h' || (doc_id % 20) AS host,
         n_chars AS priority
  FROM documents
),
fails AS (
  SELECT 'h' || (doc_id % 20) AS host, (doc_id % 4)::BIGINT AS n_failures
  FROM documents WHERE doc_id % 9 = 0
),
tripped AS (
  SELECT host FROM fails GROUP BY host HAVING sum(n_failures) > 3
)
SELECT f.item_id, f.host,
       ((row_number() OVER (PARTITION BY f.host
                            ORDER BY f.priority DESC, f.item_id) - 1) // 2)::INT AS round
FROM frontier f LEFT JOIN tripped t USING (host)
WHERE t.host IS NULL
""",
    "ann_ivf_topk": ann_ivf_sql,
    "embedding_near_dup": """
WITH base AS (
  SELECT vec_id AS id, label, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, label, list_transform(embedding::DOUBLE[], x -> x * 2.0)
  FROM embeddings WHERE vec_id % 7 = 0
),
e AS (SELECT id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM base)
SELECT a.id AS id_a, b.id AS id_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
FROM e a JOIN e b ON a.label = b.label AND a.id < b.id
WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.35
""".strip(),
    "embedding_lsh_pairs": lsh_pairs_sql(),
    "combine_scores": """
WITH base AS (
  SELECT doc_id,
         (doc_id * 37 % 100) / 100.0 AS link,
         round(1.0 / (1 + doc_id % 13), 6) AS text_rank,
         n_chars
  FROM documents
),
m AS (SELECT max(link) AS mx FROM base),
p AS (
  SELECT doc_id, link,
         CASE WHEN n_chars > 300
              THEN text_rank / ln(exp(1.0) + (n_chars - 300) // 30)
              ELSE text_rank END AS t
  FROM base
),
f AS (
  SELECT p.doc_id,
         round(exp(6.5 * p.link / m.mx), 4) AS boost,
         round(2.0 * exp(6.5 * p.link / m.mx) * p.t
               / (exp(6.5 * p.link / m.mx) + p.t), 4) AS final
  FROM p CROSS JOIN m
)
SELECT doc_id, boost, final FROM f ORDER BY final DESC, doc_id LIMIT 50
""".strip(),
    "snippet_preview": snippet_sql(),
    "multimodal_features": _MULTIMODAL_SQL,
}
