"""Paired (Spark DataFrame, DuckDB oracle SQL) query registry.

Each entry is one operator/capability from SURVEY.md §2 or the
training-pipeline family, expressed twice: as an idiomatic Spark plan
and as ANSI SQL the driver runs in DuckDB over the same parquet views.
Column names, float rounding (4 dp), and LIMIT tie-breaks are pinned
identically on both sides so the order-insensitive value-hash matches.

The text pipeline here reuses the frozen tokenizer spec
(tlgs_spark.tokenizer) rendered as pure JVM expressions — identical to
the SQL CTE from tokens_cte_sql(), so no pandas UDF is needed for the
oracle-checked paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import bm25
from .tokenizer import (
    MAX_TOKEN_LEN,
    STOPWORDS,
    s_stem,
    stem_spark_stages,
    stem_sql_case,
    stopwords_sql_list,
    tokens_cte_sql,
)

TOKEN_PATTERN = "[a-z0-9]+"
_STOP = sorted(STOPWORDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) under the frozen tokenizer — the build's
    Arrow/RE2 batch tokenizer (same spec as the SQL CTE the oracles
    use; equivalence pinned by test_build_vectorized.py three-way)."""
    from .indexer.build import tokenize_tokens

    return tokenize_tokens(docs.select("doc_id", "text"))


def _dl(docs: DataFrame, tf: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id")
        .join(tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")), "doc_id", "left")
        .fillna(0, subset=["dl"])
    )


_CORPUS_CACHE: dict[tuple[int, str], dict] = {}


def _token_stats(spark: SparkSession, sf_dir: str) -> dict:
    """tf/dl/df + collection stats over the documents table, computed
    once per (session, sf_dir) and persisted. Queries share the
    tokenized corpus the way they share the inverted index in the real
    engine — re-tokenizing the whole corpus per query is the one thing
    an index exists to avoid."""
    key = (id(spark), sf_dir)
    hit = _CORPUS_CACHE.get(key)
    if hit is not None:
        return hit
    docs = _docs(spark, sf_dir)
    tf = _tf(docs).persist()
    dl = _dl(docs, tf).persist()
    dft = tf.groupBy("term").agg(F.count("*").alias("df")).persist()
    # dl has exactly one row per doc, so one action yields both stats
    n_docs, total_dl = dl.agg(F.count("*"), F.sum("dl")).collect()[0]
    out = {
        "docs": docs,
        "tf": tf,
        "dl": dl,
        "dft": dft,
        "n_docs": n_docs,
        "avgdl": float(total_dl) / n_docs,
    }
    _CORPUS_CACHE[key] = out
    return out


def _bm25_scored(spark, sf_dir, terms: list[str]) -> tuple[DataFrame, int]:
    """→ (doc_id, score(double, unrounded), n_matched), plus n_terms.
    Candidate generation = per-term postings join; idf/avgdl exact."""
    # query analyzer = doc analyzer; dedupe AFTER stemming (two raw
    # terms stemming to one form must count once in the AND cardinality
    # — mirrors tokenize_query, which dedupes post-stem)
    terms = list(dict.fromkeys(s_stem(t) for t in terms))
    st = _token_stats(spark, sf_dir)
    tf, dl, dft = st["tf"], st["dl"], st["dft"]
    n_docs, avgdl = st["n_docs"], st["avgdl"]
    m = (
        tf.filter(F.col("term").isin(terms))
        .join(F.broadcast(dft.filter(F.col("term").isin(terms))), "term")
        .join(dl, "doc_id")
    )
    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (
        F.col("tf")
        * (F.lit(bm25.K1) + 1.0)
        / (
            F.col("tf")
            + F.lit(bm25.K1)
            * (F.lit(1.0) - F.lit(bm25.B) + F.lit(bm25.B) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        m.withColumn("contrib", idf * tfn)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"), F.count("*").alias("n_matched"))
    )
    return scored, len(terms)


def _bm25_sql(terms: list[str], k: int, mode: str = "and", doc_filter: str = "TRUE",
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


def _topk(scored: DataFrame, k: int) -> DataFrame:
    return (
        scored.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.desc(F.round(F.col("score"), 4)), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, dict] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = {"fn": fn, "sql": sql}
        return fn

    return deco


AND_TERMS = ["spark", "stream", "window"]
OR_TERMS = ["vector", "dup", "customer"]


@q("bm25_topk_and", _bm25_sql(AND_TERMS, 20, "and"))
def bm25_topk_and(spark, sf_dir):
    """P1+W1: conjunctive BM25 top-k (plainto_tsquery AND semantics,
    search.cpp:441; BM25 per north rule)."""
    scored, n = _bm25_scored(spark, sf_dir, AND_TERMS)
    return _topk(scored.filter(F.col("n_matched") == n), 20)


@q("bm25_topk_or", _bm25_sql(OR_TERMS, 25, "or"))
def bm25_topk_or(spark, sf_dir):
    """W1 disjunctive variant (block-max WAND path in the engine)."""
    scored, _ = _bm25_scored(spark, sf_dir, OR_TERMS)
    return _topk(scored, 25)


_ENGINE_IDX_CACHE: dict[tuple[int, str], object] = {}


def _engine_index(spark: SparkSession, sf_dir: str):
    """Open (building at most once per corpus version) a REAL index
    over the documents table — through assign_doc_ids → tokenize →
    delta-gap + varint postings → block-max metadata — via SearchIndex.
    conv_id = zero-padded doc_id makes the builder's (conv_id,
    turn_idx) rank equal the table's doc_id, so engine results and the
    DuckDB oracle address identical documents.

    The built index is cached ON DISK keyed by a fingerprint of the
    source parquet (path, size, mtime) + analyzer version: the ~30
    Spark jobs of a full build cost ~10 s per bench session for a
    5k-doc corpus, which polluted the recorded entry time with harness
    cost (r2 VERDICT). A fingerprint mismatch (driver regenerated the
    test data, analyzer spec bumped) rebuilds from scratch."""
    key = (id(spark), sf_dir)
    hit = _ENGINE_IDX_CACHE.get(key)
    if hit is not None:
        return hit
    import hashlib
    import json
    import os
    import shutil
    import tempfile

    from .indexer.build import build_index
    from .query.engine import SearchIndex
    from .tokenizer import ANALYZER_VERSION

    src = f"{sf_dir}/documents.parquet"
    st_ = os.stat(src)
    fp = json.dumps(
        {"src": os.path.abspath(src), "size": st_.st_size,
         "mtime_ns": st_.st_mtime_ns, "analyzer": ANALYZER_VERSION, "n_shards": 8},
        sort_keys=True,
    )
    tag = hashlib.sha256(fp.encode()).hexdigest()[:16]
    idx = os.path.join(tempfile.gettempdir(), f"tlgs_entry_engine_idx_{tag}")
    fp_file = os.path.join(idx, "_entry_fingerprint.json")
    ok = False
    try:
        with open(fp_file) as f:
            ok = f.read() == fp
    except OSError:
        ok = False
    if not ok:
        shutil.rmtree(idx, ignore_errors=True)
        transcripts = _docs(spark, sf_dir).select(
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"),
            F.col("text"),
            F.lit(None).cast("string").alias("tool"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
        )
        build_index(spark, transcripts, idx, n_shards=8, lineage=f"entry:{sf_dir}")
        with open(fp_file, "w") as f:  # written LAST: marks a complete build
            f.write(fp)
    si = SearchIndex(spark, idx)
    _ENGINE_IDX_CACHE[key] = si
    return si


@q("engine_bm25_topk", _bm25_sql(AND_TERMS, 20, "and"))
def engine_bm25_topk(spark, sf_dir):
    """The REAL engine under the driver's oracle: build_index →
    posting codec (delta-gap varint, indexer/codec.py) → SearchIndex
    driver path (search_and intersection + exact scoring,
    query/scorer.py — plainto_tsquery AND semantics, search.cpp:441).
    Same DuckDB mirror as the declarative twin bm25_topk_and — the
    index is an access path, not a semantics change."""
    si = _engine_index(spark, sf_dir)
    res = si.search(" ".join(AND_TERMS), k=20, mode="and")
    sdf = spark.createDataFrame(
        res[["doc_id", "score"]], schema="doc_id long, score double"
    )
    return sdf.select("doc_id", F.round("score", 4).alias("score"))


@q("engine_bm25_wand_df", _bm25_sql(OR_TERMS, 25, "or"))
def engine_bm25_wand_df(spark, sf_dir):
    """Distributed engine path under the oracle: search_df scores each
    shard's decoded postings with the block-max pruned OR scorer
    (search_or, query/scorer.py) inside applyInPandas, then merges
    n_shards×k rows globally — the 100 TB serving shape."""
    si = _engine_index(spark, sf_dir)
    return si.search_df(" ".join(OR_TERMS), k=25, mode="or").select(
        "doc_id", F.round("score", 4).alias("score")
    )


@q(
    "bm25_filtered",
    _bm25_sql(AND_TERMS, 20, "and", doc_filter="doc.lang IN ('en','de')"),
)
def bm25_filtered(spark, sf_dir):
    """P3: post-rank filter, OR within type (lang∈{en,de})."""
    scored, n = _bm25_scored(spark, sf_dir, AND_TERMS)
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return _topk(
        scored.filter(F.col("n_matched") == n)
        .join(docs, "doc_id")
        .filter(F.col("lang").isin(["en", "de"])),
        20,
    )


@q(
    "bm25_negated_filter",
    _bm25_sql(AND_TERMS, 20, "and", doc_filter="doc.lang <> 'en'"),
)
def bm25_negated_filter(spark, sf_dir):
    """P3 negation (NOT lang:en) — XOR semantics, search.cpp:655-676."""
    scored, n = _bm25_scored(spark, sf_dir, AND_TERMS)
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return _topk(
        scored.filter(F.col("n_matched") == n).join(docs, "doc_id").filter(F.col("lang") != "en"),
        20,
    )


@q("bm25_page2", _bm25_sql(OR_TERMS, 10, "or", page=1))
def bm25_page2(spark, sf_dir):
    """W3 pagination: second 10-row page of the ranked list
    (search.cpp:756-758)."""
    scored, _ = _bm25_scored(spark, sf_dir, OR_TERMS)
    w = Window.orderBy(F.desc(F.round(F.col("score"), 4)), F.asc("doc_id"))
    return (
        scored.select("doc_id", F.round("score", 4).alias("score"))
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") >= 11) & (F.col("_rn") <= 20))
        .drop("_rn")
    )


@q(
    "conjunctive_match",
    f"""
WITH {tokens_cte_sql()},
q(term) AS (VALUES ('spark'), ('merge'))
SELECT tf.doc_id, count(*)::BIGINT AS n_matched
FROM tf JOIN q USING (term)
GROUP BY tf.doc_id HAVING count(*) = 2
""".strip(),
)
def conjunctive_match(spark, sf_dir):
    """P1 candidate generation alone: docs containing ALL query terms."""
    tf = _token_stats(spark, sf_dir)["tf"]
    return (
        tf.filter(F.col("term").isin(["spark", "merge"]))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") == 2)
    )


@q(
    "term_df_top50",
    f"""
WITH {tokens_cte_sql()}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 50
""".strip(),
)
def term_df_top50(spark, sf_dir):
    """A8: exact document frequency / collection frequency (the
    GIN-maintained stats made explicit; no approx allowed)."""
    tf = _token_stats(spark, sf_dir)["tf"]
    return (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )


@q(
    "doc_lengths",
    f"""
WITH {tokens_cte_sql()}
SELECT d.doc_id, coalesce(t.dl, 0)::BIGINT AS dl
FROM documents d
LEFT JOIN (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id) t USING (doc_id)
""".strip(),
)
def doc_lengths(spark, sf_dir):
    """BM25 length normalization table (pages.size analog)."""
    return _token_stats(spark, sf_dir)["dl"]


@q(
    "collection_stats",
    f"""
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
)
def collection_stats(spark, sf_dir):
    """A1: exact collection statistics — countDistinct, not approx."""
    st = _token_stats(spark, sf_dir)
    tf, dl = st["tf"], st["dl"]
    return (
        dl.agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("total_dl"),
            F.round(F.sum("dl") / F.count("*"), 6).alias("avgdl"),
        )
        .crossJoin(
            tf.agg(
                F.countDistinct("term").alias("n_terms"), F.count("*").alias("n_postings")
            )
        )
    )


@q(
    "stats_by_lang",
    "SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars "
    "FROM documents GROUP BY lang ORDER BY n DESC, lang",
)
def stats_by_lang(spark, sf_dir):
    """A2: group-by count ordered (tools.cpp:31-32 analog)."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .orderBy(F.desc("n"), F.asc("lang"))
    )


@q(
    "distinct_sources",
    "SELECT count(DISTINCT source)::BIGINT AS n_sources, count(*)::BIGINT AS n_docs "
    "FROM documents WHERE text IS NOT NULL",
)
def distinct_sources(spark, sf_dir):
    """A1/A3: COUNT(DISTINCT domain)-style exact stats (tools.cpp:29-30)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .agg(F.countDistinct("source").alias("n_sources"), F.count("*").alias("n_docs"))
    )


@q(
    "dedup_exact",
    "SELECT md5(text) AS h, min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_dups "
    "FROM documents GROUP BY md5(text) HAVING count(*) > 1",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup groups (content-hash dedup, J7/W4 analog)."""
    from .ops.dedup import exact_groups

    return exact_groups(_docs(spark, sf_dir)).filter(F.col("n_dups") > 1)


@q(
    "dedup_keep_best",
    """
SELECT lang, bucket, doc_id, n_chars FROM (
  SELECT lang, (n_chars // 100)::BIGINT AS bucket, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang, n_chars // 100
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn = 1
""".strip(),
)
def dedup_keep_best(spark, sf_dir):
    """W4 keep-best: one winner per (lang, size-bucket) group —
    window rank, keep max-quality tie-broken by id
    (search.cpp:555-625 keep-max-score analog)."""
    docs = _docs(spark, sf_dir).withColumn(
        "bucket", F.floor(F.col("n_chars") / 100).cast("long")
    )
    w = Window.partitionBy("lang", "bucket").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "bucket", "doc_id", "n_chars")
    )


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

def _bands_sql(n_bands: int = 4, rows_per_band: int = 2) -> str:
    """DuckDB mirror of ops.dedup.minhash_bands: one md5 per shingle,
    the hash family by hex rotation, band sig = concat of its r
    row-minima. Bit-identical to the Spark kernel (lowercase hex md5,
    1-based substr on both engines)."""
    from .ops.dedup import minhash_rotation_sql

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


_BANDS_SQL = _bands_sql()

_MINHASH_CACHE: dict[tuple[int, str], dict] = {}


def _minhash_parts(spark: SparkSession, sf_dir: str) -> dict:
    """Shared persisted shingles/bands/pairs for the three LSH-dedup
    entries — the shingle set is built once, not once per entry (the
    round-1 version re-derived it 4× across the family)."""
    from .ops.dedup import minhash_bands as mb, minhash_candidate_pairs, shingles

    key = (id(spark), sf_dir)
    hit = _MINHASH_CACHE.get(key)
    if hit is not None:
        return hit
    docs = _docs(spark, sf_dir)
    sh = shingles(docs).persist()
    bands = mb(docs, shingles_df=sh).persist()
    pairs = minhash_candidate_pairs(bands).persist()
    out = {"docs": docs, "sh": sh, "bands": bands, "pairs": pairs}
    _MINHASH_CACHE[key] = out
    return out


@q("minhash_bands", _BANDS_SQL + "\nSELECT doc_id, band::INT AS band, sig FROM sigs")
def minhash_bands(spark, sf_dir):
    """MinHash band signatures (LSH dedup stage 1): 3-gram shingles,
    md5 once per shingle, rotation hash family, r=2 rows per band."""
    return _minhash_parts(spark, sf_dir)["bands"].select(
        F.col("id").alias("doc_id"), F.col("band").cast("int").alias("band"), "sig"
    )


@q(
    "minhash_pairs",
    _BANDS_SQL
    + """
, sized AS (
  SELECT *, count(*) OVER (PARTITION BY band, sig) AS bucket_n FROM sigs
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM sized a JOIN sized b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
WHERE a.bucket_n <= 50 AND b.bucket_n <= 50
""",
)
def minhash_pairs(spark, sf_dir):
    """LSH candidate pairs (bucket join, skew-capped at 50)."""
    return _minhash_parts(spark, sf_dir)["pairs"].select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )


@q(
    "ngram_jaccard",
    _BANDS_SQL
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
)
def ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over LSH candidate pairs only (never
    all-pairs — the 100 TB-safe formulation)."""
    from .ops.dedup import jaccard_pairs

    parts = _minhash_parts(spark, sf_dir)
    return jaccard_pairs(
        parts["docs"], parts["pairs"], shingles_df=parts["sh"]
    ).select(F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard")


@q(
    "text_quality",
    f"""
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
)
def text_quality(spark, sf_dir):
    """The per-document text-analysis family in one oracle-paired pass
    (merged r3 so the driver's 50-row sweep covers every entry):
    quality signals (length, punctuation ratio, stopword ratio),
    token counting (whitespace + BPE-ish pre-tokenizer regex), and the
    normalized rolling fingerprint (F9/F12 analog). One projection,
    all JVM expressions — at 100 TB this is a single map-side pass."""
    from .ops.textstats import (
        BPE_PATTERN,
        fingerprint,
        punct_ratio,
        stopword_ratio,
        ws_token_count,
    )

    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        ws_token_count(t).cast("long").alias("ws_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        F.size(
            F.regexp_extract_all(F.lower(t), F.lit(BPE_PATTERN), F.lit(0))
        ).cast("long").alias("bpe_ish_tokens"),
        fingerprint(t).alias("fp"),
    )


@q(
    "embedding_topk",
    """
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
)
def embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k similarity search (exact ANN baseline)."""
    from .ops.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    return cosine_topk(emb, [float(x) for x in qv], k=10, exclude_id=0)


@q(
    "events_tumbling",
    """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
       count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
""".strip(),
)
def events_tumbling(spark, sf_dir):
    """Tumbling-window aggregate (Structured-Streaming-equivalent batch
    semantics; watermark/late-data story lives in streaming/)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))


@q(
    "events_sessions",
    """
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
)
def events_sessions(spark, sf_dir):
    """Session windows (30-min gap) via lag+cumsum — the batch
    formulation of stateful sessionization."""
    ev = _read(spark, sf_dir, "events").withColumn("es", F.unix_timestamp("ts"))
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    gap = F.col("es") - F.lag("es").over(w)
    x = ev.withColumn(
        "new_s", F.when(F.lag("es").over(w).isNull() | (gap > 1800), 1).otherwise(0)
    )
    y = x.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return y.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("es").alias("start_epoch"),
        F.max("es").alias("end_epoch"),
    )


@q(
    "events_regex",
    """
SELECT event_type, count(*)::BIGINT AS n
FROM events WHERE regexp_matches(props, '"k": [0-9]{2}')
GROUP BY event_type ORDER BY event_type
""".strip(),
)
def events_regex(spark, sf_dir):
    """P5: regex predicate (security.txt scan analog, api.cpp:91-92)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").rlike('"k": [0-9]{2}'))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@q(
    "orders_date_window",
    """
SELECT o_orderpriority, count(*)::BIGINT AS n, round(sum(o_totalprice), 4) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-06-01'
  AND o_orderdate < TIMESTAMP '1995-06-01' + INTERVAL 90 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
""".strip(),
)
def orders_date_window(spark, sf_dir):
    """P4/F24: staleness-style interval predicate + date arithmetic."""
    o = _read(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp"))
            & (
                F.col("o_orderdate")
                < F.lit("1995-06-01").cast("timestamp") + F.expr("INTERVAL 90 DAYS")
            )
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .orderBy("o_orderpriority")
    )


@q(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""".strip(),
)
def pricing_summary(spark, sf_dir):
    """A2/W1 relational parity: hash agg with partial+final combine."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_LINKS_SQL = """
links AS (
  SELECT doc_id AS src, (doc_id * 7 + 3) % (SELECT count(*) FROM documents) AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 5) % (SELECT count(*) FROM documents) FROM documents
)
""".strip()


@q(
    "backlinks",
    f"""
WITH {_LINKS_SQL}
SELECT src, dst, (src % 10 <> dst % 10) AS is_cross
FROM links WHERE dst = 42 AND src <> dst ORDER BY src
""".strip(),
)
def backlinks(spark, sf_dir):
    """J5: backlink lookup over a deterministic synthetic link graph
    (links WHERE to_url = $1, search.cpp:873-884), internal/cross split."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 3) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 13 + 5) % n).alias("dst"))
    links = e1.unionAll(e2)
    return (
        links.filter((F.col("dst") == 42) & (F.col("src") != F.col("dst")))
        .withColumn("is_cross", (F.col("src") % 10) != (F.col("dst") % 10))
        .orderBy("src")
    )


@q(
    "source_like",
    "SELECT source, count(*)::BIGINT AS n FROM documents "
    "WHERE source LIKE 'src1%' GROUP BY source ORDER BY source",
)
def source_like(spark, sf_dir):
    """P6: LIKE predicate (purge-by-pattern analog, tlgs_ctl/main.cpp:90-92)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("source").like("src1%"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy("source")
    )


@q(
    "stale_count",
    """
SELECT count(*)::BIGINT AS n_stale
FROM events
WHERE ts IS NULL OR ts < TIMESTAMP '2024-01-28' - INTERVAL 3 DAY
""".strip(),
)
def stale_count(spark, sf_dir):
    """A4/P4: staleness predicate + count (pages needing re-crawl:
    last_crawled_at < now()-'3 days' OR IS NULL, crawler.cpp:110-113;
    stale count tlgs_ctl/main.cpp:102-103). Anchor pinned for
    determinism; the IS NULL disjunct mirrors never-crawled rows."""
    ev = _read(spark, sf_dir, "events")
    anchor = F.lit("2024-01-28").cast("timestamp") - F.expr("INTERVAL 3 DAYS")
    return ev.filter(F.col("ts").isNull() | (F.col("ts") < anchor)).agg(
        F.count("*").alias("n_stale")
    )


@q(
    "inlist_hydrate",
    """
SELECT doc_id, source, n_chars
FROM documents WHERE doc_id IN (3, 17, 42, 99, 123, 256, 511, 1024, 2047, 4095)
ORDER BY doc_id
""".strip(),
)
def inlist_hydrate(spark, sf_dir):
    """J3: IN-list semi-join — preview hydration of a result page's ids
    (url IN (...), search.cpp:761-779). isin() on a literal id set; at
    scale the same plan is a broadcast semi-join against the top-k."""
    ids = [3, 17, 42, 99, 123, 256, 511, 1024, 2047, 4095]
    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@q(
    "corpus_hygiene",
    """
SELECT doc_id,
       regexp_matches(text, '[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]') AS has_ctrl,
       (n_chars > 48000) AS too_large,
       len(regexp_extract_all(text, '\\n[-=_~*#]{3,}'))::BIGINT AS n_sep_lines
FROM documents
""".strip(),
)
def corpus_hygiene(spark, sf_dir):
    """P7/P9/F18 analog: corpus-hygiene flags — control chars
    (crawler.cpp:250-251), oversize (48 kB penalty threshold,
    search.cpp:549-551), separator-line count (isAsciiArt family)."""
    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        t.rlike("[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]").alias("has_ctrl"),
        (F.col("n_chars") > 48000).alias("too_large"),
        F.size(F.regexp_extract_all(t, F.lit("\\n[-=_~*#]{3,}"), F.lit(0)))
        .cast("long")
        .alias("n_sep_lines"),
    )


_REDIRECTS_SQL = """
redirects AS (
  SELECT doc_id AS from_id, (doc_id * 3 + 7) % (SELECT count(*) FROM documents) AS to_id
  FROM documents WHERE doc_id % 5 = 0
)
""".strip()


@q(
    "redirect_resolve",
    f"""
WITH {_REDIRECTS_SQL},
h0 AS (SELECT doc_id, doc_id AS cur FROM documents),
h1 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h0 LEFT JOIN redirects r ON r.from_id = cur),
h2 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h1 LEFT JOIN redirects r ON r.from_id = cur),
h3 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h2 LEFT JOIN redirects r ON r.from_id = cur),
h4 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h3 LEFT JOIN redirects r ON r.from_id = cur),
h5 AS (SELECT doc_id, coalesce(r.to_id, cur) AS cur FROM h4 LEFT JOIN redirects r ON r.from_id = cur)
SELECT doc_id, cur AS final_id FROM h5 WHERE doc_id <> cur
""".strip(),
)
def redirect_resolve(spark, sf_dir):
    """J6: redirect-chain resolution, ≤5 hops (perma_redirects loop,
    crawler.cpp:372-399) — iterative left joins."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    redirects = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("from_id"),
            ((F.col("doc_id") * 3 + 7) % n).alias("to_id"),
        )
    )
    cur = docs.select("doc_id", F.col("doc_id").alias("cur"))
    for _ in range(5):
        cur = (
            cur.join(redirects, cur.cur == redirects.from_id, "left")
            .select("doc_id", F.coalesce("to_id", "cur").alias("cur"))
        )
    return cur.filter(F.col("doc_id") != F.col("cur")).select(
        "doc_id", F.col("cur").alias("final_id")
    )


@q(
    "base_set_expansion",
    f"""
WITH {tokens_cte_sql()},
{_LINKS_SQL},
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark')
SELECT DISTINCT l.src AS doc_id, (l.src % 10 <> l.dst % 10) AS is_cross
FROM links l JOIN matched m ON l.dst = m.doc_id
WHERE l.src <> l.dst
""".strip(),
)
def base_set_expansion(spark, sf_dir):
    """J1: base-set expansion — pages linking INTO matched pages
    (pages JOIN links ON to_url, search.cpp:443-446)."""
    st = _token_stats(spark, sf_dir)
    docs, n = st["docs"], st["n_docs"]
    matched = st["tf"].filter(F.col("term") == "spark").select("doc_id").distinct()
    e1 = docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 3) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 13 + 5) % n).alias("dst"))
    links = e1.unionAll(e2).filter(F.col("src") != F.col("dst"))
    return (
        links.join(F.broadcast(matched.withColumnRenamed("doc_id", "dst")), "dst")
        .select(F.col("src").alias("doc_id"), ((F.col("src") % 10) != (F.col("dst") % 10)).alias("is_cross"))
        .distinct()
    )


@q(
    "union_with_priority",
    f"""
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
)
def union_with_priority(spark, sf_dir):
    """U1: root ∪ base with root priority (first-occurrence-wins dedup,
    search.cpp:464-483)."""
    st = _token_stats(spark, sf_dir)
    docs, n = st["docs"], st["n_docs"]
    matched = st["tf"].filter(F.col("term") == "spark").select("doc_id").distinct()
    roots = matched.withColumn("is_root", F.lit(True))
    e1 = docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 3) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 13 + 5) % n).alias("dst"))
    links = e1.unionAll(e2).filter(F.col("src") != F.col("dst"))
    base = (
        links.join(matched.withColumnRenamed("doc_id", "dst"), "dst")
        .select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("is_root", F.lit(False))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("is_root"))
    return (
        roots.unionByName(base)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _title_stats(spark: SparkSession, sf_dir: str, n_docs: int) -> dict:
    """Title-field stats: ONE persisted (doc_id, term, tf) frame over
    the first-5-token 'title' field, materialized by a single job that
    also collects the field's total length (avgdl = total/n_docs; the
    field shares the documents grid so n_docs comes from _token_stats).
    Per-doc dl and per-term df are ALSO persisted (docs with no title
    tokens have dl 0 and can never appear on the matched side, so the
    full-docs left join the oracle writes is value-equal) — before
    that, each bm25f call re-ran both groupBys over the full tf frame.
    Before the tf cache itself the title side was re-derived lazily per
    call and Catalyst re-ran the tokenize subtree for every join
    branch; the REAL persisted-field answer remains build_field_index /
    search_fielded, which serves this from a second inverted index."""
    key = (id(spark), sf_dir, "title")
    hit = _CORPUS_CACHE.get(key)
    if hit is not None:
        return hit
    docs = _docs(spark, sf_dir)
    t_raw = docs.select(
        "doc_id",
        F.explode(
            F.slice(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)),
                1,
                5,
            )
        ).alias("term"),
    ).filter((F.length("term") <= 64) & (~F.col("term").isin(_STOP)))
    _st1, _st2 = stem_spark_stages("term")
    t_toks = t_raw.select("doc_id", F.expr(_st1).alias("term")).select(
        "doc_id", F.expr(_st2).alias("term")
    )
    # ONE grouping-sets aggregation materializes every stat the scorer
    # needs — (doc_id,term)→tf, (doc_id)→dl, (term)→df, ()→total field
    # length — in a single shuffle + persist. The previous shape (three
    # persisted groupBys + a driver collect + a count) paid ~5 separate
    # job launches / codegen compiles of cold cost for 21k rows of data.
    t_all = (
        t_toks.groupingSets(
            [["doc_id", "term"], ["doc_id"], ["term"], []], "doc_id", "term"
        )
        .agg(
            F.count("*").alias("cnt"),
            F.count_distinct("doc_id").alias("ndocs"),
            F.grouping_id().alias("gid"),
        )
        .persist()
    )
    # gid bits: 0b00=(doc_id,term) 0b01=(doc_id) 0b10=(term) 0b11=()
    _glob = t_all.filter(F.col("gid") == 3).select("cnt").collect()
    total_dl = int(_glob[0][0]) if _glob and _glob[0][0] is not None else 0
    t_tf = t_all.filter(F.col("gid") == 0).select("doc_id", "term", F.col("cnt").alias("tf"))
    t_dl = t_all.filter(F.col("gid") == 1).select("doc_id", F.col("cnt").alias("dl"))
    t_dft = t_all.filter(F.col("gid") == 2).select("term", F.col("ndocs").alias("df"))
    out = {"tf": t_tf, "dl": t_dl, "dft": t_dft, "avgdl": float(total_dl) / n_docs}
    _CORPUS_CACHE[key] = out
    return out


_TITLE_EXPR_SQL = "array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:5], ' ')"


@q(
    "bm25f_title_weighted",
    f"""
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
)
def bm25f_title_weighted(spark, sf_dir):
    """W1: field-weighted scoring — title×50 + body (ts_rank_cd(title)*50
    + ts_rank_cd(body), search.cpp:438-442). 'Title' = first 5 tokens
    (the transcript analog of the page heading).

    Both fields serve from session-persisted token stats (_token_stats /
    _title_stats) — the per-call plan is two broadcast-join scoring
    passes over in-memory frames plus one left join, the way the real
    engine serves field stats from its indexes."""
    terms = ["spark", "window"]
    st = _token_stats(spark, sf_dir)

    # ---- body: cached tf/dl/df + Python-scalar stats (free, shared) --
    body_m = (
        st["tf"].filter(F.col("term").isin(terms))
        .join(F.broadcast(st["dft"].filter(F.col("term").isin(terms))), "term")
        .join(st["dl"], "doc_id")
    )
    b_idf = F.log(F.lit(1.0) + (F.lit(st["n_docs"]) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    b_tfn = F.col("tf") * 2.2 / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.lit(st["avgdl"]))
    )
    body = (
        body_m.withColumn("contrib", b_idf * b_tfn)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("body_score"), F.count("*").alias("nm"))
        .filter(F.col("nm") == len(terms))
    )

    # ---- title: session-persisted field stats (see _title_stats) ----
    ts = _title_stats(spark, sf_dir, st["n_docs"])
    t_m = (
        ts["tf"].filter(F.col("term").isin(terms))
        .join(F.broadcast(ts["dft"].filter(F.col("term").isin(terms))), "term")
        .join(ts["dl"], "doc_id")
    )
    t_idf = F.log(
        F.lit(1.0) + (F.lit(st["n_docs"]) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    t_tfn = F.col("tf") * 2.2 / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.lit(ts["avgdl"]))
    )
    title = (
        t_m.withColumn("contrib", t_idf * t_tfn)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("title_score"))
    )

    combined = (
        body.join(title, "doc_id", "left")
        .withColumn(
            "score",
            F.round(50.0 * F.coalesce(F.col("title_score"), F.lit(0.0)) + F.col("body_score"), 4),
        )
        .select("doc_id", "score")
    )
    return combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)



# single source of truth for the synthetic URL cases — rendered once as
# SQL (oracle side) and once as a Column (Spark side) so the two can't
# drift apart
_SYNTH_HOSTS = ["git.example.org", "127.0.0.9", "capsule.onion", "good.example",
                "other.example"]
_SYNTH_PATHS = ["/git/repo", "/orbit/next", "/cgi/cgi/cgi/x", "/commits/abc123/diff",
                "/posts/2024/hello.gmi", "/robots.txt", "/blog/entry"]


def _case_sql(values: list[str]) -> str:
    whens = "\n           ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values[:-1])
    )
    return f"CASE doc_id % {len(values)}\n           {whens}\n           ELSE '{values[-1]}' END"


def _case_col(values: list[str]):
    col = F.when(F.col("doc_id") % len(values) == 0, values[0])
    for i, v in enumerate(values[1:-1], start=1):
        col = col.when(F.col("doc_id") % len(values) == i, v)
    return col.otherwise(values[-1])


_URL_SYNTH_SQL = f"""
synth AS (
  SELECT doc_id,
         {_case_sql(_SYNTH_HOSTS)} AS host,
         {_case_sql(_SYNTH_PATHS)} AS path
  FROM documents
)
""".strip()


@q(
    "url_blacklist",
    f"""
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
)
def url_blacklist(spark, sf_dir):
    """P7/P9: URL-hygiene heuristics (crawler blacklist,
    blacklist.cpp:283-350) over a deterministic synthetic URL column —
    git hosts/paths, localhost subnet, .onion, webring endpoints,
    repeated path components, commit-hash paths. The Spark side is the
    real `blacklist_column` operator (JVM predicates, no UDF)."""
    from .ops.blacklist import blacklist_column

    docs = _docs(spark, sf_dir)
    host = _case_col(_SYNTH_HOSTS)
    path = _case_col(_SYNTH_PATHS)
    synth = docs.select(
        "doc_id", F.concat(F.lit("gemini://"), host, path).alias("url")
    )
    return synth.select(
        "doc_id", "url", blacklist_column(F.col("url")).alias("blocked")
    )


# ---------------------------------------------------------------------------
# Spark-only entries (no SQL oracle → driver records rows-only check):
# iterative link analysis, vectorized-UDF ops, recall-based ANN.
# ---------------------------------------------------------------------------


@q(
    "robots_rules",
    f"""
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
)
def robots_rules(spark, sf_dir):
    """P8/F26: robots.txt disallow matching as JVM predicates
    (wildcardPathMatch, robots_txt_parser.cpp:67-122) over the same
    synthetic paths as url_blacklist. Rules exercise the literal
    /-boundary case, a '*'-prefix suffix match, and a middle-star
    pattern; the oracle states the same semantics in plain SQL,
    including the middle-star npos quirk (suffix absent ⇒ match,
    robots_txt_parser.cpp:103 rfind)."""
    from .ops.robots import blocked_path_column

    docs = _docs(spark, sf_dir)
    path = _case_col(_SYNTH_PATHS)
    rules = ["/cgi-bin", "*.gmi", "/commits/*/diff"]
    return docs.select(
        "doc_id",
        path.alias("path"),
        blocked_path_column(path, rules).alias("blocked"),
    )


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


@q("extract_documents", _EXTRACT_SQL)
def extract_documents_entry(spark, sf_dir):
    """F19-F22 chain: charset decode + binary sniff + MIME dispatch +
    gemtext concise extraction + feed classification
    (crawler.cpp:415-496, gemini_parser.cpp:36-160) over synthesized
    crawl responses. Oracle-paired since r2: the DuckDB mirror
    replays the whole concise transform (preformat state via window
    sums, link labels, heading strips, hygiene drops, gemsub
    gaps-and-islands) and compares title/body/links/feed/size."""
    from .ops.extract import extract_documents

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    ds = d.cast("string")
    cls = d % 21
    twtxt = (cls != 7) & (cls != 14) & (d % 3 == 1) & (d % 5 == 0)
    url = F.concat(
        F.lit("gemini://h/"), ds,
        F.when(twtxt, F.lit("/twtxt.txt")).otherwise(F.lit("")),
    )
    plain_body = F.concat(F.lit("# Doc "), ds, F.lit("\n"), F.substring("text", 1, 500))
    dated = F.when(
        d % 6 == 0,
        F.lit("=> /p1 2024-01-02 one\n=> /p2 2024-01-03 two\n=> /p3 2024-02-04 three\n"),
    ).otherwise(F.lit(""))
    gem_body = F.concat(
        F.lit("# Doc "), ds,
        F.lit("\n=> gemini://l"), ds, F.lit("/a First link"),
        F.lit("\n=> gemini://l"), ds, F.lit("/b"),
        F.lit("\n## Section "), ds, F.lit("\n"),
        F.substring("text", 1, 200),
        F.lit("\n```ascii banner\nART-"), ds,
        F.lit("\n```\n```code\nkept pre "), ds,
        F.lit("\n```\n---===---\n#####\n│tree│\n"),
        dated,
        F.lit("plain tail "), ds,
    )
    body = F.when(d % 3 == 0, gem_body).otherwise(plain_body)
    raw = docs.select(
        url.alias("url"),
        F.when(cls == 7, F.lit(11)).otherwise(F.lit(20)).alias("status"),
        F.when(d % 3 == 0, "text/gemini")
        .when(d % 3 == 1, "text/plain")
        .otherwise("application/rss+xml")
        .alias("mime"),
        F.lit("utf-8").alias("charset"),
        # cls 14: bytes that decode to nothing — the binary-sniff drop
        F.when(cls == 14, F.unhex(F.lit("FF" * 64))).otherwise(
            F.encode(body, "utf-8")
        ).alias("raw"),
    )
    return extract_documents(raw).select(
        "url", "title", "feed_type", "body",
        F.size("links").cast("long").alias("n_links"),
        F.col("size").cast("long").alias("size"),
    )


def _synth_links(spark, sf_dir):
    """Deterministic skewed digraph: dst = src % 97 concentrates
    in-degree on the first 97 nodes (hub/authority structure for
    SALSA/HITS, FIXTURES.md §2 'power-law digraph' stand-in).
    Capped at 500 nodes: these feed fixed-iteration *entry* queries,
    and iterative-join latency is O(iters), not O(nodes) — the
    operator's scale behavior is exercised by the graph tests."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    n = docs.count()
    e1 = docs.select(F.col("doc_id").alias("src"), (F.col("doc_id") % 97).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 3) % n).alias("dst"))
    return e1.unionAll(e2).filter(F.col("src") != F.col("dst"))


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


def _hits_sql(iters: int = 5) -> str:
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


def _salsa_sql(iters: int = 5) -> str:
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


@q("hits_rank", _hits_sql(5))
def hits_rank_entry(spark, sf_dir):
    """A5: HITS neighbor-sum iteration over the synthetic link graph,
    reference recurrence (search.cpp:253-306: Jacobi, keep-old-on-zero,
    max(sum,1) normalization, float-eps flush); fixed 5 iterations
    (eps=0) so the unrolled DuckDB CTE mirror is exact."""
    from .graph import hits_rank

    return hits_rank(_synth_links(spark, sf_dir), max_iter=5, eps=0.0).select(
        "node", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


@q("salsa_rank", _salsa_sql(5))
def salsa_rank_entry(spark, sf_dir):
    """A6: SALSA bipartite two-hop average, reference recurrence
    (search.cpp:316-412: all nodes classified, one combined vector,
    previous-sum normalization); fixed 5 iterations (eps=0), unrolled
    CTE oracle."""
    from .graph import salsa_rank

    return salsa_rank(_synth_links(spark, sf_dir), max_iter=5, eps=0.0).select(
        "node", "side", F.round("score", 6).alias("score")
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


def _simhash_pairs_sql() -> str:
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


@q("simhash_pairs", _simhash_pairs_sql())
def simhash_pairs_entry(spark, sf_dir):
    """SimHash near-dup pairs: band buckets (full recall for Hamming
    ≤ n_bands-1 by pigeonhole, never all-pairs) + exact per-nibble
    bit_count(xor) verify — over documents augmented with synthesized
    near-duplicates."""
    from .ops.dedup import simhash_hamming_pairs

    d = _docs(spark, sf_dir)
    aug = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" dupmarker extra")).alias("text"),
        )
    )
    return simhash_hamming_pairs(aug).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.col("hamming").cast("int"),
    )


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


def _url_frame(spark, sf_dir):
    """Deterministic URL-bearing frame over documents: 50 content-hash
    groups × 5 URL shapes exercising every W4 rule (plain, trailing
    slash, /~user, /users/, archive-mirror)."""
    d = _docs(spark, sf_dir)
    h = F.col("doc_id") % 50
    hostn = F.col("doc_id") % 7
    page = F.concat(F.lit("host"), hostn, F.lit(".example/page"), h)
    url = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("gemini://"), page))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("gemini://"), page, F.lit("/")))
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(F.lit("gemini://host"), hostn, F.lit(".example/~alice/page"), h),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit("gemini://host"), hostn, F.lit(".example/users/alice/page"), h),
        )
        .otherwise(F.concat(F.lit("gemini://archive.example/"), page))
    )
    return d.select(
        "doc_id",
        h.alias("content_hash"),
        F.col("n_chars").alias("size"),
        F.col("n_chars").cast("double").alias("score"),
        url.alias("url"),
    )


@q(
    "dedup_merge_rules",
    _URL_FRAME_SQL.replace("uf AS (", "WITH uf AS MATERIALIZED (")
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
)
def dedup_merge_rules(spark, sf_dir):
    """W4 generic URL-equivalence pair predicate (search.cpp:555-625):
    same-host / same-path / token-normalized (~user ≈ /users ≈ /user,
    trailing slash) / archive-suffix rules within content-hash groups.
    Hash-bucketed self-join with an explicit group-size cap — the
    100 TB-safe shape (never all-pairs)."""
    from .ops.dedup import url_merge_pairs

    return url_merge_pairs(_url_frame(spark, sf_dir)).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "rule"
    )


@q("simhash", _SIMHASH_SQL)
def simhash_entry(spark, sf_dir):
    """SimHash fingerprints (near-dup family) — pure JVM expression
    kernel (md5 token hash + bit aggregation in whole-stage codegen;
    no Python in the data plane), oracle-paired since r2."""
    from .ops.textstats import simhash64

    return simhash64(_docs(spark, sf_dir)).select("doc_id", "simhash")


def _lang_id_sql() -> str:
    """DuckDB mirror of ops.textstats.lang_id_ngram (spec v2):
    non-overlapping weighted n-gram counts on the boundary-padded text
    via replace-delta (≡ re.escape'd str.count for literal grams —
    both scan left-to-right non-overlapping), INTEGER weights so both
    engines sum exactly, argmax first-wins in profile order, all-zero
    → 'und', CJK ratio ≥ 0.3 (unpadded text) → 'zh'."""
    from .ops.textstats import CJK_RANGE, CJK_THRESHOLD, LANG_PROFILES

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


@q("lang_id", _lang_id_sql())
def lang_id_entry(spark, sf_dir):
    """Language ID (weighted char-n-gram profiles over 6 languages +
    CJK, Arrow-vectorized); oracle-paired since r2, spec v2 since r3
    (validated on a labeled sentence set in tests/test_ops.py)."""
    from .ops.textstats import lang_id_ngram

    return lang_id_ngram(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


@q(
    "host_backpressure",
    """
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
)
def host_backpressure(spark, sf_dir):
    """I6: host circuit breaker + politeness rounds
    (crawler.cpp:163-167 'do not crawl hosts known to be down', batch
    dispersion) as declarative window/anti-join over a synthesized
    work frontier — at most per_host_cap items per host per round."""
    from .ops.politeness import polite_schedule

    d = _docs(spark, sf_dir)
    frontier = d.select(
        F.col("doc_id").alias("item_id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 20)).alias("host"),
        F.col("n_chars").alias("priority"),
    )
    failures = d.filter(F.col("doc_id") % 9 == 0).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20)).alias("host"),
        (F.col("doc_id") % 4).cast("long").alias("n_failures"),
    )
    return polite_schedule(
        frontier, failures, priority_col="priority", per_host_cap=2
    ).select("item_id", "host", "round")


_IVF_N_CENTROIDS, _IVF_ITERS, _IVF_N_PROBE = 8, 8, 3
_IVF_CENT_CACHE: dict[str, "object"] = {}


def _ivf_centroids(sf_dir: str):
    """Deterministic IVF training for the oracle pairing: read the
    embeddings table directly (pyarrow, vec_id-sorted, first ≤50k —
    partitioning-independent, unlike a Spark seeded sample), run the
    shared spherical-k-means kernel, round to 6 dp so the SAME double
    literals feed the Spark expressions and the DuckDB SQL."""
    import numpy as np
    import pyarrow.parquet as pq

    hit = _IVF_CENT_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    from .ops.similarity import ivf_fit_np

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vec_ids = tbl["vec_id"].to_numpy()
    order = np.argsort(vec_ids)[:50_000]
    emb = tbl["embedding"].to_pylist()  # one Arrow→Python conversion
    x = np.asarray(emb, dtype=np.float64)[order]
    cents = np.round(
        ivf_fit_np(x, n_centroids=_IVF_N_CENTROIDS, iters=_IVF_ITERS, seed=42), 6
    )
    q_idx = np.nonzero(vec_ids == 0)[0]
    if q_idx.size == 0:
        raise ValueError(f"no vec_id==0 query row in {sf_dir}/embeddings.parquet")
    q_row = np.asarray(emb[int(q_idx[0])], dtype=np.float64)
    out = (cents, q_row)
    _IVF_CENT_CACHE[sf_dir] = out
    return out


def _ivf_probes(cents, qv) -> list[int]:
    """Mirror of ivf_search's probe selection (argsort desc, first
    n_probe) — shared by the entry and the SQL generator."""
    import numpy as np

    q = np.asarray(qv, dtype=np.float64)
    sims = cents @ (q / np.linalg.norm(q))
    return [int(i) for i in np.argsort(-sims)[:_IVF_N_PROBE]]


def _ann_ivf_sql(sf_dir: str) -> str:
    """DuckDB mirror of assign → n_probe bucket pruning → cosine top-k
    with the FITTED centroids embedded as literals (same 6-dp doubles
    the Spark plan uses; probe ids computed by the same numpy code as
    ivf_search)."""
    cents, qv = _ivf_centroids(sf_dir)
    probes = ", ".join(str(p) for p in _ivf_probes(cents, qv))
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


@q("ann_ivf_topk", _ann_ivf_sql)
def ann_ivf_entry(spark, sf_dir):
    """IVF-bucketed approximate NN (the scale path: bucket pruning on
    the centroid-id column; exact recall is embedding_topk's job).
    Centroids are FITTED (spherical k-means, shared kernel) from a
    deterministic vec_id-sorted parquet read, so the fitted literals
    are a pure function of the data and the whole
    assign→probe→cosine-top-k chain is oracle-paired since r3."""
    from .ops.similarity import ivf_assign, ivf_search

    emb = _read(spark, sf_dir, "embeddings")
    cents, qv = _ivf_centroids(sf_dir)
    assigned, cents = ivf_assign(emb, centroids=cents)
    return ivf_search(
        assigned.filter(F.col("vec_id") != 0), cents, list(qv), k=10,
        n_probe=_IVF_N_PROBE,
    )


@q(
    "embedding_near_dup",
    """
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
)
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup detection with label blocking (the
    near-dup family's vector member; never all-pairs across blocks).
    The synthetic corpus has no organic duplicates, so the entry plants
    scaled copies (cosine-invariant ⇒ cos 1.0) of every 7th vector and
    keeps the threshold low enough to also catch the closest organic
    within-block pairs."""
    from .ops.dedup import embedding_near_dup_pairs

    emb = _read(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        # ×2 is exact in binary float, so the float cast loses nothing and
        # keeps the union's column type identical to the base table's
        F.transform("embedding", lambda x: x * F.lit(2.0)).cast("array<float>").alias("embedding"),
        "label",
    )
    return embedding_near_dup_pairs(
        emb.select("vec_id", "embedding", "label").unionByName(planted), threshold=0.35
    )


def _lsh_planes():
    """16 deterministic hyperplanes over the 64-dim embedding space,
    rounded to 6 dp so the SAME literals appear in the Spark
    expressions and the DuckDB SQL (seeded PCG64 — identical in every
    process)."""
    import numpy as np

    return np.round(np.random.default_rng(7).standard_normal((16, 64)), 6)


def _lsh_pairs_sql(threshold: float = 0.95, n_bands: int = 4) -> str:
    H = _lsh_planes()
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


@q("embedding_lsh_pairs", _lsh_pairs_sql())
def embedding_lsh_pairs_entry(spark, sf_dir):
    """Unlabeled embedding near-dup via random-hyperplane LSH: the
    blocking-key-free scale path (sign signatures → band buckets →
    exact cosine verify; planted scaled copies share every sign bit,
    so their recall is 1.0 by construction)."""
    from .ops.dedup import embedding_lsh_pairs

    emb = _read(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).cast("array<float>").alias("embedding"),
        "label",
    )
    aug = emb.select("vec_id", "embedding").unionByName(
        planted.select("vec_id", "embedding")
    )
    return embedding_lsh_pairs(aug, _lsh_planes(), threshold=0.95).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "cos"
    )


@q(
    "combine_scores",
    """
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
)
def combine_scores_entry(spark, sf_dir):
    """F13/A7: the reference's combine stage as a declarative plan —
    exp link boost over the A7 max, size penalty past a threshold,
    harmonic-mean merge (search.cpp:536-553; the size penalty divides
    in size_t, so both sides floor the scaled offset). Link/text inputs
    are deterministic functions of doc_id; threshold/scale are the same
    formula at corpus-sized constants (48 kB → 300 chars)."""
    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id",
        ((F.col("doc_id") * 37 % 100) / 100.0).alias("link"),
        F.round(1.0 / (1 + F.col("doc_id") % 13), 6).alias("text_rank"),
        "n_chars",
    )
    mx = base.agg(F.max("link").alias("mx"))
    t = F.when(
        F.col("n_chars") > 300,
        F.col("text_rank")
        / F.log(F.exp(F.lit(1.0)) + F.floor((F.col("n_chars") - 300) / 30)),
    ).otherwise(F.col("text_rank"))
    boost = F.exp(6.5 * F.col("link") / F.col("mx"))
    return (
        base.crossJoin(F.broadcast(mx))
        .select(
            "doc_id",
            F.round(boost, 4).alias("boost"),
            F.round(2.0 * boost * t / (boost + t), 4).alias("final"),
        )
        .orderBy(F.desc("final"), F.asc("doc_id"))
        .limit(50)
    )


_SNIPPET_TERMS = ("spark", "data", "window")


def _snippet_sql() -> str:
    """DuckDB mirror of query.snippet.make_snippet under the frozen
    spec: sanitize (newline/tab/backtick → space, leading gemtext
    markers stripped, runs collapsed, strip), single-space word split,
    [a-z0-9]-normalized + S-STEMMED match (ts_headline goes through
    the same stemmer as retrieval), first-hit 23–37 word window with
    left padding, [word] highlighting."""
    terms_in = "(" + ", ".join(f"'{s_stem(t)}'" for t in _SNIPPET_TERMS) + ")"
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


@q("snippet_preview", _snippet_sql())
def snippet_preview_entry(spark, sf_dir):
    """F11/F12: ts_headline-analog snippet over the first 5 kB — 23-37
    word window, [term] highlighting, sanitize (search.cpp:62-70,
    773-779). Vectorized over an Arrow batch; oracle-paired since r2
    (the window/highlight spec rendered as DuckDB list ops)."""
    import pandas as pd

    from .query.snippet import make_snippet

    # make_snippet's term contract: analyzer output, stemmed exactly
    # once (the SQL twin embeds the same s_stem(t) literals)
    terms = [s_stem(t) for t in _SNIPPET_TERMS]

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "preview": [make_snippet(t, terms) for t in pdf["text"]],
                }
            )

    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .mapInPandas(run, schema="doc_id long, preview string")
        .orderBy("doc_id")
    )


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


@q("multimodal_features", _MULTIMODAL_SQL)
def multimodal_features_entry(spark, sf_dir):
    """Multimodal plumbing in one entry, now HASH-CHECKED (r3 closed
    the registry's last rows-only row): md5-chain payloads (images are
    REAL PPMs whose pixels are the chain — decode_image parses every
    one inside image_chain_stats) + content digests + the per-
    (media_id, frame_ts_ms) video sampling plan (JVM sequence/explode).
    The DuckDB twin reproduces the chain bytes as hex strings, parses
    the image pixels back out per hex pair, and matches digests, byte
    sums, sizes, and frame rows exactly."""
    from .ops.multimodal import (
        frame_sample_plan,
        image_chain_stats,
        payload_digests,
        synth_media_chain,
    )

    media = synth_media_chain(spark)
    digests = payload_digests(media)
    null_l = F.lit(None).cast("long")
    img_rows = (
        digests.filter(F.col("kind") == "image")
        .join(image_chain_stats(media.filter(F.col("kind") == "image")), "media_id")
        .select(
            "media_id", null_l.alias("frame_ts_ms"), "kind", "n_bytes", "sha256",
            "sum_r", "sum_g", "sum_b",
        )
    )
    vid_rows = (
        digests.filter(F.col("kind") == "video")
        .join(frame_sample_plan(media, every_ms=5000), "media_id")
        .select(
            "media_id", F.col("frame_ts_ms").cast("long"), "kind", "n_bytes", "sha256",
            null_l.alias("sum_r"), null_l.alias("sum_g"), null_l.alias("sum_b"),
        )
    )
    return img_rows.unionByName(vid_rows).orderBy("media_id", "frame_ts_ms")


def entry_df(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: conjunctive BM25 top-20 over the documents corpus."""
    return bm25_topk_and(spark, sf_dir)


# The driver compares Spark vs DuckDB at this scale factor; SQL
# generators that embed data-derived literals (fitted IVF centroids)
# resolve against it. Local tests pass their own sf_dir.
DEFAULT_ORACLE_SF = "/root/testdata/sf0.01"


def resolve_sql(spec_sql, sf_dir: str = DEFAULT_ORACLE_SF) -> str | None:
    """SQL generators may embed data-derived literals (fitted IVF
    centroids), which needs the parquet at ``sf_dir``. If it's absent
    the ONE entry degrades to rows-only (None) instead of poisoning
    the whole oracle dict."""
    if not callable(spec_sql):
        return spec_sql
    try:
        return spec_sql(sf_dir)
    except (OSError, ValueError) as e:
        # fixture-shaped failures only (absent sf_dir, corrupt parquet —
        # pyarrow's ArrowInvalid subclasses ValueError — or a fixture
        # missing its query row): degrade THIS entry to rows-only.
        # Genuine programming errors (TypeError, KeyError, ...) must
        # propagate — swallowing them would silently shrink the oracle
        # coverage the correctness gate rests on.
        import warnings

        warnings.warn(
            f"oracle SQL generator failed ({e.__class__.__name__}: {e}); "
            f"entry degrades to rows-only"
        )
        return None


def queries_dict():
    return {name: spec["fn"] for name, spec in QUERIES.items()}


def oracle_sql_dict(sf_dir: str = DEFAULT_ORACLE_SF):
    """Every value is a runnable SQL string — entries whose generator
    degraded resolve to None and are DROPPED (rows-only), preserving
    the pre-generator contract consumers rely on."""
    out = {}
    for name, spec in QUERIES.items():
        if spec["sql"] is None:
            continue
        sql = resolve_sql(spec["sql"], sf_dir)
        if sql is not None:
            out[name] = sql
    return out
