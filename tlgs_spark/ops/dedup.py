"""Deduplication operators for training-data pipelines.

Scale notes (100 TB): every variant here avoids the O(n²) all-pairs
trap — exact dedup is one hash-shuffle; MinHash-LSH pairs only within
band buckets (bucket join); SimHash pairs only within band prefixes.
Skewed buckets (boilerplate text) are the hazard: cap bucket size or
salt, both exposed as parameters.

The reference's dedup is W4 (search.cpp:555-625): group by content
hash, merge URL-equivalent results, keep max score. For transcripts
that degenerates to exact-hash keep-best, implemented here generally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import TOKEN_PATTERN


def exact_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5 grouping, keep min id. → (h, keep_id, n_dups)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def keep_best(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """W4 keep-best: within each group keep the top-scored row
    (tie → lowest id). Window rank, not a self-join."""
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Word k-gram shingles: (id, shingle), set semantics per doc. Built
    entirely map-side as a zip_with chain — shingle_i = toks[i] ⧺ ' ' ⧺
    toks[i+1] ⧺ … built by zipping the token array against its own
    1..k-1 shifted slices (null-padded tails null-propagate through
    concat and are filtered) — then array_distinct and ONE explode.
    No token explode, no per-doc window sort, no global distinct
    exchange (ids are unique, so per-doc dedup IS the global dedup),
    and — unlike the r1 per-index ``transform(i -> slice(toks,i,k))``
    formulation — no O(tokens²) re-evaluation: Catalyst re-ran the
    regexp token extraction once per transform ELEMENT through the
    lambda scope (8.5 s → ~1 s for 260k shingles at sf0.1). Docs with
    < k tokens yield no shingles."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
    grams = F.col("_toks")
    for off in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(F.col("_toks"), off + 1, 2_000_000_000),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    sh = F.array_distinct(F.filter(grams, lambda x: x.isNotNull()))
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select("id", F.explode(sh).alias("shingle"))
    )


MINHASH_ROT_STEP = 4  # hex chars each successive hash function rotates by


def minhash_rotation_sql(expr: str, j: int) -> str:
    """Hash function j as ANSI SQL over a 32-hex-char md5 expression:
    the hex string rotated left by 4·j chars. One md5 per shingle
    serves the whole hash family — each rotation leads with a distinct
    16-bit slice of the digest, so the min-orderings are independent
    enough for LSH while staying bit-identical across Spark and DuckDB
    (both: lowercase hex md5, 1-based substr)."""
    off = MINHASH_ROT_STEP * j
    if off == 0:
        return expr
    return f"(substr({expr}, {off + 1}, {32 - off}) || substr({expr}, 1, {off}))"


def _rotation_col(h, j: int):
    off = MINHASH_ROT_STEP * j
    if off == 0:
        return h
    return F.concat(F.substring(h, off + 1, 32 - off), F.substring(h, 1, off))


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """MinHash band signatures → (id, band, sig).

    Kernel shape (the 100 TB path): md5 runs ONCE per (doc, shingle);
    the n_bands·r hash family is derived by hex rotation (JVM substr/
    concat — no re-hash, no ×n_bands explode of the shingle stream);
    all n_bands·r minima come out of ONE map-side-partial groupBy(id).
    Band signature = the concat of its r row-minima (r=2 ⇒ a bucket
    collision needs BOTH minima equal — real banded LSH, not the
    high-false-positive r=1 degenerate). Pass ``shingles_df`` to reuse
    a persisted shingle set across minhash/jaccard stages.
    """
    sh = shingles(df, text_col, id_col, k) if shingles_df is None else shingles_df
    n_funcs = n_bands * rows_per_band
    if n_funcs * MINHASH_ROT_STEP > 32:
        raise ValueError("hash family exceeds md5 rotation space")
    hs = sh.select("id", F.md5("shingle").alias("h"))
    mins = hs.groupBy("id").agg(
        *[F.min(_rotation_col(F.col("h"), j)).alias(f"m{j}") for j in range(n_funcs)]
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[f"m{b * rows_per_band + r}" for r in range(rows_per_band)]
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return mins.select("id", F.explode(band_arr).alias("bs")).select(
        "id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def _bucket_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    payload_cols: list[str],
    max_bucket: int,
) -> DataFrame:
    """All intra-bucket pairs, canonically oriented (id_a < id_b with
    payloads following their ids), buckets above ``max_bucket``
    dropped — ONE groupBy + a JVM nested-transform pair expansion.

    The old shape (count() window for the cap, self-join on the bucket
    key, then the id_a < id_b half-filter) paid a window sort plus two
    more exchanges of the same rows and materialized BOTH orientations
    of every pair before discarding half (guide §2.4); the pair count
    is identical (bounded by max_bucket² per bucket), and callers keep
    their cross-band ``distinct``."""
    fields = ", ".join(
        f"'{c}_a', CASE WHEN x.{id_col} < y.{id_col} THEN x.{c} ELSE y.{c} END, "
        f"'{c}_b', CASE WHEN x.{id_col} < y.{id_col} THEN y.{c} ELSE x.{c} END"
        for c in (id_col, *payload_cols)
    )
    pair_sql = (
        "flatten(transform(xs, (x, i) -> "
        "transform(slice(xs, i + 2, size(xs)), y -> "
        f"named_struct({fields}))))"
    )
    g = (
        df.groupBy(*key_cols)
        .agg(F.collect_list(F.struct(id_col, *payload_cols)).alias("xs"))
        .filter((F.size("xs") <= max_bucket) & (F.size("xs") >= 2))
    )
    return g.select(F.explode(F.expr(pair_sql)).alias("p")).select("p.*")


def minhash_candidate_pairs(bands_df: DataFrame, max_bucket: int = 50) -> DataFrame:
    """LSH bucket join: docs sharing any (band, sig) become a pair.
    Buckets above ``max_bucket`` are dropped (boilerplate guard —
    the explicit skew control)."""
    return (
        _bucket_pairs(bands_df, ["band", "sig"], "id", [], max_bucket)
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs only (never all-pairs).
    → (id_a, id_b, jaccard). Pass ``shingles_df`` to reuse a persisted
    shingle set instead of re-deriving it from text."""
    sh = shingles(df, text_col, id_col, k) if shingles_df is None else shingles_df
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.select(F.col("id").alias("id_a"), "shingle")
    b_sh = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        pairs.join(a_sh, "id_a").join(b_sh, ["id_b", "shingle"]).groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .select("id_a", "id_b", "jaccard")
    )


def embedding_lsh_pairs(
    emb: DataFrame,
    hyperplanes,
    threshold: float = 0.95,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 100,
) -> DataFrame:
    """Unlabeled embedding near-dup via random-hyperplane LSH — the
    blocking-key-free sibling of embedding_near_dup_pairs. Signature
    bit j = sign(v·h_j) (scale-invariant, like cosine itself); the
    n_bits signature splits into ``n_bands`` bands; bucket-joined
    candidates (skew-capped, never all-pairs) are verified with the
    exact cosine at 4 dp ≥ threshold. Two vectors within angle θ
    collide on a given bit with probability 1-θ/π — bands of b bits
    give the standard (1-θ/π)^b per-band collision curve. Hyperplanes
    are caller-supplied constants so the DuckDB oracle can embed the
    identical literals. → (id_a, id_b, cos)."""
    import numpy as np

    from .similarity import _as_double, _dot, _norm

    H = np.asarray(hyperplanes, dtype=np.float64)
    n_bits = len(H)
    if n_bits % n_bands:
        raise ValueError("n_bits must divide into n_bands")
    width = n_bits // n_bands
    v = _as_double(F.col(vec_col))
    bits = [
        F.when(_dot(v, F.array(*[F.lit(float(x)) for x in H[j]])) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for j in range(n_bits)
    ]
    sig = emb.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.concat(*bits).alias("sig"),
    )
    bands = sig.select(
        "id",
        "v",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.substring("sig", b * width + 1, width).alias("key"),
                )
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("id", "v", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cos = F.round(
        _dot(F.col("v_a"), F.col("v_b")) / (_norm(F.col("v_a")) * _norm(F.col("v_b"))), 4
    )
    return (
        _bucket_pairs(bands, ["band", "key"], "id", ["v"], max_bucket)
        .distinct()
        .withColumn("cos", cos)
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cos")
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 100,
) -> DataFrame:
    """SimHash near-dup pairs: band-bucketed candidates + exact
    Hamming verify. → (id_a, id_b, hamming).

    The 64-bit signature (16 hex chars, ops.textstats spec) splits
    into ``n_bands`` equal hex bands; by pigeonhole, two signatures
    within Hamming distance < n_bands agree on at least one band, so
    the bucket join has FULL recall for distance ≤ n_bands-1 (default
    3) and never goes all-pairs — the same scale topology as the
    MinHash LSH family, with the same explicit ``max_bucket`` skew
    cap. Verification computes the exact distance as 16 per-nibble
    ``bit_count(xor)`` terms — pure JVM expressions.
    """
    from .textstats import simhash64

    if 16 % n_bands != 0:
        # a non-divisor silently leaves trailing hex chars outside every
        # band and voids the pigeonhole full-recall guarantee
        raise ValueError(f"n_bands must divide 16 (got {n_bands})")
    chars = 16 // n_bands
    sig = simhash64(df.select(id_col, text_col), text_col=text_col).select(
        F.col(id_col).alias("id"), F.col("simhash").alias("sig")
    )
    bands = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.substring("sig", b * chars + 1, chars).alias("key"),
                )
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    def nib(col, i):
        return F.position(F.substring(col, i + 1, 1), F.lit("0123456789abcdef")) - 1

    ham = sum(
        (F.bit_count(nib(F.col("sig_a"), i).bitwiseXOR(nib(F.col("sig_b"), i))))
        for i in range(16)
    )
    return (
        _bucket_pairs(bands, ["band", "key"], "id", ["sig"], max_bucket)
        .distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# W4 generic URL-equivalence merge (search.cpp:555-625)
# ---------------------------------------------------------------------------

_MERGE_TOKEN = "\x01"


def _url_host(url):
    return F.lower(F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1))


def _url_path(url):
    return F.regexp_extract(url, r"^[a-z]+://[^/]+(/.*)?$", 1)


def _url_norm(url):
    """Rule-3 normal form: /~ , /users , /user all collapsed to one
    token (in that order — /users before its prefix /user, like the
    reference's replaceAll chain), one trailing slash dropped."""
    s = F.replace(url, F.lit("/~"), F.lit(_MERGE_TOKEN))
    s = F.replace(s, F.lit("/users"), F.lit(_MERGE_TOKEN))
    s = F.replace(s, F.lit("/user"), F.lit(_MERGE_TOKEN))
    return F.regexp_replace(s, r"/$", "")


def url_merge_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    hash_col: str = "content_hash",
    size_col: str = "size",
    max_group: int = 200,
) -> DataFrame:
    """W4 pair predicate (search.cpp:555-625): within a content-hash
    group (zero-size pages never merge), a pair is URL-equivalent when
    one of:

      same_host   — lowercased hosts equal
      same_path   — paths equal
      norm_eq     — /~ ≈ /users ≈ /user token-collapsed, trailing /
                    stripped, strings equal
      archive     — one URL ends with the other's host+path (the
                    Geminispace mirror pattern; direction decides
                    keep-original anti-takeover in the merge stage)

    → (id_a, id_b, rule) with rule = first match in the order above
    (host/path/norm are symmetric; archive reported regardless of
    direction). Hash-bucketed self-join — never all-pairs; groups
    above ``max_group`` are dropped (boilerplate-hash guard, the same
    explicit skew control as the LSH bucket cap)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.col(url_col).alias("url"),
        _url_host(F.col(url_col)).alias("host"),
        F.coalesce(_url_path(F.col(url_col)), F.lit("")).alias("path"),
        _url_norm(F.col(url_col)).alias("norm"),
    ).filter(F.col(size_col) > 0)
    sized = base.withColumn(
        "grp_n", F.count("*").over(Window.partitionBy("h"))
    ).filter(F.col("grp_n") <= max_group)
    a = sized.select("h", *[F.col(c).alias(c + "_a") for c in ("id", "url", "host", "path", "norm")])
    b = sized.select("h", *[F.col(c).alias(c + "_b") for c in ("id", "url", "host", "path", "norm")])
    hp_a = F.concat(F.col("host_a"), F.col("path_a"))
    hp_b = F.concat(F.col("host_b"), F.col("path_b"))
    rule = (
        F.when(F.col("host_a") == F.col("host_b"), F.lit("same_host"))
        .when(F.col("path_a") == F.col("path_b"), F.lit("same_path"))
        .when(F.col("norm_a") == F.col("norm_b"), F.lit("norm_eq"))
        .when(
            F.col("url_b").endswith(hp_a) | F.col("url_a").endswith(hp_b),
            F.lit("archive"),
        )
    )
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("rule", rule)
        .filter(F.col("rule").isNotNull())
        .select("id_a", "id_b", "rule")
    )


def merge_url_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    hash_col: str = "content_hash",
    size_col: str = "size",
    score_col: str = "score",
    max_group: int = 200,
) -> DataFrame:
    """The full W4 merge, faithful to the reference's sequential
    algorithm (search.cpp:565-625): results are visited in rank order
    (score desc, id asc — the reference's multimap insertion order);
    each is compared against the already-kept entries of its hash
    group; same_host/same_path/norm_eq or kept-is-archive-of-new →
    keep-best replacement; new-is-archive-of-kept → new is dropped
    without a score comparison (anti-takeover: the mirror can never
    displace the original). Zero-size docs are always KEPT themselves
    (inserted without any comparison, search.cpp:577-580) but they DO
    enter the hash map and can absorb/be-replaced-by later same-hash
    nodes like any stored entry — the reference emplaces them.

    Runs per content-hash group via applyInPandas — the sequential
    loop touches only one bounded group at a time, so the operator
    stays shuffle-partitioned by hash at any scale. Groups larger than
    ``max_group`` pass through UNMERGED (every row survives,
    n_merged=1): the inner loop is O(group²) worst case, so a
    boilerplate content-hash with 10^5 members would otherwise become
    one quadratic Python straggler task — the same explicit skew cap
    as ``url_merge_pairs``/the LSH bucket caps, and the same
    drop-dont-die bias (a giant equal-hash group is boilerplate, not
    content worth merging). → the surviving rows
    (id, url, score, n_merged)."""
    import pandas as pd

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_group:
            out = pdf.sort_values(["score", "id"], ascending=[False, True])
            return pd.DataFrame(
                {
                    "id": out["id"].to_numpy(),
                    "url": out["url"].to_numpy(),
                    "score": out["score"].to_numpy(),
                    "n_merged": 1,
                }
            )
        pdf = pdf.sort_values(["score", "id"], ascending=[False, True])
        kept: list[dict] = []
        for r in pdf.itertuples(index=False):
            if r.size == 0:
                kept.append({"id": r.id, "url": r.url, "score": r.score, "n": 1})
                continue
            node_norm = _norm_py(r.url)
            host, path = _host_py(r.url), _path_py(r.url)
            placed = False
            for slot in kept:
                s_host, s_path = _host_py(slot["url"]), _path_py(slot["url"])
                if (
                    host == s_host
                    or path == s_path
                    or slot["url"].endswith(host + path)
                    or node_norm == _norm_py(slot["url"])
                ):
                    if slot["score"] < r.score:
                        slot.update({"id": r.id, "url": r.url, "score": r.score})
                    slot["n"] += 1
                    placed = True
                    break
                if r.url.endswith(s_host + s_path):
                    slot["n"] += 1  # anti-takeover: drop the mirror
                    placed = True
                    break
            if not placed:
                kept.append({"id": r.id, "url": r.url, "score": r.score, "n": 1})
        return pd.DataFrame(
            {
                "id": [k["id"] for k in kept],
                "url": [k["url"] for k in kept],
                "score": [k["score"] for k in kept],
                "n_merged": [k["n"] for k in kept],
            }
        )

    def _host_py(u: str) -> str:
        import re

        m = re.match(r"^[a-z]+://([^/]+)", u)
        return m.group(1).lower() if m else ""

    def _path_py(u: str) -> str:
        import re

        m = re.match(r"^[a-z]+://[^/]+(/.*)?$", u)
        return (m.group(1) or "") if m else ""

    def _norm_py(u: str) -> str:
        s = u.replace("/~", _MERGE_TOKEN).replace("/users", _MERGE_TOKEN).replace(
            "/user", _MERGE_TOKEN
        )
        return s[:-1] if s.endswith("/") else s

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        F.col(hash_col).alias("h"),
        F.col(size_col).alias("size"),
        F.col(score_col).alias("score"),
    )
    return base.groupBy("h").applyInPandas(
        merge_group, schema="id long, url string, score double, n_merged long"
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: pairs within a blocking key only
    (block_col), cosine ≥ threshold. → (id_a, id_b, cos).

    Scale path: one grouped-map per block computes the block's Gram
    matrix vectorized across pairs — O(b²·d) FLOPs, ~100× the
    throughput of expanding the pair join row-wise. Blocks are bounded
    by construction (that's what the blocking key is for); a skewed
    block should be split upstream, not absorbed here. Determinism:
    the Gram matrix is accumulated as an explicit ascending-dimension
    loop of float64 multiply-then-add rank-1 updates — per element the
    op order is exactly the sequential oracle's ``acc += a[d]*b[d]``
    (BLAS ``x @ x.T`` would use blocked/FMA order, which can flip a
    4-dp rounding or a threshold comparison right at the boundary).
    Residual risk: a compiler that contracts the oracle's multiply-add
    into one FMA could still differ by 1 ulp pre-rounding.
    """
    import numpy as np
    import pyarrow as pa

    thr = float(threshold)

    def block_pairs(tbl: "pa.Table") -> "pa.Table":
        # Arrow-native group kernel: the list column's values buffer
        # reshapes straight into a (b, dim) float64 matrix — no
        # per-row pandas object conversion (the old applyInPandas body
        # paid ~0.5 s/block turning 2.3k list cells into ndarrays).
        ids = tbl.column("id").to_numpy()
        lv = tbl.column("v")
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        b = len(ids)
        flat = lv.flatten().to_numpy(zero_copy_only=False)
        dim = flat.size // b if b else 0
        x = np.ascontiguousarray(flat.reshape(b, dim).T)  # (dim, b) row-major
        # upper-triangle pairs only (half the FLOPs + traffic of the
        # old full Gram matrix); the accumulation stays an explicit
        # ascending-dimension loop of multiply-then-add — per pair the
        # op order is exactly the sequential oracle's acc += a[d]*b[d],
        # so cosines are bit-identical to the full-matrix version
        iu, ju = np.triu_indices(b, k=1)
        acc = np.zeros(iu.size, dtype=np.float64)
        sq = np.zeros(b, dtype=np.float64)
        for d in range(dim):
            col = x[d]
            acc += col[iu] * col[ju]
            sq += col * col
        nrm = np.sqrt(sq)
        cos = np.round(acc / (nrm[iu] * nrm[ju]), 4)
        keep = cos >= thr
        # canonical orientation: id_a < id_b regardless of row order
        ia = np.minimum(ids[iu[keep]], ids[ju[keep]])
        ib = np.maximum(ids[iu[keep]], ids[ju[keep]])
        return pa.table(
            {
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
                "cos": pa.array(cos[keep], pa.float64()),
            }
        )

    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # explicit repartition by block: the grouped kernel is CPU-dense
    # per byte, and AQE (which prices partitions by shuffle bytes)
    # otherwise coalesces the small shuffle onto 1-2 tasks and the
    # blocks compute serially; a user-specified shuffle is not
    # coalesced, and groupBy on the same key reuses it (guide §2.4)
    par = max(1, emb.sparkSession.sparkContext.defaultParallelism)
    return base.repartition(par, "blk").groupBy("blk").applyInArrow(
        block_pairs, schema="id_a long, id_b long, cos double"
    )
