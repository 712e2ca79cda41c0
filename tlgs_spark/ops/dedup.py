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
    entirely map-side: in-array slices + array_distinct, then one
    explode — no token explode, no per-doc window sort, no global
    distinct exchange (ids are unique, so per-doc dedup IS the global
    dedup). Docs with < k tokens yield no shingles."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0))
    n = F.size(toks)
    # NB: sequence(1, 0) counts DOWN in Spark — guard short docs
    idxs = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.array_distinct(
        F.transform(idxs, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )
    return df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """MinHash signatures, one hash per band (portable to the SQL
    oracle: hash = md5(shingle || '#' || band)). → (id, band, sig)."""
    sh = shingles(df, text_col, id_col, k)
    bands = sh.select(
        "id", "shingle", F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    )
    return (
        bands.withColumn("h", F.md5(F.concat_ws("#", "shingle", "band")))
        .groupBy("id", "band")
        .agg(F.min("h").alias("sig"))
    )


def minhash_candidate_pairs(bands_df: DataFrame, max_bucket: int = 50) -> DataFrame:
    """LSH bucket join: docs sharing any (band, sig) become a pair.
    Buckets above ``max_bucket`` are dropped (boilerplate guard —
    the explicit skew control)."""
    sized = bands_df.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "sig"))
    ).filter(F.col("bucket_n") <= max_bucket)
    a = sized.select("band", "sig", F.col("id").alias("id_a"))
    b = sized.select("band", "sig", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs only (never all-pairs).
    → (id_a, id_b, jaccard)."""
    sh = shingles(df, text_col, id_col, k)
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
    matrix with a float64 BLAS matmul — O(b²·d) FLOPs but vectorized,
    ~100× the throughput of expanding the pair join row-wise. Blocks
    are bounded by construction (that's what the blocking key is for);
    a skewed block should be split upstream, not absorbed here. The
    dot product is accumulated exactly like the sequential oracle
    (float64, ascending dimension order within the kernel); 4-dp
    rounding absorbs any summation-order residue.
    """
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        nrm = np.sqrt((x * x).sum(axis=1))
        g = (x @ x.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(len(ids), k=1)
        # canonical orientation: id_a < id_b regardless of row order
        ia, ib = np.minimum(ids[iu], ids[ju]), np.maximum(ids[iu], ids[ju])
        cos = np.round(g[iu, ju], 4)
        keep = cos >= thr
        return pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep], "cos": cos[keep]})

    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    return base.groupBy("blk").applyInPandas(
        block_pairs, schema="id_a long, id_b long, cos double"
    )
