"""Training-pipeline operators: dedup family, similarity search, text
stats, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over a sleepy dog", "en"),  # near dup
        (3, "completely different text about spark shuffles", "en"),
        (4, "ein völlig anderer deutscher text über dinge", "de"),
        (5, "short", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs_df):
    from tlgs_spark.ops.dedup import exact_groups

    groups = {r.h: r for r in exact_groups(docs_df).collect()}
    dups = [r for r in groups.values() if r.n_dups > 1]
    assert len(dups) == 1
    assert dups[0].keep_id == 0 and dups[0].n_dups == 2


def test_keep_best(docs_df):
    from tlgs_spark.ops.dedup import keep_best

    scored = docs_df.withColumn("score", F.length("text").cast("double"))
    kept = keep_best(scored, "lang", "score")
    en = [r for r in kept.collect() if r.lang == "en"]
    assert len(en) == 1
    assert en[0].doc_id == 3  # longest en text wins; ties would break by min id


def test_shingles(docs_df):
    from tlgs_spark.ops.dedup import shingles

    sh = shingles(docs_df, k=3).collect()
    by_id = {}
    for r in sh:
        by_id.setdefault(r.id, set()).add(r.shingle)
    assert "the quick brown" in by_id[0]
    assert by_id[0] == by_id[1]
    assert 5 not in by_id  # <3 tokens → no shingles


def test_minhash_lsh_finds_near_dups(docs_df):
    from tlgs_spark.ops.dedup import (
        jaccard_pairs,
        minhash_bands,
        minhash_candidate_pairs,
    )

    pairs_df = minhash_candidate_pairs(minhash_bands(docs_df))
    pairs = {(r.id_a, r.id_b) for r in pairs_df.collect()}
    assert (0, 1) in pairs  # exact dups always collide on every band
    jac = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(docs_df, pairs_df).collect()}
    assert jac[(0, 1)] == 1.0
    if (0, 2) in jac:
        assert 0 < jac[(0, 2)] < 1.0
    assert (0, 3) not in jac or jac[(0, 3)] < 0.2


def test_simhash_near_dups_close(docs_df):
    from tlgs_spark.ops.textstats import simhash64, simhash_hex_col

    h = {r.doc_id: int(r.simhash, 16) for r in simhash64(docs_df).collect()}
    assert h[0] == h[1]  # identical text → identical simhash
    # batch kernel ≡ JVM expression twin (one frozen spec, two paths)
    twin = {
        r.doc_id: int(r.s, 16)
        for r in docs_df.select(
            "doc_id", simhash_hex_col(F.col("text")).alias("s")
        ).collect()
    }
    assert twin == h

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert ham(h[0], h[2]) < ham(h[0], h[3])  # near dup closer than unrelated


def test_lang_id(docs_df):
    from tlgs_spark.ops.textstats import lang_id_ngram

    pred = {r.doc_id: r.lang_pred for r in lang_id_ngram(docs_df).collect()}
    assert pred[4] == "de"
    assert all(isinstance(v, str) and v for v in pred.values())


# spec-v2 validation corpus: two labeled sentences per language plus
# the zh/und edge classes — the weighted-profile model must be exact
LANG_SENTENCES = [
    ("en", "the cat was sitting on the mat and it looked at the dog"),
    ("en", "this is the kind of thing that ought to work out of the box"),
    ("de", "der hund und die katze sind nicht zu hause geblieben"),
    ("de", "ich möchte ein schönes geschenk für die übung kaufen"),
    ("fr", "le chat est dans la maison et les enfants ne sont pas là"),
    ("fr", "c'est une belle journée à paris avec des croissants chauds"),
    ("es", "los niños y las niñas están en el parque con una pelota"),
    ("es", "¿qué hora es? la reunión es por la mañana con el señor garcía"),
    ("it", "il gatto è sul tavolo e non vuole scendere per mangiare"),
    ("it", "la situazione è difficile ma gli amici sono qui per aiutare"),
    ("pt", "o menino não quer uma solução para a lição de casa"),
    ("pt", "a informação chegou com atenção e um coração alegre"),
    ("zh", "这是一个中文句子用来测试语言识别功能"),
    ("und", "12345 67890"),
]


def test_lang_id_labeled_sentences(spark):
    from tlgs_spark.ops.textstats import lang_id_ngram

    df = spark.createDataFrame(
        [(i, t, want) for i, (want, t) in enumerate(LANG_SENTENCES)],
        "doc_id long, text string, lang string",
    )
    rows = lang_id_ngram(df).select("lang", "lang_pred").collect()
    assert all(r.lang_pred == r.lang for r in rows), [
        (r.lang, r.lang_pred) for r in rows if r.lang_pred != r.lang
    ]


def test_quality_score_monotonic(spark):
    from tlgs_spark.ops.textstats import quality_score

    rows = [
        (0, "the cat sat on the mat and looked at the dog near the door " * 5),
        (1, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        (2, "word " * 60),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    q = {r.id: r.q for r in df.select("id", quality_score(F.col("text")).alias("q")).collect()}
    assert q[0] > q[1]  # prose beats punctuation soup
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0


def test_embedding_cosine_topk(spark):
    from tlgs_spark.ops.similarity import cosine_topk

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    vecs[7] = vecs[0] * 2.0  # same direction as query → cos 1.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    top = cosine_topk(df, [float(x) for x in vecs[0]], k=3, exclude_id=0).collect()
    assert top[0].vec_id == 7 and top[0].cos == 1.0
    # exact parity with numpy
    v = vecs.astype(np.float64)
    q = v[0]
    cos = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    order = [i for i in np.lexsort((np.arange(50), -np.round(cos, 4))) if i != 0][:3]
    assert [r.vec_id for r in top] == order


def test_ivf_recall_reasonable(spark):
    from tlgs_spark.ops.similarity import cosine_topk, ivf_assign, ivf_search

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[5]]
    exact = [r.vec_id for r in cosine_topk(df, q, k=10, exclude_id=5).collect()]
    assigned, cents = ivf_assign(df, n_centroids=8, dim=16)
    approx = [
        r.vec_id
        for r in ivf_search(
            assigned.filter(F.col("vec_id") != 5), cents, q, k=10, n_probe=4
        ).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5  # half the buckets probed → decent recall


def test_ivf_fitted_centroids_cluster_data(spark):
    """k-means fit: on clustered data, fitted centroids put each
    cluster in its own bucket — probing ONE bucket yields perfect
    recall for an in-cluster query (an RNG centroid grid can't
    guarantee that)."""
    from tlgs_spark.ops.similarity import cosine_topk, ivf_assign, ivf_fit, ivf_search

    rng = np.random.default_rng(7)
    protos = rng.standard_normal((4, 16))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    rows = []
    for i in range(200):
        v = protos[i % 4] + 0.05 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_fit(df, n_centroids=4, iters=10)
    assigned, cents = ivf_assign(df, centroids=cents)
    # every member of a proto-cluster lands in the same bucket
    buckets = {r.vec_id: r.centroid_id for r in assigned.collect()}
    for c in range(4):
        ids = [i for i in range(200) if i % 4 == c]
        assert len({buckets[i] for i in ids}) == 1
    q = [float(x) for x in protos[2]]
    exact = [r.vec_id for r in cosine_topk(df, q, k=10).collect()]
    approx = [r.vec_id for r in ivf_search(assigned, cents, q, k=10, n_probe=1).collect()]
    assert set(approx) == set(exact)  # single-probe perfect recall


def test_embedding_near_dup_pairs(spark):
    from tlgs_spark.ops.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(2)
    base = rng.standard_normal(8).astype(np.float32)
    rows = [
        (0, [float(x) for x in base], 1),
        (1, [float(x) for x in base * 3], 1),      # same direction
        (2, [float(x) for x in -base], 1),         # opposite
        (3, [float(x) for x in rng.standard_normal(8)], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r.id_a, r.id_b): r.cos for r in embedding_near_dup_pairs(df, 0.95).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) not in pairs
    assert all(a != 3 and b != 3 for a, b in pairs)  # different label → never compared


def test_multimodal_plumbing(spark):
    from tlgs_spark.ops.multimodal import extract_features, frame_sample_plan, synth_media

    media = synth_media(spark, 20, kind="image")
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 20
    assert all(len(r.feature) == 8 for r in feats)
    # deterministic: same payload → same sha + feature
    again = {r.media_id: (r.sha256, tuple(r.feature)) for r in extract_features(media, dim=8).collect()}
    first = {r.media_id: (r.sha256, tuple(r.feature)) for r in feats}
    assert again == first

    video = synth_media(spark, 5, kind="video")
    plan = frame_sample_plan(video, every_ms=5000)
    rows = plan.collect()
    assert len(rows) > 0
    assert all(r.frame_ts_ms % 5000 == 0 for r in rows)


def test_image_decode_is_stubbed():
    from tlgs_spark.ops.multimodal import HAVE_PIL, decode_image

    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG fake")


def test_url_merge_pairs_rules(spark):
    from tlgs_spark.ops.dedup import url_merge_pairs

    rows = [
        # group 1: same content, same host (different path) → same_host
        (0, "gemini://a.example/x", 1, 100),
        (1, "gemini://A.example/y", 1, 100),
        # group 2: same path on different hosts → same_path
        (2, "gemini://a.example/p", 2, 100),
        (3, "gemini://b.example/p", 2, 100),
        # group 3: reference quirk — the /~ ≈ /users normal form embeds
        # the (differing) hosts, and literal replaceAll('/users')
        # keeps the following slash, so these do NOT merge (the str ==
        # str2 branch of search.cpp:606 is effectively subsumed by the
        # same-host rule); pinned here as a negative
        (4, "gemini://c.example/~bob/f", 3, 100),
        (5, "gemini://d.example/users/bob/f", 3, 100),
        # group 4: archive mirror → archive
        (6, "gemini://e.example/q", 4, 100),
        (7, "gemini://arch.example/e.example/q", 4, 100),
        # group 5: same hash, unrelated URLs → no pair
        (8, "gemini://f.example/r", 5, 100),
        (9, "gemini://g.example/s", 5, 100),
        # zero-size never merges
        (10, "gemini://a.example/x", 1, 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, content_hash long, size long")
    got = {(r.id_a, r.id_b): r.rule for r in url_merge_pairs(df).collect()}
    assert got == {
        (0, 1): "same_host",
        (2, 3): "same_path",
        (6, 7): "archive",
    }


def test_merge_url_duplicates_sequential(spark):
    """Faithful to search.cpp:565-625: keep-best within equivalence,
    anti-takeover keeps the ORIGINAL even when the mirror scores
    higher, zero-size rows always survive."""
    from tlgs_spark.ops.dedup import merge_url_duplicates

    rows = [
        # same host: higher score (id 1) must win the slot
        (0, "gemini://a.example/x", 1, 100, 1.0),
        (1, "gemini://a.example/y", 1, 100, 5.0),
        # anti-takeover: mirror (id 3) outranks the original (id 2) and
        # is visited FIRST (rank order) — original then merges keep-best
        # into the mirror slot via the archive-suffix rule
        (2, "gemini://e.example/q", 2, 100, 1.0),
        (3, "gemini://arch.example/e.example/q", 2, 100, 9.0),
        # unrelated URLs, same hash: both kept
        (4, "gemini://f.example/r", 3, 100, 1.0),
        (5, "gemini://g.example/s", 3, 100, 2.0),
        # zero-size: survives alongside its hash-mates
        (6, "gemini://a.example/z", 1, 0, 0.5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, content_hash long, size long, score double"
    )
    out = {r.id: r for r in merge_url_duplicates(df).collect()}
    assert set(out) == {1, 3, 4, 5, 6}
    assert out[1].n_merged == 2          # 0 merged into 1
    # reference semantics: the stored mirror's archive-of check lives in
    # the keep-best branch (stored.url ends_with node.host+path), so the
    # original REPLACES the mirror only if it scores higher; here the
    # mirror ranks first and keeps the slot
    assert out[3].n_merged == 2 and out[3].score == 9.0


def test_merge_url_duplicates_caps_oversized_groups(spark):
    """A boilerplate content-hash group above max_group passes through
    UNMERGED in bounded time (no O(group²) straggler); bounded groups
    still merge."""
    import time

    from tlgs_spark.ops.dedup import merge_url_duplicates

    n = 10_000
    rows = [(i, f"gemini://h{i}.example/p{i}", 7, 100, float(i % 97)) for i in range(n)]
    rows += [  # a small mergeable group rides along
        (n + 1, "gemini://a.example/x", 8, 100, 1.0),
        (n + 2, "gemini://a.example/y", 8, 100, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, content_hash long, size long, score double"
    )
    t0 = time.monotonic()
    out = merge_url_duplicates(df).toPandas()
    elapsed = time.monotonic() - t0
    big = out[out.id < n + 1]
    assert len(big) == n and (big.n_merged == 1).all()  # passed through
    small = out[out.id >= n + 1].set_index("id")
    assert list(small.index) == [n + 2] and small.loc[n + 2].n_merged == 2
    # the distinct-URL pairwise loop on 10k rows would take minutes;
    # the capped path is seconds even on a loaded box
    assert elapsed < 60, f"oversized group took {elapsed:.1f}s — cap not applied?"


def test_polite_schedule_caps_and_breaks(spark):
    from tlgs_spark.ops.politeness import polite_schedule

    frontier = spark.createDataFrame(
        [(i, f"h{i % 3}", float(i)) for i in range(12)],
        "item_id long, host string, priority double",
    )
    failures = spark.createDataFrame(
        [("h2", 2), ("h2", 2), ("h0", 1)], "host string, n_failures long"
    )
    out = polite_schedule(frontier, failures, priority_col="priority", per_host_cap=2)
    rows = out.collect()
    # h2 tripped (4 failures > 3) → gone entirely; h0 (1 failure) stays
    assert not any(r.host == "h2" for r in rows)
    assert any(r.host == "h0" for r in rows)
    # ≤ 2 items per host per round; higher priority runs earlier
    from collections import Counter

    c = Counter((r.host, r.round) for r in rows)
    assert max(c.values()) <= 2
    h0 = sorted((r for r in rows if r.host == "h0"), key=lambda r: (r.round, -r.priority))
    assert h0[0].priority == max(r.priority for r in h0)


def test_simhash_hamming_pairs(spark):
    from tlgs_spark.ops.dedup import simhash_hamming_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    rows = [
        (0, base),
        (1, base),
        (2, base + "today"),  # one token appended to a long doc
        (3, "completely unrelated text about catalyst plans and shuffles here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.hamming for r in simhash_hamming_pairs(df).collect()}
    assert got[(0, 1)] == 0                   # identical → distance 0
    assert (0, 2) in got and got[(0, 2)] <= 3  # near dup within threshold
    assert all(3 not in p for p in got)        # unrelated never pairs


def test_embedding_lsh_pairs_unlabeled(spark):
    """Hyperplane-LSH near-dup without a blocking key: scaled copies
    share every sign bit (recall 1.0 by construction); orthogonal-ish
    random vectors below the cosine threshold never pair."""
    from tlgs_spark.ops.dedup import embedding_lsh_pairs

    rng = np.random.default_rng(3)
    planes = rng.standard_normal((16, 8))
    base = rng.standard_normal(8)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 2.5]),          # same direction
        (2, [float(x) for x in rng.standard_normal(8)]),
        (3, [float(x) for x in rng.standard_normal(8)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.id_a, r.id_b): r.cos for r in embedding_lsh_pairs(df, planes, 0.95).collect()}
    assert got.get((0, 1)) == 1.0
    assert all(p == (0, 1) for p in got)


def test_cosine_topk_excludes_zero_vectors(spark):
    """0/0 cosine is NaN, and Spark sorts NaN above every real double —
    a zero-norm embedding (failed/padded embed) must not rank first."""
    from tlgs_spark.ops.similarity import cosine_topk

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = cosine_topk(df, [1.0, 0.0], k=4, exclude_id=0).collect()
    ids = [r.vec_id for r in top]
    assert 2 not in ids and ids[0] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zero-norm query"):
        cosine_topk(df, [0.0, 0.0], k=2)


def test_simhash_pairs_band_guard(docs_df):
    from tlgs_spark.ops.dedup import simhash_hamming_pairs
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide 16"):
        simhash_hamming_pairs(docs_df, n_bands=3)
