"""textops (minhash/LSH/jaccard/topk) units + multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from planar_spark.ingest.multimodal import (
    extract_media_features,
    synth_media_df,
    _fake_decode,
)
from planar_spark.kernels.textops import (
    embedding_topk,
    lsh_candidate_pairs,
    ngram_jaccard,
    shingles_df,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
        (2, "completely different text with no overlap at all", "en"),
        (3, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (4, "tiny", "en"),  # < n tokens
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string, lang string")


def test_shingles(spark, docs):
    sh = {
        (r["doc_id"], r["shingle"])
        for r in shingles_df(docs, n=3).collect()
        if r["doc_id"] in (0, 4)
    }
    assert ("0", "the quick brown") not in sh  # doc_id stays long
    assert (0, "the quick brown") in sh
    assert (0, "over the lazy") in sh
    assert (4, "tiny") in sh  # short doc -> whole text shingle


def test_lsh_finds_exact_and_near_dups(spark, docs):
    pairs = {
        (r["a"], r["b"]) for r in lsh_candidate_pairs(docs, n=3).collect()
    }
    assert (0, 3) in pairs  # exact dup always shares every band
    assert all(2 not in p for p in pairs)  # no-overlap doc never pairs


def test_ngram_jaccard_values(spark, docs):
    pairs = spark.createDataFrame(
        [(0, 1), (0, 3)], schema="a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard(docs, pairs, n=3).collect()
    }
    assert got[(0, 3)] == 1.0
    # doc0/doc1: 9 tokens -> 7 shingles each, 6 shared -> 6/8
    assert got[(0, 1)] == pytest.approx(6 / 8, abs=1e-9)


def test_embedding_topk_brute_force(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        schema="vec_id long, embedding array<float>",
    )
    out = embedding_topk(emb, query_mod=10, k=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["q"], []).append(r["neighbor"])
    # numpy ground truth
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    for q in (0, 10, 20, 30):
        sims = (v @ v[q]) / (norms * norms[q])
        sims[q] = -np.inf
        order = sorted(
            range(40), key=lambda i: (-round(sims[i], 4), i)
        )[:3]
        assert got[q] == order


def test_multimodal_plumbing(spark):
    media = synth_media_df(spark, 32)
    feats = extract_media_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 16 for r in rows)
    # deterministic: same payload -> same feature
    one = [r for r in rows if r["url"].endswith("/0.png")][0]
    payload = media.where(F.col("url") == one["url"]).collect()[0]["payload"]
    assert np.allclose(one["feature"], _fake_decode(bytes(payload)), atol=1e-6)


_HAS_PIL = __import__("importlib").util.find_spec("PIL") is not None


@pytest.mark.skipif(_HAS_PIL, reason="PIL installed: real decode active")
def test_multimodal_real_decode_is_stubbed_without_pil(spark):
    media = synth_media_df(spark, 4)
    with pytest.raises(Exception):  # NotImplementedError inside executor
        extract_media_features(media, fake=False).collect()


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not in this container")
def test_multimodal_real_decode_with_pil(spark):
    """Installing PIL flips fake=False to a real decode with zero code
    change: PNG payloads decode to 16 grayscale features in [0, 1]."""
    import io

    from PIL import Image

    def png_bytes(i):
        img = Image.new("L", (8, 8), color=16 * i)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return bytearray(buf.getvalue())

    rows = [
        (f"u{i}", "image/png", png_bytes(i), 8, 8, 0) for i in range(4)
    ]
    media = spark.createDataFrame(
        rows,
        schema="url string, media_type string, payload binary, "
        "width int, height int, n_bytes long",
    )
    feats = {
        r["url"]: r["feature"]
        for r in extract_media_features(media, fake=False).collect()
    }
    assert all(len(v) == 16 for v in feats.values())
    assert feats["u2"][0] == pytest.approx(32 / 255.0, abs=1e-6)


def test_winnow_fingerprints_match_python_reference(spark):
    """Spark winnowing vs a direct pure-Python implementation of the
    MOSS scheme (k-gram md5-int60 hashes, per-window minima, distinct),
    including the short-doc (< k tokens) and narrow-doc (< k+window-1
    tokens) degenerate cases."""
    import hashlib

    from planar_spark.kernels.textops import winnow_fingerprints

    k, w = 5, 4
    texts = {
        0: "a b c d e f g h i j k l m n o p",   # plenty of windows
        1: "one two three four five six",       # 2 grams < window -> 1 window
        2: "tiny doc",                          # < k tokens -> whole-string gram
        3: "a b c d e f g h i j k l m n o p",   # exact dup of 0
        4: "",                                  # empty
    }
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in texts.items()],
        schema="doc_id long, text string, lang string",
    )

    def int60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_winnow(text: str) -> set[int]:
        toks = text.split()
        if len(toks) >= k:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        else:
            grams = [" ".join(toks)]
        hs = [int60(g) for g in grams]
        n = len(hs)
        if n <= w:
            return {min(hs)}
        return {min(hs[p : p + w]) for p in range(n - w + 1)}

    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(docs, k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in texts.items():
        assert got[i] == py_winnow(t), i
    assert got[0] == got[3]  # identical docs -> identical fingerprints


def test_near_dup_chain_merges_to_fixpoint(spark):
    """A pairwise near-dup CHAIN with pair-graph diameter 15: adjacent
    docs share 16/20 shingles (J=0.8 >= 0.7), two-apart only 14/22
    (0.636 < 0.7) — so the pair graph is exactly the path 0-1-...-15 and
    a fixed 6-round label exchange would under-merge; the fixpoint loop
    must collapse everything to canonical 0."""
    from planar_spark.kernels.textops import near_dup_clusters

    n_docs = 16
    words = [f"w{i:02d}" for i in range(2 * n_docs + 20)]
    rows = [
        (i, " ".join(words[2 * i : 2 * i + 20]), "en") for i in range(n_docs)
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in near_dup_clusters(
            docs, threshold=0.7, num_hashes=16, bands=8
        ).collect()
    }
    assert got == {i: 0 for i in range(n_docs)}, got


def test_embedding_ann_topk_recall_and_no_crossjoin(spark):
    """Bucketed ANN: high recall on clustered vectors, and the plan must
    contain no cartesian/cross join — candidates come from the
    band-bucket equi-join only."""
    from planar_spark.kernels.textops import embedding_ann_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)) * 4.0
    vecs = np.vstack(
        [centers[i % 8] + rng.standard_normal(16) * 0.3 for i in range(160)]
    ).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(160)],
        schema="vec_id long, embedding array<float>",
    )
    exact = embedding_topk(emb, query_mod=40, k=3).collect()
    ann_df = embedding_ann_topk(
        emb, query_mod=40, k=3, dim=16, n_planes=24, bands=8
    )
    ann = ann_df.collect()
    ex, an = {}, {}
    for r in exact:
        ex.setdefault(r["q"], set()).add(r["neighbor"])
    for r in ann:
        an.setdefault(r["q"], set()).add(r["neighbor"])
    hits = sum(len(ex[q] & an.get(q, set())) for q in ex)
    total = sum(len(v) for v in ex.values())
    assert hits / total >= 0.8, f"recall {hits}/{total}"
    opt = ann_df._jdf.queryExecution().optimizedPlan().toString()
    assert "Cross" not in opt and "Cartesian" not in opt, opt


def test_quality_langid_and_near_dup_clusters(spark, docs):
    from planar_spark.kernels.textops import (
        detect_language,
        near_dup_clusters,
        quality_score,
    )

    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[0]["n_tokens"] == 9
    assert q[0]["stop_ratio"] > 0  # 'the' twice + 'over'
    assert 0.0 <= q[4]["score"] <= 1.0

    langs = {r["doc_id"]: r["pred_lang"] for r in detect_language(docs).collect()}
    assert langs[0] == "en"
    assert langs[4] == "und"  # 'tiny' hits no stopword list

    clusters = {
        r["doc_id"]: r["canonical_id"]
        for r in near_dup_clusters(docs, threshold=0.5).collect()
    }
    assert clusters[3] == 0          # exact dup joins doc 0's cluster
    assert clusters[1] == 0          # near dup (jaccard 0.75) too
    assert clusters[2] == 2          # unique doc is its own canonical


def test_lsh_giant_bucket_guard(spark):
    """All-duplicates adversarial corpus: every band bucket holds every
    doc. Unguarded, the bucket self-join is all-pairs O(m²); with the
    cap, buckets split into ceil(m/cap) sub-buckets and candidate rows
    equal exactly the sum of within-sub-bucket pairs."""
    m, cap = 200, 20
    docs = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page text repeated on every page").alias(
            "text"
        ),
    )
    all_pairs = m * (m - 1) // 2
    # default (cap never reached at gate/test scale): full all-pairs set
    assert lsh_candidate_pairs(docs).count() == all_pairs
    # guarded: identical docs share identical sub assignment in every
    # band (sub hashes only doc_id), so the candidate set is exactly the
    # within-sub-bucket pairs of ONE split — deterministically countable
    s = -(-m // cap)
    sizes = [
        r["n"]
        for r in spark.range(m)
        .select(F.pmod(F.xxhash64(F.col("id")), F.lit(s)).alias("sub"))
        .groupBy("sub")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    expected = sum(c * (c - 1) // 2 for c in sizes)
    got = lsh_candidate_pairs(docs, max_bucket=cap).count()
    assert got == expected
    assert got < all_pairs // 4  # quadratic blowup actually defused


def test_ann_giant_bucket_guard(spark):
    """Identical embeddings collapse every sign bit into one bucket per
    band; the guard must keep the join bounded and still return top-k."""
    m, dim = 300, 8
    emb = spark.range(m).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i + 1)) for i in range(dim)]).alias(
            "embedding"
        ),
    )
    from planar_spark.kernels.textops import embedding_ann_topk

    out = embedding_ann_topk(
        emb, query_mod=100, k=5, dim=dim, n_planes=8, bands=4, max_bucket=30
    ).collect()
    # 3 queries (vec_id 0/100/200), each with at most k neighbors, all
    # cosine 1.0 against identical vectors
    assert 0 < len(out) <= 3 * 5
    assert all(abs(r["sim"] - 1.0) < 1e-9 for r in out)


def test_near_dup_clusters_fail_loud_on_exhaustion(spark):
    """A pair-graph chain of diameter > max_rounds must raise, never
    silently under-merge (same convention as scc/mst fixpoints)."""
    from planar_spark.kernels.textops import near_dup_clusters

    # chain of exact duplicates: doc i pairs with i+1 (identical text)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)],
        schema="doc_id long, text string",
    )
    with pytest.raises(RuntimeError, match="not converged"):
        near_dup_clusters(docs, max_rounds=1)
    ok = near_dup_clusters(docs)
    assert all(r["canonical_id"] == 0 for r in ok.collect())
    # boruvka mode: O(log V)-guaranteed rounds, same exact canonicals
    # even under the budget that exhausts hash-min's confirm round
    bk = near_dup_clusters(docs, max_rounds=8, algorithm="boruvka")
    assert all(r["canonical_id"] == 0 for r in bk.collect())


def test_expand_documents_planted_structure(spark):
    """Corpus expansion (ingest/corpus.py): deterministic, with the
    planted near-dup pairs actually near (Jaccard in (0.5, 1)) and the
    boilerplate docs byte-identical across base docs."""
    from planar_spark.ingest.corpus import expand_documents
    from planar_spark.kernels.textops import ngram_jaccard

    base = spark.createDataFrame(
        [(i, "x", "en", "t", 1) for i in range(20)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    out = expand_documents(base, factor=250, words_per_doc=40).persist()
    assert out.count() == 20 * 250
    # planted pair: replica s=1 mutates replica s=0's word stream
    pairs = spark.createDataFrame(
        [(i * 250, i * 250 + 1) for i in range(20)], schema="a long, b long"
    )
    sims = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard(out, pairs).collect()
    }
    assert len(sims) == 20
    for j in sims.values():
        assert 0.3 < j < 1.0, sims  # near-dup, not exact-dup
    # boilerplate docs (hash(id) % 1000 == 7) share ONE text
    from pyspark.sql import functions as F

    boiler = (
        out.where(F.pmod(F.xxhash64("doc_id"), F.lit(1000)) == 7)
        .select("text")
        .collect()
    )
    assert len(boiler) >= 2
    assert len({r["text"] for r in boiler}) == 1
    # deterministic: a second expansion is byte-identical
    again = expand_documents(base, factor=250, words_per_doc=40)
    assert out.exceptAll(again).count() == 0
    out.unpersist()


def test_expand_embeddings_jitter_bounded(spark):
    from planar_spark.ingest.corpus import expand_embeddings

    base = spark.createDataFrame(
        [(i, [float(i), 1.0, -2.0], i % 3) for i in range(10)],
        schema="vec_id long, embedding array<float>, label int",
    )
    out = expand_embeddings(base, factor=8).persist()
    assert out.count() == 80
    rows = out.collect()
    for r in rows:
        b = r["vec_id"] // 8
        exp = [float(b), 1.0, -2.0]
        for x, e in zip(r["embedding"], exp):
            assert abs(x - e) <= 0.101, (r["vec_id"], x, e)
    out.unpersist()
