from __future__ import annotations

import hashlib

from planar_spark.ingest.urls import normalize_urls
from planar_spark.kernels.textops import sample_documents, top_ngrams


def _bucket(doc_id: int, salt: str = "s0") -> int:
    return int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16) % 100


def test_sample_documents_matches_python_buckets(spark):
    rows = [(i, f"text {i}", ["en", "de", "xx"][i % 3]) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rates = {"en": 50, "de": 25}
    got = {r["doc_id"] for r in sample_documents(docs, rates, default_pct=5).collect()}
    want = {
        i
        for i, _, lang in rows
        if _bucket(i) < rates.get(lang, 5)
    }
    assert got == want
    # monotone: raising a rate only adds docs
    got2 = {
        r["doc_id"]
        for r in sample_documents(docs, {"en": 80, "de": 25}, default_pct=5).collect()
    }
    assert got <= got2


def test_top_ngrams_hand_values(spark):
    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b c d"), (2, "x")],
        "doc_id long, text string",
    )
    got = [(r["gram"], r["cnt"]) for r in top_ngrams(docs, n=3, k=3).collect()]
    # trigrams: doc0: "a b c","b c a","c a b","a b c"; doc1: "a b c","b c d"
    assert got[0] == ("a b c", 3)
    assert set(got[1:]) == {("b c a", 1), ("b c d", 1)}  # tie-broken asc


def test_normalize_urls(spark):
    cases = [
        ("HTTPS://WWW.Site.EXAMPLE/Path/Doc/?q=1#frag", "https://site.example/Path/Doc"),
        ("http://site.example/", "http://site.example"),
        ("http://site.example/a//", "http://site.example/a"),
        ("not a url", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["url_norm"] for r in normalize_urls(df).collect()]
    # collect preserves no order guarantee across partitions; map by input
    by_url = dict(zip([u for u, _ in cases], got))
    df2 = normalize_urls(df).collect()
    got_map = {r["url"]: r["url_norm"] for r in df2}
    for u, want in cases:
        assert got_map[u] == want, (u, got_map[u])
