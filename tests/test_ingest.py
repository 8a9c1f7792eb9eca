"""Ingest layer: extraction invariants + dictionary encoding."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from planar_spark.ingest import build_graph_tables, dictionary_encode
from planar_spark.ingest.extract import (
    extract_edges,
    extract_links_py,
    extract_text_py,
    extract_text_udf,
)
from planar_spark.ingest.pages import (
    edges_powerlaw,
    edges_simple4,
    make_pages_df,
    make_pages_pdf,
    url_of,
    with_self_loops,
)


def test_extract_text_byte_identical_pure_python():
    pdf = make_pages_pdf(edges_simple4(), 4)
    for _, row in pdf.iterrows():
        assert extract_text_py(row["html"]) == row["text"]


def test_extract_links_match_edges():
    edges = edges_simple4()
    pdf = make_pages_pdf(edges, 4)
    got = set()
    urls = {url_of(v): v for v in range(4)}
    for _, row in pdf.iterrows():
        for dst_url in extract_links_py(row["html"]):
            got.add((urls[row["url"]], urls[dst_url]))
    assert got == {(int(s), int(d)) for s, d in edges}


def test_extract_text_udf_byte_identical(spark):
    """The per-row invariant from BASELINE.json input_hint: engine
    extraction must be byte-identical to the pages.text column."""
    edges = edges_powerlaw(200, m=3, seed=42)
    pages = make_pages_df(spark, edges, 200)
    mismatches = (
        pages.withColumn("extracted", extract_text_udf(F.col("html")))
        .where(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_dictionary_encode_dense_lexicographic(spark):
    urls = [url_of(v) for v in range(100)]
    df = spark.createDataFrame([(u,) for u in urls * 2], schema="url string")
    vertices = dictionary_encode(df, num_partitions=8)
    rows = {r["url"]: r["vid"] for r in vertices.collect()}
    expected = {u: i for i, u in enumerate(sorted(set(urls)))}
    assert rows == expected


def test_build_graph_tables_end_to_end(spark):
    edges = edges_simple4()
    pages = make_pages_df(spark, edges, 4)
    g = build_graph_tables(pages, num_partitions=8)
    assert g.num_vertices == 4
    assert g.num_edges == 8
    # urls sort lexicographically by zero-padded vid -> vid order preserved
    url2vid = {r["url"]: r["vid"] for r in g.vertices.collect()}
    got = {
        (url2vid[r1], url2vid[r2])
        for r1, r2 in [
            (url_of(int(s)), url_of(int(d))) for s, d in edges
        ]
    }
    got_edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got_edges == got
    degs = {r["vid"]: r["out_deg"] for r in g.degrees.collect()}
    assert degs == {0: 2, 1: 2, 2: 2, 3: 2}


def test_self_loops_dropped(spark):
    edges = with_self_loops(edges_simple4(), [0, 2])
    pages = make_pages_df(spark, edges, 4)
    g = build_graph_tables(pages, num_partitions=8)
    assert g.num_edges == 8  # parity with graph_converter.cpp:113
    assert g.edges.where(F.col("src") == F.col("dst")).count() == 0


def test_synth_edges_locality_deterministic_and_intra_host(spark):
    """r7 generator for the scaling bench's locality section: byte-
    deterministic at any parallelism, and the realized intra-host edge
    fraction tracks p_intra (Common-Crawl link graphs are ~75-90%
    intra-host, Meusel et al. 2015)."""
    from planar_spark.ingest.synthetic import synth_edges_locality

    n_edges, n_v, host = 20_000, 2_000, 100
    a = synth_edges_locality(
        spark, n_edges, n_v, host_size=host, p_intra=0.85,
        num_partitions=4,
    )
    b = synth_edges_locality(
        spark, n_edges, n_v, host_size=host, p_intra=0.85,
        num_partitions=16,
    )
    ra = sorted((r["src"], r["dst"]) for r in a.collect())
    rb = sorted((r["src"], r["dst"]) for r in b.collect())
    assert ra == rb  # parallelism-independent determinism

    intra = sum(1 for s, d in ra if s // host == d // host)
    frac = intra / len(ra)
    # self-loop and dst>=V filters nudge the realized fraction; the
    # bound just needs to catch a broken intra/cross branch
    assert 0.80 <= frac <= 0.90, frac
    assert all(0 <= s < n_v and 0 <= d < n_v for s, d in ra)
    assert all(s != d for s, d in ra)
