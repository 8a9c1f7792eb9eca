"""Structured Streaming ingestion: exactly-once incremental edge builds."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from planar_spark.ingest.extract import extract_edges
from planar_spark.ingest.pages import edges_ring, make_pages_pdf
from planar_spark.streaming import crawl_rate, run_edge_ingestion, stream_pages


def _write_batch(pages_dir, edges, num_vertices, name):
    pdf = make_pages_pdf(np.array(edges), num_vertices)
    os.makedirs(pages_dir, exist_ok=True)
    pdf.to_parquet(
        os.path.join(pages_dir, name),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def test_streaming_edge_ingestion_incremental_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: first half of a ring
    ring = edges_ring(20)
    _write_batch(pages_dir, ring[:10], 20, "batch1.parquet")
    run_edge_ingestion(spark, pages_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 10
    # batch 2 arrives: second half; re-run processes ONLY the new file
    _write_batch(pages_dir, ring[10:], 20, "batch2.parquet")
    run_edge_ingestion(spark, pages_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 20  # no duplicates: exactly-once append
    # content equals the batch extraction over all pages
    want = {
        (r["src_url"], r["dst_url"])
        for r in extract_edges(
            spark.read.parquet(pages_dir)
        ).collect()
    }
    got = {(r["src_url"], r["dst_url"]) for r in got2.collect()}
    assert got == want
    # idempotent re-run with no new files
    run_edge_ingestion(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 20


def test_crawl_rate_windowed_aggregation(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    _write_batch(pages_dir, edges_ring(40), 40, "b.parquet")
    q = (
        crawl_rate(stream_pages(spark, pages_dir), window="10 minutes")
        .writeStream.format("memory")
        .queryName("crawl_rate_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT * FROM crawl_rate_t ORDER BY start"
    ).collect()
    # 40 pages at 17s spacing span ~680s => 2 windows of 10 minutes
    assert sum(r["n_pages"] for r in rows) == 40
    assert len(rows) == 2
    assert all(r["n_urls"] > 0 for r in rows)
