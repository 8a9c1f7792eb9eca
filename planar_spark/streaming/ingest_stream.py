"""Structured Streaming ingestion: continuously-arriving pages -> edges.

The reference is a batch engine (every app loads a finished graph), but
a production Common-Crawl-style pipeline receives pages CONTINUOUSLY.
This module is the streaming front half of the engine:

    pages parquet dir (new files = new crawl batches)
      -> readStream
      -> link extraction (the SAME Arrow-vectorized UDF as batch ingest,
         planar_spark/ingest/extract.py — one code path for both)
      -> exactly-once append to the edge table
         (file-sink commit log + checkpointLocation)

plus a watermarked windowed crawl-rate aggregation (late pages beyond
the watermark are dropped, per Structured Streaming semantics).

The graph kernels themselves stay batch (the reference's model): a
superstep engine re-runs over the growing edge table; the streaming
piece keeps that table current with exactly-once semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from planar_spark.ingest.extract import extract_edges

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming DataFrame over a pages directory (new parquet files are
    discovered per micro-batch)."""
    return spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)


def edges_stream(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) stream — identical extraction to batch ingest;
    pandas UDF + explode are both streaming-safe stateless operators."""
    return extract_edges(pages)


def run_edge_ingestion(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Process all currently-available page files into the edge table,
    exactly once, then stop (Trigger.AvailableNow). Re-running after new
    files arrive appends ONLY the new files' edges: progress lives in
    the checkpoint, output atomicity in the file-sink commit log."""
    q = (
        edges_stream(stream_pages(spark, input_dir))
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "4 hours",
) -> None:
    """Late-data-corrected windowed page counts, durable across runs.

    Update-mode watermarked window aggregation whose per-batch UPDATED
    rows are appended to a parquet log via ``foreachBatch`` — the
    standard Structured Streaming upsert-sink pattern (a memory sink
    cannot recover from a checkpoint; foreachBatch can). Re-running
    with Trigger.AvailableNow after new files arrive processes ONLY
    the new files; rows that land in already-emitted event-time
    windows (late data, within ``watermark`` of the max observed
    event time) re-emit those windows with CORRECTED counts.

    Read the latest value per window with ``windowed_counts_latest``:
    counts under append-only input are monotone per window, so
    max(n_pages) is the newest emission — which also makes the
    foreachBatch append idempotent under at-least-once replays.
    """
    pages = stream_pages(spark, input_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"), "n_pages"
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts_latest(spark: SparkSession, output_dir: str) -> DataFrame:
    """(window_start, n_pages): the late-corrected count per window —
    the max over the upsert log (counts are monotone per window)."""
    return (
        spark.read.parquet(output_dir)
        .groupBy("window_start")
        .agg(F.max("n_pages").alias("n_pages"))
    )


def crawl_rate(
    pages: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Windowed crawl throughput with late-data handling: pages later
    than ``watermark`` behind the max observed warc_ts are dropped."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("url").alias("n_urls"),
        )
        .select("w.start", "w.end", "n_pages", "n_urls")
    )
