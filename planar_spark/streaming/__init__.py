from planar_spark.streaming.ingest_stream import (  # noqa: F401
    PAGES_SCHEMA,
    crawl_rate,
    edges_stream,
    run_edge_ingestion,
    run_windowed_counts,
    stream_pages,
    windowed_counts_latest,
)
