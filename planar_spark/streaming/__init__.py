from planar_spark.streaming.ingest_stream import (  # noqa: F401
    PAGES_SCHEMA,
    crawl_rate,
    edges_stream,
    run_edge_ingestion,
    stream_pages,
)
