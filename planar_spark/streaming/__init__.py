from planar_spark.streaming.ingest_stream import (  # noqa: F401
    PAGES_SCHEMA,
    crawl_rate,
    edges_stream,
    run_edge_ingestion,
    run_windowed_counts,
    stream_pages,
    windowed_counts_latest,
)
from planar_spark.streaming.wcc_maintain import (  # noqa: F401
    apply_edge_delta,
    run_wcc_maintenance,
    wcc_labels_latest,
)
