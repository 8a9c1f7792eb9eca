"""spark-submit entry point: incremental streaming edge ingestion.

    spark-submit --py-files planar_spark.zip jobs/run_ingest_stream.py \
        --pages-dir /data/pages --output /data/edges \
        --checkpoint /ckpt/ingest

Each invocation processes all page files not yet seen by the checkpoint
(Trigger.AvailableNow) and appends their extracted (src_url, dst_url)
edges exactly once; run it from a scheduler as crawl batches land, or
drop the trigger for a continuously-running stream.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from planar_spark.streaming import run_edge_ingestion


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    args = ap.parse_args()
    spark = SparkSession.builder.appName("planar_spark_ingest_stream").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run_edge_ingestion(spark, args.pages_dir, args.output, args.checkpoint)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"output": args.output, "total_edges": int(n)}))


if __name__ == "__main__":
    main()
