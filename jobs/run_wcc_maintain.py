"""spark-submit entry point: streaming WCC maintenance.

    spark-submit --py-files planar_spark.zip jobs/run_wcc_maintain.py \
        --edges-dir /data/edges --state-dir /state/wcc \
        --checkpoint /ckpt/wcc_maintain [--labels-out /out/labels]

Each invocation merges all edge files not yet seen by the checkpoint
into the durable component-label state (Trigger.AvailableNow) via the
incremental label-graph contraction — per batch O(delta + touched
components), never a full-graph recompute. Chain it after
run_ingest_stream.py from the same scheduler: pages -> edges -> labels,
each stage exactly-once and independently resumable.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F

from planar_spark.streaming import run_wcc_maintenance, wcc_labels_latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges-dir", required=True)
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument(
        "--labels-out",
        help="optionally also write the newest labels as plain parquet",
    )
    args = ap.parse_args()
    spark = SparkSession.builder.appName("planar_spark_wcc_maintain").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run_wcc_maintenance(spark, args.edges_dir, args.state_dir, args.checkpoint)
    labels = wcc_labels_latest(spark, args.state_dir)
    if labels is None:
        print(json.dumps({"state_dir": args.state_dir, "vertices": 0}))
        return
    if args.labels_out:
        labels.write.mode("overwrite").parquet(args.labels_out)
    stats = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("label").alias("c"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "state_dir": args.state_dir,
                "vertices": int(stats["n"]),
                "components": int(stats["c"]),
            }
        )
    )


if __name__ == "__main__":
    main()
