"""Partitioning strategies — the reference's partitioner family in Spark.

Reference: tools/graph_partitioner/partitioner/* and planar/
partitioner.cpp. Spark's hash shuffle covers the hash family natively;
the interesting one is the reference's equal-edge block split
(planar/partitioner.cpp:62-101, nvme/partition/
edge_equal_block_partition.h:29-120): contiguous vertex-id ranges whose
EDGE counts are balanced — the explicit skew handling for power-law
degree distributions, re-expressed here with a degree prefix-sum.

| here                        | reference                         |
|-----------------------------|-----------------------------------|
| hash_vertex_cut             | hash_based_vertexcut.cpp:43-167   |
| hash_edge_cut               | hash_based_edgecut.cpp            |
| two_d_cut                   | two_dimensional_vertexcut.cpp     |
| balanced_range_partition    | planar/partitioner.cpp:62-101     |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_vertex_cut(edges: DataFrame, num_partitions: int) -> DataFrame:
    """Bucket edges by hash(src) — the reference's fnv64(src) % n."""
    return edges.repartition(num_partitions, "src")


def hash_edge_cut(edges: DataFrame, num_partitions: int) -> DataFrame:
    """Bucket edges by hash(dst) (incoming-edge locality)."""
    return edges.repartition(num_partitions, "dst")


def two_d_cut(edges: DataFrame, num_partitions: int) -> DataFrame:
    """Grid bucket by (src, dst)."""
    return edges.repartition(num_partitions, "src", "dst")


def balanced_range_partition(
    edges: DataFrame, degrees: DataFrame, num_partitions: int
) -> DataFrame:
    """Contiguous vid ranges with ~equal EDGE counts (T6).

    1. distributed degree prefix-sum over vid order (two-pass, never a
       single-partition window — see balanced_range_bounds);
    2. boundary vids at multiples of |E|/num_partitions;
    3. edges bucketed by src range via a broadcast range join.

    Returns edges with a ``part`` column, repartitioned by it.
    """
    bounds = balanced_range_bounds(edges, degrees, num_partitions)
    if bounds is None:
        return edges.withColumn("part", F.lit(0))
    b = F.broadcast(bounds.select("part", "lo", "hi"))
    out = edges.join(
        b, (edges["src"] >= b["lo"]) & (edges["src"] <= b["hi"]), "left"
    ).select(
        "src", "dst", F.coalesce("part", F.lit(0)).alias("part")
    )
    # rangeByRange, not hash: hash(part) % n collides distinct bucket ids
    # into the same physical partition and leaves others empty
    return out.repartitionByRange(num_partitions, "part")


def balanced_range_bounds(
    edges: DataFrame, degrees: DataFrame, num_partitions: int
) -> DataFrame | None:
    """(part, lo, hi) contiguous vid ranges with ~equal edge counts, or
    None for an empty graph. Exposed separately so locality diagnostics
    can map vertices to their range partition.

    The degree prefix-sum is DISTRIBUTED (the two-pass pattern from
    ingest/build.py's dictionary_encode, never a global
    ``Window.orderBy`` whose single-partition Exchange serializes |V|
    rows through one task): range-partition degrees by vid and
    materialize once (freezing the partition ids), collect one
    per-partition subtotal row per partition (num_partitions scalars —
    the only driver traffic), then add each partition's broadcast
    offset to a partition-LOCAL running sum. Works unchanged at 10^9+
    vertices; asserted single-partition-Exchange-free in
    tests/test_partition.py."""
    from pyspark.sql import Window as W

    from planar_spark.graph.superstep import releaf

    d = releaf(
        degrees.select("vid", "out_deg")
        .repartitionByRange(num_partitions, "vid")
        .sortWithinPartitions("vid")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per_pid = {
        r["pid"]: int(r["s"] or 0)
        for r in d.groupBy("pid").agg(F.sum("out_deg").alias("s")).collect()
    }
    total = sum(per_pid.values())
    if total == 0:
        return None
    target = max(1, total // num_partitions)
    offsets, acc = [], 0
    for pid in sorted(per_pid):
        offsets.append((pid, acc))
        acc += per_pid[pid]
    off_df = degrees.sparkSession.createDataFrame(
        offsets, schema="pid int, off long"
    )
    w = (
        W.partitionBy("pid")
        .orderBy("vid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pref = (
        d.withColumn("run", F.sum("out_deg").over(w))
        .join(F.broadcast(off_df), "pid")
        .select("vid", (F.col("off") + F.col("run")).alias("cum"))
    )
    return (
        pref.withColumn(
            "part", F.least(
                (F.col("cum") / target).cast("long"),
                F.lit(num_partitions - 1),
            )
        )
        .groupBy("part")
        .agg(F.min("vid").alias("lo"), F.max("vid").alias("hi"))
    )


def partition_edge_histogram(parted: DataFrame) -> list[int]:
    """Edge count per Spark partition (for balance tests/diagnostics)."""
    rows = (
        parted.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return [r["n"] for r in sorted(rows, key=lambda r: r["pid"])]
