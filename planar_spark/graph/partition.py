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

    1. degree prefix-sum over vid order (a running-sum window per
       range-partitioned chunk would also work; degrees is |V|-sized —
       small relative to edges — so a single window pass is acceptable
       up to ~10^9 vertices, and the output is only `num_partitions`
       boundary vids, computed once per graph load);
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
    can map vertices to their range partition."""
    total = degrees.agg(F.sum("out_deg")).collect()[0][0] or 0
    if total == 0:
        return None
    target = max(1, total // num_partitions)
    # prefix sums: cumulative edges up to and including each vid
    from pyspark.sql import Window as W

    w = W.orderBy("vid").rowsBetween(W.unboundedPreceding, 0)
    pref = degrees.select("vid", F.sum("out_deg").over(w).alias("cum"))
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
