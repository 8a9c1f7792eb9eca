"""Deterministic, fully-distributed synthetic edge generation.

For scaling benchmarks we need graphs big enough that compute dominates
task overhead (BASELINE.md §3: >= 10^6-10^7 edges). Generating them on
the driver would be the bottleneck, so edges are derived from
``spark.range`` with arithmetic mixing only — pure JVM-side, codegen'd,
embarrassingly parallel, and byte-deterministic at any parallelism
(every edge is a function of its index alone).

Degree skew: src is drawn from a quadratic-biased distribution
(u^2 mapping), giving hub vertices ~sqrt-law concentration — enough
skew to exercise the salted-gather path without an iterative generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# distinct salts for the two independent hash streams
_MIX1 = 1
_MIX2 = 2


def _mix(col, salt: int, mod: int):
    # xxhash64(id, salt) mod m — overflow-free under ANSI mode
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(mod))


def synth_edges(
    spark: SparkSession,
    num_edges: int,
    num_vertices: int,
    skew: float = 2.0,
    num_partitions: int = 64,
) -> DataFrame:
    """(src, dst) with skewed src distribution, deterministic per index."""
    ids = spark.range(0, num_edges, 1, num_partitions)
    u = _mix(F.col("id"), _MIX1, 1_000_003).cast("double") / 1_000_003.0
    src = F.floor(F.pow(u, F.lit(skew)) * num_vertices).cast("long")
    dst = _mix(F.col("id"), _MIX2, num_vertices).cast("long")
    return (
        ids.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def synth_edges_locality(
    spark: SparkSession,
    num_edges: int,
    num_vertices: int,
    host_size: int = 100,
    p_intra: float = 0.85,
    skew: float = 2.0,
    num_partitions: int = 64,
) -> DataFrame:
    """Locality-rich web graph: vertices grouped into contiguous "hosts"
    of ``host_size`` ids; each edge stays inside its src's host with
    probability ``p_intra`` (Common-Crawl link graphs are ~75-90%
    intra-host — Meusel et al. 2015 report ~3/4 of links intra-pay-level
    -domain). Because hosts are id-contiguous, the graph is ALREADY in a
    region-major layout: setting ``GraphTables.block_size`` to a
    multiple of ``host_size`` makes the block-pinned gather capture the
    locality with no relabel pass. Deterministic per edge index."""
    ids = spark.range(0, num_edges, 1, num_partitions)
    u = _mix(F.col("id"), _MIX1, 1_000_003).cast("double") / 1_000_003.0
    src = F.floor(F.pow(u, F.lit(skew)) * num_vertices).cast("long")
    base = ids.select(F.col("id"), src.alias("src"))
    host_base = F.col("src") - F.pmod(F.col("src"), F.lit(host_size))
    dst_local = host_base + _mix(F.col("id"), _MIX2, host_size)
    dst_global = _mix(F.col("id"), _MIX2, num_vertices).cast("long")
    is_intra = (
        _mix(F.col("id"), 3, 1_000_000).cast("double") / 1_000_000.0
    ) < F.lit(p_intra)
    dst = F.when(is_intra, dst_local).otherwise(dst_global)
    return (
        base.select("src", dst.cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .where(F.col("dst") < num_vertices)
    )
