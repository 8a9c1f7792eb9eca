"""k-core: iterative degree peeling over the undirected graph.

Not in the reference's app set, but a standard web-graph hygiene /
community kernel (drop low-connectivity crawl fringe before expensive
analytics). Semantics: the k-core is the maximal induced subgraph in
which every vertex has undirected degree >= k; computed by repeatedly
deleting vertices of degree < k until a fixpoint.

DataFrame round: restrict the symmetric edge set to live vertices (two
semi-joins against the live set), count degrees, keep deg >= k. The
live set is a localCheckpoint+releaf leaf per round (see superstep.py's
stats-blowup note), so per-round plans are constant-size. Rounds are
bounded by the peeling depth, which is small on web-like graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.superstep import releaf
from planar_spark.graph.tables import GraphTables


def k_core(
    graph: GraphTables,
    k: int,
    config: EngineConfig | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """(vid, in_core) over ALL vertices; in_core = 1 iff vid is in the
    k-core. Deterministic (the k-core is unique)."""
    config = config or EngineConfig()
    parts = config.partitions_for(graph.spark)
    sym = graph.symmetric_edges().repartition(parts, "src").persist()
    alive = releaf(
        graph.vertices.select("vid").localCheckpoint(eager=True)
    )
    n_alive = alive.count()
    for _ in range(max_rounds):
        a_src = alive.select(F.col("vid").alias("src"))
        a_dst = alive.select(F.col("vid").alias("dst"))
        deg = (
            sym.join(a_src, "src", "left_semi")
            .join(a_dst, "dst", "left_semi")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        new_alive = releaf(
            deg.where(F.col("deg") >= k).select("vid").localCheckpoint(eager=True)
        )
        n_new = new_alive.count()
        alive = new_alive
        if n_new == n_alive:
            break
        n_alive = n_new
    sym.unpersist()
    return (
        graph.vertices.select("vid")
        .join(alive.withColumn("_in", F.lit(1)), "vid", "left")
        .select("vid", F.coalesce("_in", F.lit(0)).cast("long").alias("in_core"))
    )
