"""SSSP / BFS levels (unit weights) with an explicit frontier.

Reference kernel: core/apps/sssp_app.cpp:5-134 — Init sets
dist[source]=0, else INF; each round relaxes ``dist[v]+1`` into out-
neighbors via WriteMin, and only newly-improved vertices join the next
frontier (active bitmap, sssp_app.cpp:12-24). Unit weights: the
reference relaxes with +1, so distances are BFS levels.

DataFrame formulation: the state is the set of REACHED vertices
(vid, dist); the frontier of superstep k is exactly the rows with
dist == k-1 (BFS invariant), so no separate frontier table needs
checkpointing. Each superstep:

    new = frontier ⋈_{vid==src} edges → distinct dst → anti-join state
    state' = state ∪ new (dist = k)

The frontier is broadcast when small (maybe_broadcast) — the analogue
of the reference's active-bitmap scan skipping
(core/apis/planar_app_base.h:167-205).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.skew import maybe_broadcast
from planar_spark.graph.superstep import SuperstepEngine, SuperstepResult
from planar_spark.graph.tables import GraphTables


def bfs_sssp(
    graph: GraphTables,
    source: int,
    config: EngineConfig | None = None,
    max_iterations: int = 100,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
) -> SuperstepResult:
    """Returns state (vid, dist) over REACHED vertices only."""
    config = config or EngineConfig()
    spark = graph.spark
    parts = config.partitions_for(spark)
    edges = graph.edges

    def init_state() -> DataFrame:
        return spark.createDataFrame(
            [(int(source), 0)], schema="vid long, dist long"
        )

    last_frontier_size = {"n": 1}

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("dist") == k - 1).select("vid")
        frontier = maybe_broadcast(frontier, config, last_frontier_size["n"])
        new = (
            edges.join(frontier, edges["src"] == frontier["vid"], "left_semi")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(state, "vid", "left_anti")
            .select("vid", F.lit(k).cast("long").alias("dist"))
        )
        return state.unionByName(new).repartition(parts, "vid"), {}

    def post(old: DataFrame, new: DataFrame, k: int) -> dict:
        n = new.where(F.col("dist") == k).count()
        last_frontier_size["n"] = int(n)
        return {"frontier_size": int(n)}

    def converged(metrics: dict) -> bool:
        return metrics.get("frontier_size", -1) == 0

    engine = engine or SuperstepEngine(
        spark, config, "sssp",
        lineage={"source": int(source), "num_edges": graph.num_edges},
    )
    return engine.run(
        init_state, step, max_iterations, converged, post_fn=post, resume=resume
    )


def sssp_with_unreached(
    graph: GraphTables, result_state: DataFrame
) -> DataFrame:
    """(vid, dist) for ALL vertices; unreached = -1 (reference SSSP keeps
    INF, types.h:43 — we surface -1 for a SQL-friendly sentinel)."""
    return (
        graph.vertices.select("vid")
        .join(result_state, "vid", "left")
        .select("vid", F.coalesce("dist", F.lit(-1)).cast("long").alias("dist"))
    )
