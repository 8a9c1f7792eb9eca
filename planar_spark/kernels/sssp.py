"""SSSP / BFS levels (unit weights) with an explicit frontier.

Reference kernel: core/apps/sssp_app.cpp:5-134 — Init sets
dist[source]=0, else INF; each round relaxes ``dist[v]+1`` into out-
neighbors via WriteMin, and only newly-improved vertices join the next
frontier (active bitmap, sssp_app.cpp:12-24). Unit weights: the
reference relaxes with +1, so distances are BFS levels.

DataFrame formulation: state = the FULL vertex table (vid, dist) with
dist = INF until reached (exactly the reference's dense dist array,
types.h:43). The frontier of superstep k is the rows with dist == k-1
(BFS invariant), so no separate frontier table needs checkpointing.
Each superstep:

    m      = frontier ⋈_{vid==src} edges → distinct dst     (small)
    state' = state left⋈ m : dist' = k where dist==INF and hit

Scale shape: the state stays hash-partitioned by vid across rounds
because it is CACHE-persisted (InMemoryRelation preserves output
partitioning; a localCheckpoint degrades it to UnknownPartitioning —
see config.py), so the per-round shuffle is O(|frontier neighborhood|)
— only ``m`` is exchanged, never the O(V) state (asserted in
tests/test_plans.py). The frontier is broadcast when small
(maybe_broadcast) — the analogue of the reference's active-bitmap scan
skipping (core/apis/planar_app_base.h:167-205). The frontier size is
observed on the frontier checkpoint job, so a superstep is exactly two
driver actions: state materialization + frontier cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.skew import maybe_broadcast
from planar_spark.graph.superstep import SuperstepEngine, SuperstepResult
from planar_spark.graph.tables import GraphTables

INF = 2**62  # unreached sentinel (reference keeps INF, types.h:43)


def bfs_sssp(
    graph: GraphTables,
    source: int,
    config: EngineConfig | None = None,
    max_iterations: int = 100,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
) -> SuperstepResult:
    """Returns state (vid, dist) over ALL vertices; unreached = INF."""
    import dataclasses

    config = config or EngineConfig()
    # Cache-mode state: the vid-partitioned dist table joins the (small)
    # newly-reached set each round WITHOUT an O(V) exchange — cached
    # plans keep their hash partitioning, localCheckpoints do not.
    config = dataclasses.replace(config, state_persist="cache")
    if engine is not None:
        # An externally-supplied engine (the spark-submit job path) was
        # built with the caller's config — force cache-mode state there
        # too, or the per-round O(V) exchange silently comes back.
        engine.config = dataclasses.replace(
            engine.config, state_persist="cache"
        )
    spark = graph.spark
    parts = config.partitions_for(spark)
    edges = graph.edges

    def init_state() -> DataFrame:
        return (
            graph.vertices.select(
                "vid",
                F.when(F.col("vid") == int(source), 0)
                .otherwise(F.lit(INF))
                .cast("long")
                .alias("dist"),
            )
            .repartition(parts, "vid")
        )

    # The frontier is carried as a SEPARATE tiny localCheckpointed leaf,
    # not re-derived from the state inside step_fn: deriving it there
    # would make each round's logical plan reference the previous state
    # twice (left side + frontier), doubling the tree per round —
    # exponential analyzer cost. With a leaf frontier the state plan
    # grows one join per round and is truncated every
    # cache_truncate_every steps.
    carry: dict = {"frontier": None, "size": 1}

    engine = engine or SuperstepEngine(
        spark, config, "sssp",
        lineage={"source": int(source), "num_edges": graph.num_edges},
    )
    if resume:
        # Seed the broadcast-size estimate from the checkpoint's metrics:
        # without this, a resumed mid-expansion BFS would force-broadcast
        # an arbitrarily large frontier.
        latest = engine.latest_checkpoint()
        if latest is not None:
            carry["size"] = latest[2].get("frontier_size")

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        frontier = carry["frontier"]
        if frontier is None:  # first step of a fresh or resumed run
            frontier = (
                state.where(F.col("dist") == k - 1)
                .select("vid")
                .localCheckpoint(eager=True)
            )
        frontier = maybe_broadcast(frontier, config, carry["size"])
        m = (
            edges.join(frontier, edges["src"] == frontier["vid"], "left_semi")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .withColumn("_hit", F.lit(True))
        )
        new = state.join(m, "vid", "left").select(
            "vid",
            F.when(
                (F.col("dist") >= INF) & F.col("_hit").isNotNull(), F.lit(k)
            )
            .otherwise(F.col("dist"))
            .cast("long")
            .alias("dist"),
        )
        return new, {}

    def post(old: DataFrame, new: DataFrame, k: int) -> dict:
        # next round's frontier: the rows set to k this round — a tiny
        # leaf cut from the (already materialized) new state. Its size
        # is observed on the same checkpoint job (no standalone count).
        from pyspark.sql import Observation

        obs = Observation()
        frontier = (
            new.where(F.col("dist") == k)
            .select("vid")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = int(obs.get["n"])
        carry["frontier"] = frontier
        carry["size"] = n
        return {"frontier_size": n}

    def converged(metrics: dict) -> bool:
        return metrics.get("frontier_size", -1) == 0

    return engine.run(
        init_state, step, max_iterations, converged, post_fn=post, resume=resume
    )


def weighted_sssp(
    graph: GraphTables,
    source: int,
    config: EngineConfig | None = None,
    weights: DataFrame | None = None,
    max_rounds: int = 300,
    metrics_out: dict | None = None,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
) -> DataFrame:
    """(vid, dist) for ALL vertices: minimum total EDGE WEIGHT from
    ``source``; unreached = -1. The true weighted companion to
    bfs_sssp (which relaxes +1 per hop, core/apps/sssp_app.cpp:12-24 —
    the reference has no weighted variant; crawl frontier scheduling
    and link-distance analyses want one).

    ``weights``: (src, dst, w) with non-negative weights, defaulting to
    hop weight 1 (== BFS levels). Algorithm is frontier Bellman-Ford on
    the SuperstepEngine, structured exactly like bfs_sssp:

    - cache-mode state (vid, dist, _imp): InMemoryRelation preserves
      the vid hash-partitioning, so the O(V) state streams into each
      round's merge join un-exchanged;
    - the improved set (the Bellman-Ford frontier) is cut as a SEPARATE
      tiny localCheckpointed LEAF in post() with its size observed on
      the cut job — deriving it from the state inside step_fn would
      make each round's plan reference the previous state twice and
      double the logical tree per round (exponential analyzer cost;
      measured: minutes per run vs seconds — see bfs_sssp's module
      note);
    - round r relaxes only edges out of round r-1's improved set, so
      per-round shuffle volume is O(improved-set edges) after the
      first relax; the frontier broadcasts when small.

    Riding the engine also buys the durable per-superstep checkpoint /
    ``resume`` path for free: the checkpointed state carries the
    ``_imp`` flag, so a resumed run re-derives the EXACT Bellman-Ford
    frontier (``_imp == 1``) — the same set the checkpoint's
    ``improved`` metric counted, so the broadcast-size seed always
    matches the frontier actually broadcast (an O(V) reached-set
    frontier with a small size seed could force-broadcast the whole
    state). Terminates at the exact fixpoint; raises if ``max_rounds``
    is exhausted first."""
    import dataclasses

    config = config or EngineConfig()
    config = dataclasses.replace(config, state_persist="cache")
    if engine is not None:
        engine.config = dataclasses.replace(
            engine.config, state_persist="cache"
        )
    spark = graph.spark
    parts = config.partitions_for(spark)
    ew = (
        weights
        if weights is not None
        else graph.edges.select("src", "dst", F.lit(1).alias("w"))
    )
    ew = ew.repartition(parts, "src").persist()

    def init_state() -> DataFrame:
        return graph.vertices.select(
            "vid",
            F.when(F.col("vid") == int(source), F.lit(0))
            .otherwise(F.lit(INF))
            .cast("long")
            .alias("dist"),
            (F.col("vid") == int(source)).cast("long").alias("_imp"),
        ).repartition(parts, "vid")

    carry: dict = {"frontier": None, "size": 1}

    engine = engine or SuperstepEngine(
        spark, config, "weighted_sssp",
        lineage={"source": int(source), "num_edges": graph.num_edges},
    )
    if resume:
        latest = engine.latest_checkpoint()
        if latest is not None:
            carry["size"] = latest[2].get("improved")

    def step(state: DataFrame, k: int) -> tuple[DataFrame, dict]:
        frontier = carry["frontier"]
        if frontier is None:  # first step of a fresh or resumed run:
            # the exact Bellman-Ford frontier is the _imp==1 set (the
            # source on a fresh init; the last completed round's
            # improved set on resume — matching the checkpointed
            # 'improved' metric that seeded carry['size'])
            frontier = (
                state.where(F.col("_imp") == 1)
                .select("vid", "dist")
                .localCheckpoint(eager=True)
            )
        relax = (
            ew.join(
                maybe_broadcast(
                    frontier.select(
                        F.col("vid").alias("src"), F.col("dist").alias("ds")
                    ),
                    config,
                    carry["size"],
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min(F.col("ds") + F.col("w")).alias("cand"))
        )
        improved = F.col("cand").isNotNull() & (F.col("cand") < F.col("dist"))
        new = state.select("vid", "dist").join(relax, "vid", "left").select(
            "vid",
            F.when(improved, F.col("cand")).otherwise(F.col("dist")).alias(
                "dist"
            ),
            improved.cast("long").alias("_imp"),
        )
        return new, {}

    def post(old: DataFrame, new: DataFrame, k: int) -> dict:
        from pyspark.sql import Observation

        obs = Observation()
        frontier = (
            new.where(F.col("_imp") == 1)
            .select("vid", "dist")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = int(obs.get["n"])
        carry["frontier"] = frontier
        carry["size"] = n
        return {"improved": n}

    def converged(metrics: dict) -> bool:
        return metrics.get("improved", -1) == 0

    result = engine.run(
        init_state, step, max_rounds, converged, post_fn=post, resume=resume
    )
    ew.unpersist()
    if not result.converged:
        raise RuntimeError(
            f"weighted_sssp: no fixpoint in {max_rounds} rounds; "
            "raise max_rounds (negative weights? deep weighted paths?)"
        )
    if metrics_out is not None:
        metrics_out["rounds"] = result.steps_run
        metrics_out["improved_per_round"] = [
            m["improved"] for m in result.metrics if "improved" in m
        ]
    return result.state.select(
        "vid",
        F.when(F.col("dist") >= INF, F.lit(-1))
        .otherwise(F.col("dist"))
        .alias("dist"),
    )


def sssp_with_unreached(
    graph: GraphTables, result_state: DataFrame
) -> DataFrame:
    """(vid, dist) for ALL vertices; unreached = -1 (reference SSSP keeps
    INF, types.h:43 — we surface -1 for a SQL-friendly sentinel)."""
    return (
        graph.vertices.select("vid")
        .join(result_state, "vid", "left")
        .select(
            "vid",
            F.when(
                F.col("dist").isNull() | (F.col("dist") >= INF), F.lit(-1)
            )
            .otherwise(F.col("dist"))
            .cast("long")
            .alias("dist"),
        )
    )
