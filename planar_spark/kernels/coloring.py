"""Greedy graph coloring — deterministic Jones-Plassmann supersteps.

Reference kernel: core/apps/coloring_app.cpp:5-110 — iterative conflict
resolution where a conflicted vertex bumps its color by an UNSEEDED
``rand()`` (coloring_app.cpp:110), so the reference's output is
nondeterministic run-to-run. We keep its goal (a proper coloring via
neighbor-conflict supersteps) but make the result exactly reproducible:
Jones-Plassmann with a deterministic pseudo-random priority

    prio(v) = (v * 2654435761) mod 2^32,  ties broken by vid

A vertex colors itself once all higher-priority neighbors are colored,
picking the minimum color not used by them (mex). Random priorities
bound the round count at O(log n) expected (vs O(longest monotone
path) if vid itself were the priority), and the output equals the
sequential greedy coloring in descending-priority order — checked
exactly by the pure-Python oracle.

Scale shape of the mex: counting-based, NEVER a per-vertex
``collect_set`` of neighbor colors — on a power-law graph a hub with
10^6 colored higher-priority neighbors would materialize one giant
array row in a single aggregation buffer. Instead: mex(v) is the min
g in 0..n_distinct_colors(v) absent among v's neighbor colors, found
by exploding that (n_distinct+1)-candidate range and anti-joining the
distinct (vid, neighbor color) pairs — rows stream through ordinary
shuffles, no wide aggregation state. The per-round uncolored count is
observed on the state checkpoint job (no standalone count action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.superstep import releaf
from planar_spark.graph.tables import GraphTables

PRIO_MULT = 2654435761  # Knuth's 2^32 golden-ratio multiplier
PRIO_MOD = 2**32


def _prio(col):
    return F.pmod(col * F.lit(PRIO_MULT), F.lit(PRIO_MOD))


def _round_new_colors(
    todo: DataFrame, higher: DataFrame, colored: DataFrame
) -> DataFrame:
    """One Jones-Plassmann round: (vid, new_color) for every uncolored
    vertex whose higher-priority neighbors are ALL colored, new_color =
    mex of those neighbors' colors (counting-based — see module doc).

    Single join chain: the distinct (vid, neighbor-color) set ``u2``
    determines BOTH readiness (no NULL among the neighbor colors) and
    the mex (anti-join of the candidate range against it) — the base
    gather join runs once per round, and the identical ``u2`` subplan
    on the stats and anti-join branches is a reused exchange."""
    u2 = (
        todo.join(higher, "vid")
        .join(
            colored.select(
                F.col("vid").alias("n"), F.col("color").alias("ncolor")
            ),
            "n",
        )
        .select("vid", "ncolor")
        .distinct()
    )
    stats = u2.groupBy("vid").agg(
        F.max(F.col("ncolor").isNull()).alias("has_uncolored"),
        F.count("ncolor").alias("n_used"),
    )
    # ready = all higher-priority neighbors colored (or none exist)
    ready = (
        todo.join(stats, "vid", "left")
        .where(F.col("has_uncolored").isNull() | ~F.col("has_uncolored"))
        .select("vid", F.coalesce("n_used", F.lit(0)).alias("n_used"))
    )
    # mex via candidate range + anti-join: n_used distinct colors can
    # block at most n_used of the n_used+1 candidates 0..n_used, so the
    # min surviving candidate always exists.
    cand = ready.select(
        "vid",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_used").cast("long"))
        ).alias("c"),
    )
    used = u2.select("vid", F.col("ncolor").alias("c"))
    return (
        cand.join(used, ["vid", "c"], "left_anti")
        .groupBy("vid")
        .agg(F.min("c").alias("new_color"))
    )


def greedy_coloring(
    graph: GraphTables,
    config: EngineConfig | None = None,
    max_rounds: int = 100,
) -> DataFrame:
    """Returns (vid, color) — a proper coloring, deterministic."""
    config = config or EngineConfig()
    spark = graph.spark
    parts = config.partitions_for(spark)

    sym = graph.symmetric_edges()
    # (vid, n) edges where n has HIGHER priority than vid
    ps = _prio(F.col("src"))
    pd_ = _prio(F.col("dst"))
    higher = (
        sym.where(
            (pd_ > ps) | ((pd_ == ps) & (F.col("dst") > F.col("src")))
        )
        .select(F.col("src").alias("vid"), F.col("dst").alias("n"))
        .repartition(parts, "vid")
        .persist()
    )
    colored = releaf(
        graph.vertices.select(
            "vid", F.lit(None).cast("long").alias("color")
        ).localCheckpoint(eager=True)
    )

    for _ in range(max_rounds):
        todo = colored.where(F.col("color").isNull()).select("vid")
        mex = _round_new_colors(todo, higher, colored)
        obs = Observation()
        new_colored = releaf(
            colored.join(mex, "vid", "left")
            .select("vid", F.coalesce("color", "new_color").alias("color"))
            .observe(
                obs,
                F.sum(F.col("color").isNull().cast("long")).alias("n_uncolored"),
            )
            .localCheckpoint(eager=True)
        )
        colored.unpersist()
        colored = new_colored
        if int(obs.get["n_uncolored"] or 0) == 0:
            break
    higher.unpersist()
    return colored
