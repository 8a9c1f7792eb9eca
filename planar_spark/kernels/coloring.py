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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.superstep import releaf
from planar_spark.graph.tables import GraphTables

PRIO_MULT = 2654435761  # Knuth's 2^32 golden-ratio multiplier
PRIO_MOD = 2**32


def _prio(col):
    return F.pmod(col * F.lit(PRIO_MULT), F.lit(PRIO_MOD))


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
        nbr = todo.join(higher, "vid").join(
            colored.select(
                F.col("vid").alias("n"), F.col("color").alias("ncolor")
            ),
            "n",
        )
        stats = nbr.groupBy("vid").agg(
            F.count(F.lit(1)).alias("n_higher"),
            F.count("ncolor").alias("n_colored"),
            F.array_sort(F.collect_set("ncolor")).alias("used"),
        )
        mex = F.coalesce(
            F.filter(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.size("used"), F.lit(0)).cast("long"),
                ),
                lambda x: ~F.array_contains(
                    F.coalesce("used", F.array().cast("array<long>")), x
                ),
            )[0],
            F.lit(0).cast("long"),
        )
        ready = (
            todo.join(stats, "vid", "left")
            .where(
                F.col("n_higher").isNull()
                | (F.col("n_higher") == F.col("n_colored"))
            )
            .select("vid", mex.alias("new_color"))
        )
        new_colored = releaf(
            colored.join(ready, "vid", "left")
            .select("vid", F.coalesce("color", "new_color").alias("color"))
            .localCheckpoint(eager=True)
        )
        colored.unpersist()
        colored = new_colored
        if colored.where(F.col("color").isNull()).limit(1).count() == 0:
            break
    higher.unpersist()
    return colored
