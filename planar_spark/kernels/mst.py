"""Minimum spanning forest via Boruvka supersteps.

Reference kernel: core/apps/mst_app.cpp:5-238 — per round FindMinEdge
(each vertex/component finds its minimum incident edge, using vertex
ids as the implicit weight proxy, mst_app.cpp:88-99), Graft (hook
components along those edges), PointJump, Contract. We keep the same
weight proxy, made fully deterministic: the weight of undirected edge
(a, b), a<b, is the pair (a, b) ordered lexicographically.

DataFrame Boruvka round:
  1. label edges by the component of each endpoint (2 joins);
  2. drop intra-component edges (the Contract);
  3. per component, pick the min incident edge — ``min_by`` over the
     (a, b) struct (the FindMinEdge);
  4. union the picked edges into the forest; hook components:
     component label <- min(label, other endpoint's label) over picked
     edges, then pointer-jump to collapse chains (the Graft+PointJump —
     same machinery as components.py).

Terminates when no inter-component edges remain; the result is the
spanning forest edge set (exact, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.superstep import releaf
from planar_spark.graph.tables import GraphTables


def boruvka_msf(
    graph: GraphTables,
    config: EngineConfig | None = None,
    max_rounds: int = 30,
) -> DataFrame:
    """Returns the spanning-forest edges (a, b) with a < b."""
    config = config or EngineConfig()
    spark = graph.spark
    parts = config.partitions_for(spark)

    und = graph.undirected_edges().repartition(parts, "a").persist()
    labels = releaf(
        graph.vertices.select(
            "vid", F.col("vid").alias("label")
        ).localCheckpoint(eager=True)
    )
    forest = None

    for _ in range(max_rounds):
        la = labels.select(F.col("vid").alias("a"), F.col("label").alias("ca"))
        lb = labels.select(F.col("vid").alias("b"), F.col("label").alias("cb"))
        live = releaf(
            und.join(la, "a").join(lb, "b")
            .where(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
        if live.limit(1).count() == 0:
            break
        # FindMinEdge per component: min (a, b) struct incident to it,
        # seen from both endpoints' components.
        incident = live.select(
            F.col("ca").alias("comp"), F.struct("a", "b").alias("e")
        ).unionAll(
            live.select(F.col("cb").alias("comp"), F.struct("a", "b").alias("e"))
        )
        picked = (
            incident.groupBy("comp")
            .agg(F.min("e").alias("e"))
            .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        picked = releaf(picked)
        forest = picked if forest is None else forest.unionAll(picked).distinct()
        forest = releaf(forest.localCheckpoint(eager=True))
        # Graft: across picked edges, both endpoints' components adopt
        # the min of the two labels.
        pa = picked.join(la, "a").join(lb, "b")
        hooks = pa.select(
            F.col("ca").alias("comp"), F.col("cb").alias("adopt")
        ).unionAll(pa.select(F.col("cb").alias("comp"), F.col("ca").alias("adopt")))
        merged = hooks.groupBy("comp").agg(F.min("adopt").alias("new_label"))
        labels = (
            labels.join(
                merged, labels["label"] == merged["comp"], "left"
            )
            .select(
                "vid",
                F.least(
                    F.col("label"),
                    F.coalesce("new_label", F.col("label")),
                ).alias("label"),
            )
        )
        # PointJump to a fixpoint: every merged cluster must end the
        # round under ONE label, or a stale label could re-pick an
        # intra-cluster edge next round and close a cycle.
        labels = releaf(labels.localCheckpoint(eager=True))
        for _ in range(16):
            parent = labels.select(
                F.col("vid").alias("p_vid"), F.col("label").alias("p_label")
            )
            jumped = releaf(
                labels.join(parent, labels["label"] == parent["p_vid"])
                .select("vid", F.col("p_label").alias("label"))
                .localCheckpoint(eager=True)
            )
            changed = (
                jumped.join(
                    labels.select("vid", F.col("label").alias("old")), "vid"
                )
                .where(F.col("label") != F.col("old"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = jumped
            if changed == 0:
                break

    und.unpersist()
    if forest is None:
        return spark.createDataFrame([], schema="a long, b long")
    return forest
