"""Physical-plan shape assertions: the scale properties we rely on.

These lock in the plan-level invariants (SURVEY.md §4) so a regression
that silently reintroduces a per-superstep edge shuffle or breaks
pushdown fails CI, not a 100 TB run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.skew import salted_gather_join
from planar_spark.ingest.pages import edges_powerlaw

from tests.conftest import graph_from_numpy


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gather_join_is_merge_and_edge_side_unshuffled(spark, config):
    edges = edges_powerlaw(500, m=3, seed=1)
    g = graph_from_numpy(spark, edges, 500)
    state = g.degrees.withColumn("pr", F.lit(1.0 / 500))
    live = state.where(F.col("out_deg") > 0).select(
        "vid", (F.col("pr") / F.col("out_deg")).alias("w")
    )
    gathered = salted_gather_join(g.edges, live, config, hubs=None)
    contribs = gathered.groupBy(F.col("dst").alias("vid")).agg(
        F.sum("w").alias("contrib")
    )
    contribs.collect()  # AQE finalizes the plan on execution
    plan = _plan(contribs)
    assert "SortMergeJoin" in plan, plan
    # the edge side comes straight from the cache: the cached layout
    # provides hash(src) partitioning + src ordering, so the ONLY
    # exchanges Spark inserts at runtime (ENSURE_REQUIREMENTS) must be
    # on the agg key (dst) / state side — never re-shuffling edges by
    # src. (The REPARTITION_BY_NUM exchange recorded inside the
    # InMemoryRelation is the one-time cache build, which is expected.)
    assert "InMemoryTableScan" in plan
    # Structural check on the join's edge branch: between the
    # SortMergeJoin node and the cached-edge scan there must be neither
    # an Exchange nor a Sort. (Exchanges recorded deeper in the plan
    # dump belong to nested InMemoryRelation build plans — the one-time
    # cache load — and are expected.)
    i = plan.index("SortMergeJoin [src")
    j = plan.index("TableCacheQueryStage", i)
    edge_branch = plan[i:j]
    assert "Exchange" not in edge_branch, plan
    assert "Sort [src" not in edge_branch, plan


def test_two_hop_stats_no_wedge_materialization(spark, config):
    """two_hop_stats must pre-aggregate per-mid min/max BELOW the join —
    never materialize the O(Σ in_deg·out_deg) wedge set. On this star
    fixture the wedge count is n² while |E| = 2n."""
    from planar_spark.kernels.neighborhood import two_hop_stats

    n = 50
    edges = np.array(
        [(i, 0) for i in range(1, n + 1)] + [(0, n + i) for i in range(1, n + 1)]
    )
    g = graph_from_numpy(spark, edges, 2 * n + 1)
    out = two_hop_stats(g)
    rows = {r["vid"]: (r["min_two_hop"], r["max_two_hop"]) for r in out.collect()}
    assert rows[1] == (n + 1, 2 * n)  # spokes see hub's out-neighbors
    assert 0 not in rows              # hub's out-neighbors are sinks
    # Optimized logical plan (no AQE duplication): exactly one join, and
    # an Aggregate sits BELOW it (the per-mid pre-agg) — children print
    # after their parent in the tree dump.
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Join ") == 1, opt
    join_at = opt.index("Join ")
    assert "Aggregate" in opt[join_at:], opt


def test_triad_census_join_diet(spark, config):
    """The direction flags must come from ONE pre-aggregated
    undirected-pair table joined three times (once per triangle edge),
    not six per-flag joins: optimized plan = 2 triangle-build joins +
    3 flag joins = 5 total."""
    from planar_spark.kernels.graphstats import triad_census

    edges = edges_powerlaw(120, m=2, seed=5)
    g = graph_from_numpy(spark, edges, 120)
    out = triad_census(g, config)
    out.collect()
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    # count LOGICAL join nodes ("Join Inner ...") — InMemoryRelation
    # blocks embed cached PHYSICAL plans whose BroadcastHashJoin lines
    # would inflate a bare "Join " count
    assert opt.count("Join Inner") <= 5, opt


def test_lpa_and_random_walk_have_no_window(spark, config):
    """Hot paths must use partial-agg-able struct argmin/argmax, never a
    per-vertex window sort (a hub's neighbor multiset would land in one
    window partition)."""
    from planar_spark.kernels import label_propagation
    from planar_spark.kernels.neighborhood import random_walk

    edges = edges_powerlaw(300, m=3, seed=2)
    g = graph_from_numpy(spark, edges, 300)
    lpa_state = label_propagation(g, config, num_iterations=1).state
    lpa_state.collect()
    assert "Window" not in _plan(lpa_state)
    walks = random_walk(g, config, num_steps=2)
    walks.collect()
    assert "Window" not in _plan(walks)


def test_sssp_state_not_reshuffled_per_round(spark, config):
    """Per BFS round the O(V) dist state must stream into the join
    un-exchanged; only the O(frontier) newly-reached set moves. (r8
    flat-leaf state: the previous round's state is a releaf'd
    localCheckpoint leaf, and the newly-reached set joins it as the
    broadcast build side — the state branch is a bare leaf scan.)"""
    from planar_spark.kernels.sssp import bfs_sssp

    import os

    edges = edges_powerlaw(400, m=3, seed=5)
    g = graph_from_numpy(spark, edges, 400)
    # The returned state is itself a leaf (flat-leaf design), so the
    # per-superstep plan is captured via the engine's explain hook.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        os.environ["SPARK_GRAFT_EXPLAIN_DIR"] = d
        try:
            bfs_sssp(g, 7, config)
        finally:
            os.environ.pop("SPARK_GRAFT_EXPLAIN_DIR", None)
        steps = sorted(
            f for f in os.listdir(d) if f.startswith("sssp_step")
        )
        assert len(steps) >= 2, steps
        with open(os.path.join(d, steps[-1])) as f:
            plan = f.read()
    # The superstep join: its left (state) branch is the previous state
    # leaf — no Exchange may sit between the join node and the leaf
    # scan. The broadcast build side prints after the state branch.
    i = plan.index("Join LeftOuter")
    j = plan.index("Scan ExistingRDD", i)
    assert "Exchange" not in plan[i:j], plan[i : j + 200]


def test_parquet_filter_pushdown(spark, tmp_path):
    """Filters and projections reach the parquet scan."""
    import pandas as pd

    path = str(tmp_path / "docs.parquet")
    pd.DataFrame(
        {
            "doc_id": np.arange(100),
            "text": [f"t{i}" for i in range(100)],
            "lang": ["en" if i % 3 else "de" for i in range(100)],
        }
    ).to_parquet(path)
    df = spark.read.parquet(path).where(F.col("lang") == "en").select("doc_id")
    df.collect()
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan
    assert "ReadSchema: struct<doc_id:bigint" in plan, plan


def test_releaf_prevents_checkpoint_stats_blowup(spark):
    """Dataset.localCheckpoint copies the child plan's size estimate
    into the new leaf; a self-joining superstep then SQUARES sizeInBytes
    every round until join planning spends seconds in BigInteger math
    (observed live in SizeInBytesOnlyStatsPlanVisitor at round ~18).
    releaf() must reset the leaf to default stats."""
    from planar_spark.graph.superstep import releaf

    df = spark.range(100).selectExpr("id AS vid", "id AS label")
    state = releaf(df.localCheckpoint(eager=True))
    for _ in range(6):
        parent = state.select(
            F.col("vid").alias("p_vid"), F.col("label").alias("p_label")
        )
        state = (
            state.join(parent, state["label"] == parent["p_vid"])
            .select("vid", F.col("p_label").alias("label"))
        )
        state = releaf(state.localCheckpoint(eager=True))
    size = int(
        str(state._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    # without releaf the estimate squares per round (>10^40 by round 6)
    assert size < 10**25, size
    assert state.count() == 100


def test_reversed_edge_gather_is_merge_join(spark, config):
    """The hits/hyperball hub-phase gather joins on the REVERSED edge
    cache (partitioned+sorted by the reversed src): like the forward
    gather, it must be a merge join with no Exchange/Sort on the edge
    branch — the reversed cache exists precisely to buy that."""
    edges = edges_powerlaw(500, m=3, seed=2)
    g = graph_from_numpy(spark, edges, 500)
    parts = config.partitions_for(spark)
    rev = (
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition(parts, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    live = g.degrees.select("vid", F.lit(1.0).alias("w"))
    gathered = salted_gather_join(rev, live, config, hubs=None)
    out = gathered.groupBy(F.col("dst").alias("vid")).agg(
        F.sum("w").alias("s")
    )
    out.collect()
    plan = _plan(out)
    assert "SortMergeJoin" in plan, plan
    i = plan.index("SortMergeJoin [src")
    j = plan.index("TableCacheQueryStage", i)
    branch = plan[i:j]
    assert "Exchange" not in branch, plan
    assert "Sort [src" not in branch, plan
    rev.unpersist()


def test_scc_and_bowtie_plans_have_no_window(spark, config):
    from planar_spark.kernels.scc import bowtie_regions

    edges = edges_powerlaw(120, m=2, seed=4)
    g = graph_from_numpy(spark, edges, 120)
    out = bowtie_regions(g, config)
    # bowtie runs scc + 2 BFS + wcc internally; the final merge plan
    # (and by construction every checkpointed inner step) is window-free
    assert "Window" not in _plan(out)
    assert out.count() == 120


def test_block_pinned_gather_edge_side_unshuffled(spark, config):
    """The locality gather (graph/locality.py): sym cached as
    HashPartitioning(sblk) + sorted (sblk, src), joined to labels on
    the compound [sblk, src] key. HashPartitioning on the subset key
    must satisfy the join's distribution — zero exchange AND zero sort
    on the edge branch; only the label side shuffles (by vblk)."""
    edges = edges_powerlaw(400, m=3, seed=2)
    g = graph_from_numpy(spark, edges, 400)
    # partition count must match the session's shuffle partitions (8):
    # a cached HashPartitioning with a DIFFERENT numPartitions is not
    # co-partition-compatible and Spark re-shuffles the edge side.
    g2, _ = g.with_partitioning("bfs_edge_cut", num_partitions=8)

    from planar_spark.graph.locality import block_pinned_sym

    sym = block_pinned_sym(g2, 8).persist()
    sym.count()
    labels = g2.vertices.select("vid", F.col("vid").alias("label"))
    lab_b = labels.withColumn(
        "vblk", F.expr(f"vid div {int(g2.block_size)}")
    )
    # merge hint: at test scale AQE would broadcast the tiny label side
    # (also edge-side-unshuffled, but not the at-scale plan); the hint
    # pins the SMJ form that a 100TB label table gets.
    msgs = sym.hint("merge").join(
        lab_b, (sym["sblk"] == lab_b["vblk"]) & (sym["src"] == lab_b["vid"])
    ).select(F.col("dst").alias("vid"), "label")
    agg = msgs.groupBy("vid").agg(F.min("label").alias("nbr_min"))
    agg.collect()  # AQE finalizes the plan on execution
    plan = _plan(agg)
    assert "SortMergeJoin [sblk" in plan, plan
    i = plan.index("SortMergeJoin [sblk")
    j = plan.index("TableCacheQueryStage", i)
    edge_branch = plan[i:j]
    assert "Exchange" not in edge_branch, plan
    assert "Sort [sblk" not in edge_branch, plan
    sym.unpersist()


def test_pagerank_block_pinned_gather_edge_side_unshuffled(spark, config):
    """PageRank's gather on a with_partitioning graph must consume the
    block-pinned layout (r7): salted_gather_join's block mode joins the
    cached HashPartitioning(sblk)/(sblk, src)-sorted edge table on the
    compound key with zero exchange and zero sort on the edge branch."""
    edges = edges_powerlaw(400, m=3, seed=2)
    g = graph_from_numpy(spark, edges, 400)
    g2, _ = g.with_partitioning("bfs_edge_cut", num_partitions=8)

    from planar_spark.graph.locality import block_pinned_edges
    from planar_spark.graph.skew import salted_gather_join

    pinned = block_pinned_edges(g2, 8).persist()
    pinned.count()
    live = g2.degrees.where(F.col("out_deg") > 0).select(
        "vid", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )
    gathered = salted_gather_join(
        pinned, live, config, hubs=None, block_size=g2.block_size
    )
    agg = gathered.groupBy(F.col("dst").alias("vid")).agg(
        F.sum("w").alias("contrib")
    )
    agg.collect()
    plan = _plan(agg)
    assert "SortMergeJoin [sblk" in plan, plan
    i = plan.index("SortMergeJoin [sblk")
    j = plan.index("TableCacheQueryStage", i)
    edge_branch = plan[i:j]
    assert "Exchange" not in edge_branch, plan
    assert "Sort [sblk" not in edge_branch, plan
    pinned.unpersist()


def test_lpa_block_pinned_gather_edge_side_unshuffled(spark, config):
    """LPA's gather on a with_partitioning graph (r7) pins the
    SYMMETRIC edge table by locality block — same contract as WCC:
    the cached HashPartitioning(sblk)/(sblk, src)-sorted sym table
    joins the label state on the compound key with zero exchange and
    zero sort on the edge branch."""
    edges = edges_powerlaw(400, m=3, seed=3)
    g = graph_from_numpy(spark, edges, 400)
    g2, _ = g.with_partitioning("bfs_vertex_cut", num_partitions=8)

    from planar_spark.graph.locality import block_pinned_sym

    sym = block_pinned_sym(g2, 8).hint("merge").persist()
    sym.count()
    labels = g2.vertices.select("vid", F.col("vid").alias("label"))
    lab_b = labels.withColumn(
        "vblk", F.expr(f"vid div {int(g2.block_size)}")
    )
    msgs = (
        sym.join(
            lab_b,
            (sym["sblk"] == lab_b["vblk"]) & (sym["src"] == lab_b["vid"]),
        )
        .select(F.col("dst").alias("vid"), "label")
    )
    counts = msgs.groupBy("vid", "label").agg(F.count(F.lit(1)).alias("n"))
    counts.collect()
    plan = _plan(counts)
    assert "SortMergeJoin [sblk" in plan, plan
    i = plan.index("SortMergeJoin [sblk")
    j = plan.index("TableCacheQueryStage", i)
    edge_branch = plan[i:j]
    assert "Exchange" not in edge_branch, plan
    assert "Sort [sblk" not in edge_branch, plan
    sym.unpersist()
