"""Resume-from-checkpoint and skew-path correctness (FIXTURES.md §5)."""

from __future__ import annotations

import numpy as np

from planar_spark.config import EngineConfig
from planar_spark.graph.skew import hub_vertices, salted_gather_join
from planar_spark.graph.superstep import SuperstepEngine
from planar_spark.ingest.pages import edges_powerlaw, edges_star_hub
from planar_spark.kernels import connected_components, pagerank
from planar_spark.oracle import oracle_pagerank

from tests.conftest import graph_from_numpy


def _pr_rows(result):
    return sorted((r["vid"], round(r["pr"], 12)) for r in result.state.collect())


def test_pagerank_resume_equals_uninterrupted(spark, tmp_path):
    """Kill after 4 of 10 supersteps, resume -> identical final state."""
    edges = edges_powerlaw(300, m=3, seed=11)
    g = graph_from_numpy(spark, edges, 300)
    cfg = EngineConfig(
        num_partitions=8, tolerance=0.0, checkpoint_dir=str(tmp_path)
    )
    # partial run ("the crash")
    eng_a = SuperstepEngine(spark, cfg, "pagerank", run_id="runA")
    pagerank(g, cfg, num_iterations=4, engine=eng_a)
    # resume with a FRESH engine object pointing at the same run_id
    eng_a2 = SuperstepEngine(spark, cfg, "pagerank", run_id="runA")
    resumed = pagerank(g, cfg, num_iterations=10, engine=eng_a2, resume=True)
    assert resumed.steps_run == 10
    # uninterrupted reference run
    eng_b = SuperstepEngine(spark, cfg, "pagerank", run_id="runB")
    full = pagerank(g, cfg, num_iterations=10, engine=eng_b)
    assert _pr_rows(resumed) == _pr_rows(full)


def test_resume_ignores_incomplete_superstep(spark, tmp_path):
    """A step dir without _META.json (killed mid-write) must be ignored."""
    import os
    import shutil

    edges = edges_powerlaw(100, m=2, seed=5)
    g = graph_from_numpy(spark, edges, 100)
    cfg = EngineConfig(
        num_partitions=8, tolerance=0.0, checkpoint_dir=str(tmp_path)
    )
    eng = SuperstepEngine(spark, cfg, "pagerank", run_id="runC")
    pagerank(g, cfg, num_iterations=3, engine=eng)
    # simulate a crash mid-write of step 4: state written, no meta
    src = os.path.join(str(tmp_path), "pagerank", "runC", "step=00003")
    dst = os.path.join(str(tmp_path), "pagerank", "runC", "step=00004")
    shutil.copytree(src, dst)
    os.remove(os.path.join(dst, "_META.json"))
    eng2 = SuperstepEngine(spark, cfg, "pagerank", run_id="runC")
    found = eng2.latest_checkpoint()
    assert found is not None and found[0] == 3


def test_cc_resume(spark, tmp_path):
    edges = edges_powerlaw(200, m=2, seed=9)
    g = graph_from_numpy(spark, edges, 200)
    cfg = EngineConfig(
        num_partitions=8, tolerance=0.0, checkpoint_dir=str(tmp_path)
    )
    eng = SuperstepEngine(spark, cfg, "connected_components", run_id="cc1")
    connected_components(g, cfg, max_iterations=1, engine=eng)
    eng2 = SuperstepEngine(spark, cfg, "connected_components", run_id="cc1")
    resumed = connected_components(g, cfg, engine=eng2, resume=True)
    assert resumed.converged
    full = connected_components(g, cfg)
    a = sorted((r["vid"], r["label"]) for r in resumed.state.collect())
    b = sorted((r["vid"], r["label"]) for r in full.state.collect())
    assert a == b


def test_salted_gather_equals_plain(spark):
    """The hub-salted gather join must produce identical aggregates."""
    from pyspark.sql import functions as F

    n = 500
    edges = edges_star_hub(n)  # vertex 0 has out-degree n-1: a hub
    g = graph_from_numpy(spark, edges, n)
    cfg = EngineConfig(num_partitions=8, salt_buckets=4, hub_degree_threshold=50)
    state = g.degrees.withColumn("pr", F.lit(1.0 / n))
    live = state.select("vid", (F.col("pr") / F.col("out_deg")).alias("w"))
    hubs = hub_vertices(g.degrees, cfg.hub_degree_threshold)
    assert hubs.count() == 1  # the star hub
    plain = (
        salted_gather_join(g.edges, live, cfg, hubs=None)
        .groupBy("dst").agg(F.sum("w").alias("c"))
    )
    salted = (
        salted_gather_join(g.edges, live, cfg, hubs=hubs)
        .groupBy("dst").agg(F.sum("w").alias("c"))
    )
    a = sorted((r["dst"], round(r["c"], 12)) for r in plain.collect())
    b = sorted((r["dst"], round(r["c"], 12)) for r in salted.collect())
    assert a == b


def test_pagerank_with_salting_matches_oracle(spark):
    """Force the salted path end-to-end on the star graph."""
    n = 400
    edges = edges_star_hub(n)
    g = graph_from_numpy(spark, edges, n)
    cfg = EngineConfig(
        num_partitions=8, tolerance=0.0, hub_degree_threshold=50, salt_buckets=4
    )
    result = pagerank(g, cfg, num_iterations=10)
    rows = {r["vid"]: r["pr"] for r in result.state.collect()}
    got = np.array([rows[v] for v in range(n)])
    want = oracle_pagerank(edges, n, num_iterations=10)
    assert np.allclose(got, want, atol=1e-6)
