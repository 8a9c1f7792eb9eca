"""BFS/SSSP vs oracle on all fixture families."""

from __future__ import annotations

import numpy as np
import pytest

from planar_spark.ingest.pages import (
    edges_dangling_chain,
    edges_powerlaw,
    edges_ring,
    edges_simple4,
    edges_star_hub,
)
from planar_spark.kernels.sssp import bfs_sssp, sssp_with_unreached
from planar_spark.oracle import oracle_sssp

from tests.conftest import graph_from_numpy

CASES = [
    ("simple4", edges_simple4(), 4, 0),
    ("ring", edges_ring(40), 40, 5),
    ("star_hub", edges_star_hub(100), 100, 3),
    ("dangling_chain", edges_dangling_chain(25), 25, 0),
    ("powerlaw", edges_powerlaw(200, m=2, seed=13), 200, 199),
]


@pytest.mark.parametrize(
    "name,edges,n,src", CASES, ids=[c[0] for c in CASES]
)
def test_sssp_matches_oracle(spark, config, name, edges, n, src):
    g = graph_from_numpy(spark, edges, n)
    result = bfs_sssp(g, src, config)
    assert result.converged
    rows = {
        r["vid"]: r["dist"]
        for r in sssp_with_unreached(g, result.state).collect()
    }
    got = np.array([rows[v] for v in range(n)])
    want = oracle_sssp(edges, n, src)
    assert (got == want).all()


def test_sssp_steps_equal_eccentricity_plus_one(spark, config):
    """BFS terminates after ecc+1 supersteps (the empty-frontier round)."""
    n = 25
    g = graph_from_numpy(spark, edges_dangling_chain(n), n)
    result = bfs_sssp(g, 0, config)
    assert result.steps_run == n  # dist reaches n-1, then one empty round


def test_weighted_sssp_matches_dijkstra(spark, config):
    import heapq

    from pyspark.sql import functions as F

    from planar_spark.kernels.sssp import weighted_sssp
    from planar_spark.ingest.pages import edges_powerlaw
    from tests.conftest import graph_from_numpy

    n = 200
    edges = edges_powerlaw(n, m=3, seed=31)
    g = graph_from_numpy(spark, edges, n)
    wmap = {
        (int(a), int(b)): (int(a) * 7 + int(b) * 13) % 10 + 1
        for a, b in edges
        if a != b
    }
    w = g.edges.select(
        "src", "dst", ((F.col("src") * 7 + F.col("dst") * 13) % 10 + 1).alias("w")
    )
    src = n - 1  # newest BA vertex: guaranteed out-edges
    got = {
        r["vid"]: r["dist"]
        for r in weighted_sssp(g, src, config, weights=w).collect()
    }
    # Dijkstra reference
    adj: dict[int, list[tuple[int, int]]] = {}
    for (a, b), ww in wmap.items():
        adj.setdefault(a, []).append((b, ww))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, ww in adj.get(u, []):
            nd = d + ww
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    for v in range(n):
        assert got[v] == dist.get(v, -1), v
    # weighted must differ from hop-BFS somewhere on this graph
    bfs = {
        r["vid"]: r["dist"]
        for r in weighted_sssp(g, src, config).collect()  # default w=1
    }
    assert any(
        bfs[v] != got[v] for v in range(n) if got[v] >= 0
    )


def test_weighted_sssp_default_weights_are_bfs_levels(spark, config):
    from planar_spark.kernels.sssp import weighted_sssp
    from planar_spark.ingest.pages import edges_ring
    from tests.conftest import graph_from_numpy

    g = graph_from_numpy(spark, edges_ring(8), 8)
    got = {
        r["vid"]: r["dist"]
        for r in weighted_sssp(g, 0, config).collect()
    }
    assert got == {v: v for v in range(8)}


def test_weighted_sssp_resume_equals_uninterrupted(spark, tmp_path):
    from pyspark.sql import functions as F

    from planar_spark.graph.superstep import SuperstepEngine
    from planar_spark.kernels.sssp import weighted_sssp
    from planar_spark.ingest.pages import edges_powerlaw
    from tests.conftest import graph_from_numpy

    from planar_spark.config import EngineConfig

    n = 200
    edges = edges_powerlaw(n, m=3, seed=31)
    g = graph_from_numpy(spark, edges, n)
    cfg = EngineConfig(
        num_partitions=8, tolerance=0.0, checkpoint_dir=str(tmp_path)
    )
    w = g.edges.select(
        "src", "dst", ((F.col("src") * 7 + F.col("dst") * 13) % 10 + 1).alias("w")
    )
    src = n - 1
    # the crash: 2 supersteps then die (RuntimeError from exhausted rounds)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        weighted_sssp(
            g, src, cfg, weights=w, max_rounds=2,
            engine=SuperstepEngine(spark, cfg, "weighted_sssp", run_id="ws1"),
        )
    resumed = weighted_sssp(
        g, src, cfg, weights=w, resume=True,
        engine=SuperstepEngine(spark, cfg, "weighted_sssp", run_id="ws1"),
    )
    full = weighted_sssp(g, src, cfg, weights=w)
    a = sorted(tuple(r) for r in resumed.collect())
    b = sorted(tuple(r) for r in full.collect())
    assert a == b
