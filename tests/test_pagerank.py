"""PageRank vs NumPy oracle (allclose 1e-6) on every fixture family."""

from __future__ import annotations

import numpy as np
import pytest

from planar_spark.config import EngineConfig
from planar_spark.ingest.pages import (
    edges_dangling_chain,
    edges_powerlaw,
    edges_ring,
    edges_simple4,
    edges_star_hub,
    edges_two_cliques,
)
from planar_spark.kernels import pagerank
from planar_spark.oracle import oracle_pagerank

from tests.conftest import graph_from_numpy


def _pr_array(result, n):
    rows = {r["vid"]: r["pr"] for r in result.state.collect()}
    return np.array([rows[v] for v in range(n)])


CASES = [
    ("simple4", edges_simple4(), 4),
    ("ring", edges_ring(50), 50),
    ("star_hub", edges_star_hub(200), 200),
    ("dangling_chain", edges_dangling_chain(30), 30),
    ("powerlaw", edges_powerlaw(300, m=3, seed=42), 300),
]


@pytest.mark.parametrize("name,edges,n", CASES, ids=[c[0] for c in CASES])
def test_pagerank_matches_oracle(spark, config, name, edges, n):
    g = graph_from_numpy(spark, edges, n)
    iters = 15
    result = pagerank(g, config, num_iterations=iters)
    got = _pr_array(result, n)
    want = oracle_pagerank(edges, n, damping=0.85, num_iterations=result.steps_run)
    assert np.allclose(got, want, atol=1e-6)
    # mass conservation: dangling redistribution keeps sum(pr) == 1
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_two_cliques_with_isolated(spark, config):
    edges, n = edges_two_cliques(5, n_isolated=3)
    g = graph_from_numpy(spark, edges, n)
    result = pagerank(g, config, num_iterations=10)
    got = _pr_array(result, n)
    want = oracle_pagerank(edges, n, num_iterations=result.steps_run)
    assert np.allclose(got, want, atol=1e-6)


def test_pagerank_ring_analytic(spark, config):
    """On a ring every vertex has pr exactly 1/n at every iteration."""
    n = 40
    g = graph_from_numpy(spark, edges_ring(n), n)
    result = pagerank(g, config, num_iterations=5)
    got = _pr_array(result, n)
    assert np.allclose(got, np.full(n, 1.0 / n), atol=1e-12)


def test_pagerank_early_stop(spark):
    cfg = EngineConfig(num_partitions=8, tolerance=1e-3)
    n = 40
    g = graph_from_numpy(spark, edges_ring(n), n)
    result = pagerank(g, cfg, num_iterations=30)
    assert result.converged
    assert result.steps_run < 30


def test_pagerank_warmstart_converges_in_one_step(spark):
    """Warm-starting from a converged state must re-reach the fixpoint
    immediately (the nightly-maintenance story), and warm-start on the
    same graph is exact step-continuation."""
    import numpy as np
    from planar_spark.ingest.pages import edges_powerlaw
    from tests.conftest import graph_from_numpy

    edges = edges_powerlaw(300, m=3, seed=21)
    g = graph_from_numpy(spark, edges, 300)
    cfg = EngineConfig(num_partitions=8, tolerance=1e-12)
    cold = pagerank(g, cfg, num_iterations=60)
    assert cold.converged
    warm = pagerank(
        g, cfg, num_iterations=60,
        init_ranks=cold.state.select("vid", "pr"),
    )
    assert warm.converged and warm.steps_run == 1
    assert warm.steps_run < cold.steps_run
    # step-continuation: 2 cold + 3 warm == 5 cold, bit-identical
    cfg0 = EngineConfig(num_partitions=8, tolerance=0.0)
    head = pagerank(g, cfg0, num_iterations=2)
    cont = pagerank(
        g, cfg0, num_iterations=3,
        init_ranks=head.state.select("vid", "pr"),
    )
    five = pagerank(g, cfg0, num_iterations=5)
    a = sorted((r["vid"], r["pr"]) for r in cont.state.collect())
    b = sorted((r["vid"], r["pr"]) for r in five.state.collect())
    assert a == b
