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
