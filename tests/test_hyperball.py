from __future__ import annotations

import numpy as np
import pytest

from planar_spark.ingest.pages import edges_powerlaw, edges_ring
from planar_spark.kernels.hyperball import (
    hyperball,
    neighborhood_function_exact,
)
from tests.conftest import graph_from_numpy


def python_nf(edges: np.ndarray, n: int, r: int) -> dict[int, int]:
    adj: list[set[int]] = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[int(s)].add(int(d))
    out = {}
    for v in range(n):
        ball = {v}
        frontier = {v}
        for _ in range(r):
            frontier = {w for u in frontier for w in adj[u]} - ball
            if not frontier:
                break
            ball |= frontier
        out[v] = len(ball)
    return out


@pytest.mark.parametrize(
    "name,edges,n,r",
    [
        ("ring", edges_ring(20), 20, 4),
        ("powerlaw", edges_powerlaw(120, m=2, seed=7), 120, 3),
    ],
    ids=["ring", "powerlaw"],
)
def test_exact_neighborhood_function(spark, config, name, edges, n, r):
    g = graph_from_numpy(spark, edges, n)
    got = {
        row["vid"]: row["nf"]
        for row in neighborhood_function_exact(g, r, config).collect()
    }
    assert got == python_nf(edges, n, r)


def test_hyperball_within_hll_error(spark, config):
    n, r = 150, 4
    edges = edges_powerlaw(n, m=3, seed=17)
    g = graph_from_numpy(spark, edges, n)
    want = python_nf(edges, n, r)
    est = {
        row["vid"]: row["nf_est"]
        for row in hyperball(g, r, config).collect()
    }
    # HLL at lgK=12 is near-exact at these cardinalities; allow 5%
    for v, exact in want.items():
        assert est[v] == pytest.approx(exact, rel=0.05)
