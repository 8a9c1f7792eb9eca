"""MST (Boruvka), deterministic coloring, GNN forward vs oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from planar_spark.ingest.pages import (
    edges_powerlaw,
    edges_ring,
    edges_simple4,
    edges_star_hub,
    edges_two_cliques,
)
from planar_spark.kernels.coloring import greedy_coloring
from planar_spark.kernels.gnn import gnn_forward, seeded_features, seeded_weights
from planar_spark.kernels.mst import boruvka_msf
from planar_spark.oracle.numpy_oracle import (
    oracle_coloring,
    oracle_gnn_forward,
    oracle_msf,
)

from tests.conftest import graph_from_numpy

MST_CASES = [
    ("simple4", edges_simple4(), 4),
    ("ring", edges_ring(30), 30),
    ("two_cliques", *edges_two_cliques(5, n_isolated=2)),
    ("powerlaw", edges_powerlaw(120, m=2, seed=3), 120),
]


@pytest.mark.parametrize("name,edges,n", MST_CASES, ids=[c[0] for c in MST_CASES])
def test_boruvka_msf_exact(spark, config, name, edges, n):
    g = graph_from_numpy(spark, edges, n)
    got = {(r["a"], r["b"]) for r in boruvka_msf(g, config).collect()}
    want = oracle_msf(edges)
    assert got == want


COLOR_CASES = [
    ("simple4", edges_simple4(), 4),
    ("ring", edges_ring(20), 20),
    ("two_cliques", *edges_two_cliques(4, n_isolated=2)),
    ("star", edges_star_hub(30), 30),
]


@pytest.mark.parametrize(
    "name,edges,n", COLOR_CASES, ids=[c[0] for c in COLOR_CASES]
)
def test_coloring_exact_and_proper(spark, config, name, edges, n):
    g = graph_from_numpy(spark, edges, n)
    rows = {r["vid"]: r["color"] for r in greedy_coloring(g, config).collect()}
    got = np.array([rows[v] for v in range(n)])
    want = oracle_coloring(edges, n)
    assert (got == want).all()
    # properness independently of the oracle
    und = {(int(a), int(b)) for a, b in edges if a != b}
    for a, b in und:
        assert got[a] != got[b]


def test_gnn_forward_matches_oracle(spark, config):
    dim, layers, n = 8, 2, 60
    edges = edges_powerlaw(n, m=2, seed=5)
    g = graph_from_numpy(spark, edges, n)
    feats = seeded_features(n, dim, seed=7)
    fdf = spark.createDataFrame(
        [(int(v), [float(x) for x in feats[v]]) for v in range(n)],
        schema="vid long, vec array<double>",
    )
    out = gnn_forward(g, fdf, num_layers=layers, dim=dim, seed=42, config=config)
    rows = {r["vid"]: np.array(r["vec"]) for r in out.collect()}
    got = np.stack([rows[v] for v in range(n)])
    want = oracle_gnn_forward(edges, feats, seeded_weights(dim, layers, seed=42))
    assert np.allclose(got, want, atol=1e-9)
