"""Betweenness centrality vs an exact pure-python Brandes oracle."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np

from planar_spark.ingest.pages import edges_powerlaw
from planar_spark.kernels.betweenness import betweenness, top_degree_sources

from tests.conftest import graph_from_numpy


def brandes_oracle(edges, n, sources):
    """Exact Brandes dependency accumulation (directed, unweighted),
    restricted to ``sources``; returns UNSCALED per-vertex sums."""
    adj = defaultdict(list)
    for a, b in edges:
        if a != b and b not in adj[a]:
            adj[a].append(b)
    bc = [0.0] * n
    for s in sources:
        sigma = [0.0] * n
        dist = [-1] * n
        preds = defaultdict(list)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = [0.0] * n
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def _check(spark, edges, n, sources):
    g = graph_from_numpy(spark, np.array(edges), n)
    got = {
        int(r["vid"]): float(r["bc"])
        for r in betweenness(
            g, sources=sources, estimate=False
        ).collect()
    }
    want = brandes_oracle(edges, n, sources)
    assert set(got) == set(range(n))
    for v in range(n):
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_betweenness_exact_path_graph(spark):
    # 0->1->2->3->4: interior vertices carry all the paths
    edges = [(i, i + 1) for i in range(4)]
    _check(spark, edges, 5, sources=list(range(5)))


def test_betweenness_exact_diamond_split_paths(spark):
    # two shortest 0->3 paths (via 1 and via 2): sigma splitting matters
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    _check(spark, edges, 5, sources=list(range(5)))


def test_betweenness_exact_powerlaw_all_sources(spark):
    edges = [(int(a), int(b)) for a, b in edges_powerlaw(40, m=2, seed=9)]
    _check(spark, edges, 40, sources=list(range(40)))


def test_betweenness_subset_sources_matches_restricted_oracle(spark):
    edges = [(int(a), int(b)) for a, b in edges_powerlaw(50, m=2, seed=4)]
    g = graph_from_numpy(spark, np.array(edges), 50)
    srcs = top_degree_sources(g, 8)
    assert len(srcs) == 8 and len(set(srcs)) == 8
    metrics = {}
    got = {
        int(r["vid"]): float(r["bc"])
        for r in betweenness(
            g, sources=srcs, estimate=True, metrics_out=metrics
        ).collect()
    }
    want = brandes_oracle(edges, 50, srcs)
    scale = 50 / 8
    for v in range(50):
        assert abs(got[v] - want[v] * scale) < 1e-9
    assert metrics["num_sources"] == 8
    assert metrics["depth"] >= 1
    assert metrics["frontier_sizes"][0] == 8


def test_betweenness_disconnected_and_duplicate_edges(spark):
    # duplicate edges must not inflate sigma; isolated vertex gets 0
    edges = [(0, 1), (0, 1), (1, 2), (1, 2), (1, 2)]
    _check(spark, edges, 4, sources=[0, 1, 2, 3])


def _spearman(xs: list[float], ys: list[float]) -> float:
    """Spearman rank correlation with average ranks on ties."""
    import numpy as np

    def avg_ranks(v):
        v = np.asarray(v, dtype=float)
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v), dtype=float)
        i = 0
        while i < len(v):
            j = i
            while j + 1 < len(v) and v[order[j + 1]] == v[order[i]]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    rx -= rx.mean()
    ry -= ry.mean()
    denom = float(np.sqrt((rx * rx).sum() * (ry * ry).sum()))
    return float((rx * ry).sum() / denom) if denom else 0.0


def test_betweenness_uniform_estimator_quality(spark):
    """The k-source estimator with UNIFORM sources (the regime where
    the |V|/k scale is the unbiased Brandes-Pich estimate) must agree
    with exact betweenness on ranking: top-20 overlap and Spearman
    bounds at the pinned k — the pytest analogue of the bench's
    betweenness_est_* rows."""
    from planar_spark.kernels.betweenness import uniform_sources

    n = 300
    edges = [(int(a), int(b)) for a, b in edges_powerlaw(n, m=3, seed=17)]
    exact = brandes_oracle(edges, n, sources=list(range(n)))

    g = graph_from_numpy(spark, np.array(edges), n)
    srcs = uniform_sources(g, 64)
    assert len(set(srcs)) == 64  # deterministic distinct draw
    est_df = betweenness(g, sources=srcs, estimate=True)
    est_map = {int(r["vid"]): float(r["bc"]) for r in est_df.collect()}
    est = [est_map[v] for v in range(n)]

    top = 20
    top_exact = set(sorted(range(n), key=lambda v: (-exact[v], v))[:top])
    top_est = set(sorted(range(n), key=lambda v: (-est[v], v))[:top])
    overlap = len(top_exact & top_est) / top
    rho = _spearman(exact, est)
    # deterministic fixture + md5 sample -> measured 0.75 / 0.694 at
    # k=64 (21% of V); bounds leave margin for float-sum order only
    assert overlap >= 0.7, (overlap, sorted(top_exact), sorted(top_est))
    assert rho >= 0.65, rho
