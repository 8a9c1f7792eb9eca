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


def test_distance_histogram_ring(spark, config):
    from planar_spark.kernels.hyperball import distance_histogram

    # directed 10-ring: exactly 10 pairs at each distance 0..radius
    g = graph_from_numpy(spark, edges_ring(10), 10)
    got = {
        r["dist"]: r["n_pairs"]
        for r in distance_histogram(g, 4, config).collect()
    }
    assert got == {0: 10, 1: 10, 2: 10, 3: 10, 4: 10}
    # sanity vs the exact NF on a powerlaw graph: prefix sums agree
    n, r = 80, 3
    edges = edges_powerlaw(n, m=2, seed=9)
    g2 = graph_from_numpy(spark, edges, n)
    hist = {
        row["dist"]: row["n_pairs"]
        for row in distance_histogram(g2, r, config).collect()
    }
    nf = python_nf(edges, n, r)
    assert sum(hist.values()) == sum(nf.values())


def test_edge_sample_deterministic_and_monotone(spark):
    import hashlib

    from planar_spark.kernels.graphstats import sample_edges

    rows = [(i % 37, (i * 7) % 41) for i in range(300)]
    edges = spark.createDataFrame(rows, "src long, dst long")

    def bucket(s, d):
        h = hashlib.md5(f"e0{s}_{d}".encode()).hexdigest()[:8]
        return int(h, 16) % 100

    got20 = {(r["src"], r["dst"]) for r in sample_edges(edges, 20).collect()}
    want20 = {(s, d) for s, d in rows if bucket(s, d) < 20}
    assert got20 == want20
    got50 = {(r["src"], r["dst"]) for r in sample_edges(edges, 50).collect()}
    assert got20 <= got50


def test_hits_resume_equals_uninterrupted(spark, config, tmp_path):
    from planar_spark.config import EngineConfig
    from planar_spark.graph.superstep import SuperstepEngine
    from planar_spark.kernels.hits import hits

    edges = edges_powerlaw(100, m=2, seed=23)
    g = graph_from_numpy(spark, edges, 100)
    cfg = EngineConfig(
        num_partitions=8, tolerance=0.0, checkpoint_dir=str(tmp_path)
    )
    eng_a = SuperstepEngine(spark, cfg, "hits", run_id="hA")
    hits(g, cfg, num_iterations=1, engine=eng_a)  # 2 supersteps, "crash"
    eng_a2 = SuperstepEngine(spark, cfg, "hits", run_id="hA")
    resumed = hits(g, cfg, num_iterations=3, engine=eng_a2, resume=True)
    eng_b = SuperstepEngine(spark, cfg, "hits", run_id="hB")
    full = hits(g, cfg, num_iterations=3, engine=eng_b)
    rows = lambda r: sorted(  # noqa: E731
        (x["vid"], round(x["hub"], 12), round(x["auth"], 12))
        for x in r.state.collect()
    )
    assert rows(resumed) == rows(full)


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


def test_harmonic_centrality_ring_and_star(spark, config):
    from pyspark.sql import functions as F

    from planar_spark.kernels.hyperball import harmonic_centrality
    from planar_spark.ingest.pages import edges_ring, edges_star_hub
    from tests.conftest import graph_from_numpy

    # directed ring: every vertex sees exactly one vertex per distance
    g = graph_from_numpy(spark, edges_ring(10), 10)
    got = {r["vid"]: r["harmonic"] for r in
           harmonic_centrality(g, 3, config).collect()}
    want = round(1.0 / 1 + 1.0 / 2 + 1.0 / 3, 6)
    assert all(abs(v - want) < 1e-9 for v in got.values())

    # star out-edges 0->i: hub sees n-1 at distance 1, leaves see the
    # hub at 1 and every other leaf at 2 (star edges are bidirectional
    # in edges_star_hub? assert from actual edge set instead)
    n = 6
    g2 = graph_from_numpy(spark, edges_star_hub(n), n)
    got2 = {r["vid"]: r["harmonic"] for r in
            harmonic_centrality(g2, 2, config).collect()}
    e = {(int(a), int(b)) for a, b in edges_star_hub(n)}
    import itertools

    def dist(s, t):
        if (s, t) in e:
            return 1
        if any((s, m) in e and (m, t) in e for m in range(n)):
            return 2
        return None

    for v in range(n):
        want_v = sum(
            1.0 / d
            for t in range(n)
            if t != v and (d := dist(v, t)) is not None
        )
        assert abs(got2[v] - round(want_v, 6)) < 1e-9, (v, got2[v], want_v)


def test_hyperball_centralities_match_exact(spark, config):
    """Sketch-mode harmonic/closeness vs the exact kernels: at these
    cardinalities the Datasketches HLL is in sparse-exact range, so the
    per-radius deltas — and hence both centralities — should agree with
    the exact mode within a small relative tolerance (the bench asserts
    the large-scale error bound, mirroring hyperball's)."""
    from planar_spark.kernels.hyperball import (
        closeness_centrality,
        harmonic_centrality,
        hyperball_centralities,
    )

    n, r = 120, 3
    edges = edges_powerlaw(n, m=3, seed=31)
    g = graph_from_numpy(spark, edges, n)
    rows = hyperball_centralities(g, r, config).collect()
    est = {
        row["vid"]: (row["nf_est"], row["harmonic_est"], row["closeness_est"])
        for row in rows
    }
    ecc_est = {row["vid"]: row["ecc_est"] for row in rows}
    want_h = {
        row["vid"]: row["harmonic"]
        for row in harmonic_centrality(g, r, config).collect()
    }
    want_c = {
        row["vid"]: (row["reached"], row["closeness"])
        for row in closeness_centrality(g, r, config).collect()
    }
    assert set(est) == set(want_h)
    # exact truncated out-eccentricity min(ecc(v), r) by python BFS
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[int(a)].add(int(b))
    want_ecc = {}
    for v in range(n):
        seen, q, depth, ecc = {v}, deque([(v, 0)]), 0, 0
        while q:
            u, d = q.popleft()
            if d >= r:
                continue
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    ecc = max(ecc, d + 1)
                    q.append((w, d + 1))
        want_ecc[v] = ecc
    for v in est:
        nf_est, h_est, c_est = est[v]
        reached, closeness = want_c[v]
        assert nf_est == pytest.approx(reached, rel=0.05)
        assert h_est == pytest.approx(want_h[v], rel=0.05, abs=0.05)
        assert c_est == pytest.approx(closeness, rel=0.05, abs=0.02)
        # sparse-exact range: the sketch eccentricity is exact here
        assert ecc_est[v] == want_ecc[v], (v, ecc_est[v], want_ecc[v])


def test_hyperball_nf_profile_and_diameter_match_exact(spark, config):
    """Sketch-mode NF profile + effective diameter vs the exact
    kernels: at these cardinalities the HLL is sparse-exact, so the
    per-radius totals equal the exact prefix-sums and the interpolated
    diameters agree tightly."""
    from planar_spark.kernels.hyperball import (
        distance_histogram,
        effective_diameter,
        effective_diameter_approx,
        hyperball_nf_profile,
    )

    n, r = 100, 4
    edges = edges_powerlaw(n, m=3, seed=13)
    g = graph_from_numpy(spark, edges, n)
    hist = {
        row["dist"]: row["n_pairs"]
        for row in distance_histogram(g, r, config).collect()
    }
    cum, want = 0, {}
    for d in sorted(hist):
        cum += hist[d]
        want[d] = cum
    prof = {
        int(row["r"]): row["total_nf_est"]
        for row in hyperball_nf_profile(g, r, config).collect()
    }
    for d, exact_cum in want.items():
        assert prof[d] == pytest.approx(exact_cum, rel=0.03), d
    de = effective_diameter(g, r, q=0.9, config=config).collect()[0]
    da = effective_diameter_approx(g, r, q=0.9, config=config).collect()[0]
    assert da["eff_diameter"] == pytest.approx(
        de["eff_diameter"], abs=0.1
    )


def test_effective_diameter_empty_graph(spark, config):
    import numpy as np

    from planar_spark.kernels.hyperball import effective_diameter
    from tests.conftest import graph_from_numpy

    g = graph_from_numpy(spark, np.empty((0, 2), dtype=np.int64), 0)
    row = effective_diameter(g, 3, q=0.9, config=config).collect()
    assert len(row) == 1 and row[0]["eff_diameter"] == 0.0


def test_closeness_centrality_ring(spark, config):
    from planar_spark.kernels.hyperball import closeness_centrality
    from planar_spark.ingest.pages import edges_ring
    from tests.conftest import graph_from_numpy

    g = graph_from_numpy(spark, edges_ring(10), 10)
    got = {r["vid"]: (r["reached"], r["closeness"]) for r in
           closeness_centrality(g, 3, config).collect()}
    # every ring vertex reaches 3 others at distances 1+2+3=6
    assert all(v == (4, round(3 / 6, 6)) for v in got.values())

    # isolated vertices: reached=1, closeness 0.0 (guarded division)
    import numpy as np

    g2 = graph_from_numpy(spark, np.array([(0, 1)]), 4)
    got2 = {r["vid"]: (r["reached"], r["closeness"]) for r in
            closeness_centrality(g2, 3, config).collect()}
    assert got2[2] == (1, 0.0) and got2[3] == (1, 0.0)
    assert got2[0] == (2, 1.0)  # reaches 1 vertex at distance 1
