"""Louvain vs a round-exact pure-python replica + structure fixtures."""

from __future__ import annotations

import numpy as np

from planar_spark.ingest.pages import edges_two_cliques
from planar_spark.kernels.louvain import louvain

from tests.conftest import graph_from_numpy

_H_A = 2654435761
_H_B = 40503
_H_MOD = 1 << 32


def _py_louvain(edges, n, max_levels=4, max_move_rounds=64):
    """Pure-python replica of kernels/louvain.py — same gating hash,
    same gain formula, same tie-breaks, same termination."""
    # level graph: dict[(a,b)] = w with a <= b (a == b self-loops)
    cur: dict[tuple[int, int], float] = {}
    for s, d in edges:
        if s == d:
            continue
        a, b = (int(s), int(d)) if s < d else (int(d), int(s))
        cur[(a, b)] = 1.0  # distinct undirected edges, w=1
    assign = {v: v for v in range(n)}

    for _level in range(max_levels):
        nbrs: dict[int, dict[int, float]] = {}
        selfw: dict[int, float] = {}
        verts = set()
        for (a, b), w in cur.items():
            verts.add(a)
            verts.add(b)
            if a == b:
                selfw[a] = selfw.get(a, 0.0) + w
            else:
                nbrs.setdefault(a, {})[b] = nbrs.setdefault(a, {}).get(b, 0) + w
                nbrs.setdefault(b, {})[a] = nbrs.setdefault(b, {}).get(a, 0) + w
        deg = {
            v: sum(nbrs.get(v, {}).values()) + 2.0 * selfw.get(v, 0.0)
            for v in verts
        }
        m = sum(cur.values())
        if m <= 0:
            break
        comm = {v: v for v in verts}
        rounds, zero_streak = 0, 0
        while rounds < max_move_rounds and not (
            zero_streak >= 2 and rounds % 2 == 0
        ):
            rounds += 1
            tot: dict[int, float] = {}
            for v in verts:
                tot[comm[v]] = tot.get(comm[v], 0.0) + deg[v]
            moves = {}
            for v in sorted(verts):
                k_vc: dict[int, float] = {}
                for u, w in nbrs.get(v, {}).items():
                    k_vc[comm[u]] = k_vc.get(comm[u], 0.0) + w
                a = comm[v]
                k_own = k_vc.get(a, 0.0)
                best = None  # (dq, -c)
                for c, k in k_vc.items():
                    if c == a:
                        continue
                    dq = (k - k_own) / m - deg[v] * (
                        tot[c] - (tot[a] - deg[v])
                    ) / (2.0 * m * m)
                    key = (dq, -c)
                    if best is None or key > best:
                        best = key
                if best is not None and best[0] > 1e-12:
                    pair = (rounds + 1) // 2
                    hi = (v * _H_A + pair * _H_B) % _H_MOD >= 1 << 31
                    if hi if rounds % 2 == 1 else not hi:
                        moves[v] = -best[1]
            for v, c in moves.items():
                comm[v] = c
            zero_streak = zero_streak + 1 if not moves else 0
        assign = {ov: comm.get(cv, cv) for ov, cv in assign.items()}
        if not rounds > 2:
            break
        nxt: dict[tuple[int, int], float] = {}
        for (a, b), w in cur.items():
            ca, cb = comm[a], comm[b]
            key = (ca, cb) if ca <= cb else (cb, ca)
            nxt[key] = nxt.get(key, 0.0) + w
        cur = nxt
    return assign


def _modularity(edges, labels):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    m = len(und)
    deg: dict[int, float] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    intra = sum(1 for a, b in und if labels[a] == labels[b])
    tot: dict[int, float] = {}
    for v, d in deg.items():
        tot[labels[v]] = tot.get(labels[v], 0.0) + d
    return intra / m - sum(t * t for t in tot.values()) / (4.0 * m * m)


def test_louvain_matches_python_replica(spark, config):
    """Round-exact parity with the replica on a planted 3-community
    graph (cliques + sparse bridges)."""
    rng = np.random.default_rng(11)
    edges = []
    for c in range(3):
        base = c * 10
        for i in range(10):
            for j in range(i + 1, 10):
                if rng.random() < 0.8:
                    edges.append((base + i, base + j))
    edges += [(3, 13), (14, 24), (5, 25)]  # sparse bridges
    edges = np.array(sorted(set(edges)), dtype=np.int64)
    g = graph_from_numpy(spark, edges, 30)
    got = {
        r["vid"]: r["community"]
        for r in louvain(g, config).collect()
    }
    want = _py_louvain(edges, 30)
    assert got == want


def test_louvain_two_cliques_and_modularity(spark, config):
    edges, n = edges_two_cliques(8, n_isolated=0)
    g = graph_from_numpy(spark, edges, n)
    m_out: dict = {}
    got = {
        r["vid"]: r["community"]
        for r in louvain(g, config, metrics_out=m_out).collect()
    }
    # the two cliques are two communities
    assert len({got[v] for v in range(8)}) == 1
    assert len({got[v] for v in range(8, 16)}) == 1
    assert got[0] != got[8]
    assert m_out["communities"] == 2
    # kernel modularity matches the closed-form recompute and is high
    q = _modularity([tuple(e) for e in edges], got)
    assert abs(m_out["modularity"] - q) < 1e-9
    assert q > 0.3


def test_louvain_deterministic(spark, config):
    edges, n = edges_two_cliques(6, n_isolated=2)
    g = graph_from_numpy(spark, edges, n)
    r1 = {r["vid"]: r["community"] for r in louvain(g, config).collect()}
    r2 = {r["vid"]: r["community"] for r in louvain(g, config).collect()}
    assert r1 == r2
