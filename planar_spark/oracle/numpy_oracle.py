"""Pure NumPy/Python oracles — the correctness ground truth for pytest.

No Spark, no external graph libraries: independent implementations of
each kernel's spec, so the DataFrame kernels are validated against a
second, structurally different computation (FIXTURES.md §4).
"""

from __future__ import annotations

import numpy as np


def _dedupe(edges: np.ndarray, drop_self_loops: bool = True) -> np.ndarray:
    if len(edges) == 0:
        return edges.reshape(0, 2).astype(np.int64)
    e = edges.astype(np.int64)
    if drop_self_loops:
        e = e[e[:, 0] != e[:, 1]]
    return np.unique(e, axis=0)


def oracle_pagerank(
    edges: np.ndarray,
    num_vertices: int,
    damping: float = 0.85,
    num_iterations: int = 20,
    tolerance: float = 0.0,
) -> np.ndarray:
    """Power iteration with dangling-mass redistribution.

    pr_{k+1}(v) = (1-d)/N + d*(sum_{u->v} pr_k(u)/outdeg(u) + dm_k/N).
    Multi-edges count multiply (outdeg = edge count), matching the
    engine, which uses the raw (self-loop-free) edge table.
    """
    n = num_vertices
    e = edges.astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    out_deg = np.bincount(e[:, 0], minlength=n).astype(np.float64)
    pr = np.full(n, 1.0 / n, dtype=np.float64)
    dangling = out_deg == 0
    for _ in range(num_iterations):
        w = np.zeros(n, dtype=np.float64)
        nz = ~dangling
        w[nz] = pr[nz] / out_deg[nz]
        contrib = np.bincount(e[:, 1], weights=w[e[:, 0]], minlength=n)
        dm = pr[dangling].sum()
        new_pr = (1.0 - damping) / n + damping * (contrib + dm / n)
        delta = np.abs(new_pr - pr).sum()
        pr = new_pr
        if tolerance > 0 and delta < tolerance:
            break
    return pr


def oracle_scc(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Kosaraju with iterative DFS; scc_id = min vid of the component."""
    n = num_vertices
    e = _dedupe(edges)
    adj: list[list[int]] = [[] for _ in range(n)]
    radj: list[list[int]] = [[] for _ in range(n)]
    for s, d in e:
        adj[int(s)].append(int(d))
        radj[int(d)].append(int(s))
    order: list[int] = []
    seen = np.zeros(n, dtype=bool)
    for v0 in range(n):
        if seen[v0]:
            continue
        stack = [(v0, 0)]
        seen[v0] = True
        while stack:
            v, i = stack.pop()
            if i < len(adj[v]):
                stack.append((v, i + 1))
                w = adj[v][i]
                if not seen[w]:
                    seen[w] = True
                    stack.append((w, 0))
            else:
                order.append(v)
    label = np.full(n, -1, dtype=np.int64)
    for v0 in reversed(order):
        if label[v0] >= 0:
            continue
        comp = [v0]
        label[v0] = v0
        stack = [v0]
        while stack:
            v = stack.pop()
            for w in radj[v]:
                if label[w] < 0:
                    label[w] = v0
                    comp.append(w)
                    stack.append(w)
        m = min(comp)
        for v in comp:
            label[v] = m
    return label


def oracle_ppr(
    edges: np.ndarray,
    num_vertices: int,
    seeds: list[int],
    damping: float = 0.85,
    num_iterations: int = 5,
) -> np.ndarray:
    """Personalized PageRank: seed-restart teleport, dangling mass to
    the seeds — mirrors kernels/ppr.py. Multi-edges count multiply."""
    n = num_vertices
    e = edges.astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    out_deg = np.bincount(e[:, 0], minlength=n).astype(np.float64)
    reset = np.zeros(n, dtype=np.float64)
    reset[np.asarray(sorted(set(seeds)), dtype=np.int64)] = 1.0 / len(set(seeds))
    pr = reset.copy()
    dangling = out_deg == 0
    for _ in range(num_iterations):
        w = np.zeros(n, dtype=np.float64)
        nz = ~dangling
        w[nz] = pr[nz] / out_deg[nz]
        contrib = np.bincount(e[:, 1], weights=w[e[:, 0]], minlength=n)
        dm = pr[dangling].sum()
        pr = (1.0 - damping) * reset + damping * (contrib + dm * reset)
    return pr


def oracle_hits(
    edges: np.ndarray, num_vertices: int, num_iterations: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Kleinberg HITS, L1-normalized each phase (input side), then a
    final L1 normalization of both vectors — mirrors kernels/hits.py.
    Multi-edges count multiply. Returns (hub, auth)."""
    n = num_vertices
    e = edges.astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(num_iterations):
        w = hub / hub.sum()
        auth = np.bincount(e[:, 1], weights=w[e[:, 0]], minlength=n)
        w = auth / auth.sum()
        hub = np.bincount(e[:, 0], weights=w[e[:, 1]], minlength=n)
    return hub / hub.sum(), auth / auth.sum()


def oracle_components(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Union-find; label[v] = min vid of v's undirected component."""
    parent = np.arange(num_vertices, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, d in _dedupe(edges):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            # union by min id keeps the invariant root == min of its tree
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    return np.array([find(v) for v in range(num_vertices)], dtype=np.int64)


def oracle_lpa(
    edges: np.ndarray, num_vertices: int, num_iterations: int
) -> np.ndarray:
    """Synchronous LPA, distinct undirected neighbors, min-label tie-break."""
    e = _dedupe(edges)
    und = _dedupe(np.concatenate([e, e[:, ::-1]])) if len(e) else e
    nbrs: list[list[int]] = [[] for _ in range(num_vertices)]
    for s, d in und:
        nbrs[int(s)].append(int(d))
    labels = np.arange(num_vertices, dtype=np.int64)
    for _ in range(num_iterations):
        new = labels.copy()
        for v in range(num_vertices):
            if not nbrs[v]:
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                lab = int(labels[u])
                counts[lab] = counts.get(lab, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def oracle_triangle_count(edges: np.ndarray) -> int:
    """Exact triangle count of the undirected simple graph."""
    und = _dedupe(edges)
    und = np.unique(np.sort(und, axis=1), axis=0)  # canonical a<b
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    count = 0
    edge_set = {(int(a), int(b)) for a, b in und}
    for a, b in edge_set:
        na, nb = adj[a], adj[b]
        small, large = (na, nb) if len(na) <= len(nb) else (nb, na)
        for c in small:
            if c > b and c in large:
                count += 1
    return count


def oracle_msf(edges: np.ndarray) -> set[tuple[int, int]]:
    """Kruskal on canonical (a, b) a<b edges with lexicographic (a, b)
    weights — the unique MSF under the engine's weight proxy."""
    und = np.unique(np.sort(_dedupe(edges), axis=1), axis=0)
    order = np.lexsort((und[:, 1], und[:, 0]))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out: set[tuple[int, int]] = set()
    for idx in order:
        a, b = int(und[idx, 0]), int(und[idx, 1])
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.add((a, b))
    return out


def oracle_msf_weighted(
    edges: np.ndarray, weight_fn
) -> set[tuple[int, int, int]]:
    """Kruskal under the strict total order (w, a, b) — any strict
    total order yields a unique MSF, so this matches the engine's
    weighted Boruvka even when raw weights tie. ``weight_fn(a, b)``
    gives the weight of canonical undirected edge a < b."""
    und = np.unique(np.sort(_dedupe(edges), axis=1), axis=0)
    rows = sorted(
        (int(weight_fn(int(a), int(b))), int(a), int(b)) for a, b in und
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out: set[tuple[int, int, int]] = set()
    for w, a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.add((a, b, w))
    return out


def oracle_coloring(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Round-exact simulation of the engine's deterministic Luby-style
    speculative coloring (kernels/coloring.py): per round every
    uncolored vertex proposes the smallest free color at-or-after a
    hashed palette offset t(v, r) = H(v, r) mod 2*(|used|+1); adjacent
    same-color proposers resolve by (prio, vid), lower retries."""
    und = np.unique(np.sort(_dedupe(edges), axis=1), axis=0)
    nbrs: list[set[int]] = [set() for _ in range(num_vertices)]
    for a, b in und:
        nbrs[int(a)].add(int(b))
        nbrs[int(b)].add(int(a))
    prio = lambda v: ((v * 2654435761) % 2**32, v)  # noqa: E731
    rh = lambda v, r: (((v * 2654435761) % 2**32 + r) * 40503) % 2**32  # noqa: E731
    color = np.full(num_vertices, -1, dtype=np.int64)
    todo = set(range(num_vertices))
    r = 0
    while todo:
        r += 1
        prop: dict[int, int] = {}
        for v in todo:
            used = {int(color[u]) for u in nbrs[v] if color[u] >= 0}
            c = rh(v, r) % (2 * (len(used) + 1))
            while c in used:
                c += 1
            prop[v] = c
        commit = [
            v
            for v in todo
            if all(
                not (u in prop and prop[u] == prop[v] and prio(u) > prio(v))
                for u in nbrs[v]
            )
        ]
        for v in commit:
            color[v] = prop[v]
        todo -= set(commit)
    return color


def oracle_gnn_forward(
    edges: np.ndarray,
    features: np.ndarray,
    weights: list[np.ndarray],
) -> np.ndarray:
    """k layers: h' = relu(W · mean(self + out-neighbors))."""
    n = features.shape[0]
    e = _dedupe(edges, drop_self_loops=True)
    h = features.astype(np.float64)
    out_deg = np.bincount(e[:, 0], minlength=n)
    for w in weights:
        s = h.copy()
        np.add.at(s, e[:, 0], h[e[:, 1]])
        mean = s / (out_deg + 1)[:, None]
        h = np.maximum(mean @ w.T, 0.0)
    return h


def oracle_sssp(
    edges: np.ndarray, num_vertices: int, source: int
) -> np.ndarray:
    """BFS levels along DIRECTED edges (unit weights, the reference's
    SSSP semantics: core/apps/sssp_app.cpp uses dist+1 relaxation).
    Unreached = -1."""
    from collections import deque

    adj: list[list[int]] = [[] for _ in range(num_vertices)]
    for s, d in _dedupe(edges):
        adj[int(s)].append(int(d))
    dist = np.full(num_vertices, -1, dtype=np.int64)
    dist[source] = 0
    q = deque([source])
    while q:
        v = q.popleft()
        for u in adj[v]:
            if dist[u] < 0:
                dist[u] = dist[v] + 1
                q.append(u)
    return dist
