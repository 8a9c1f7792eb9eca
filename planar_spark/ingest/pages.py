"""Deterministic synthetic fixtures: graph families -> pages tables.

FIXTURES.md defines the graph families; this module generates (a) the raw
edge lists with numpy (seeded, deterministic) and (b) a Common-Crawl-style
``pages`` table whose anchors are exactly the graph's out-edges and whose
``text`` column follows the extraction spec in extract.py — so
ingest->extract->encode can be verified end-to-end, byte-identical.

The reference's fixture is testfile/simple.csv (8 directed edges on 4
vertices); ``simple4`` reproduces it verbatim.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

# ---------------------------------------------------------------- families

SIMPLE4_EDGES = [(0, 1), (0, 3), (1, 2), (1, 3), (2, 1), (2, 3), (3, 2), (3, 0)]


def edges_simple4() -> np.ndarray:
    """The reference's testfile/simple.csv, verbatim."""
    return np.array(SIMPLE4_EDGES, dtype=np.int64)


def edges_ring(n: int) -> np.ndarray:
    src = np.arange(n, dtype=np.int64)
    return np.stack([src, (src + 1) % n], axis=1)


def edges_star_hub(n: int) -> np.ndarray:
    """Hub 0 -> {1..n-1} and {1..n-1} -> 0: extreme degree skew."""
    spokes = np.arange(1, n, dtype=np.int64)
    out_e = np.stack([np.zeros(n - 1, dtype=np.int64), spokes], axis=1)
    in_e = np.stack([spokes, np.zeros(n - 1, dtype=np.int64)], axis=1)
    return np.concatenate([out_e, in_e])


def edges_two_cliques(k: int, n_isolated: int = 3) -> tuple[np.ndarray, int]:
    """Two disjoint directed k-cliques + isolated vertices.

    Returns (edges, num_vertices); isolated vertices have ids
    2k .. 2k+n_isolated-1 and appear only in the vertex set.
    """
    blocks = []
    for base in (0, k):
        ids = np.arange(base, base + k, dtype=np.int64)
        s, d = np.meshgrid(ids, ids, indexing="ij")
        m = s != d
        blocks.append(np.stack([s[m], d[m]], axis=1))
    return np.concatenate(blocks), 2 * k + n_isolated


def edges_dangling_chain(n: int) -> np.ndarray:
    src = np.arange(n - 1, dtype=np.int64)
    return np.stack([src, src + 1], axis=1)


def edges_powerlaw(n: int, m: int = 3, seed: int = 42) -> np.ndarray:
    """Deterministic preferential attachment: vertex t (t>=1) emits
    min(m, t) out-edges to targets sampled weighted by in-degree+1.

    Vectorized per-step-free approximation: sample targets from a
    growing pool that contains each vertex once plus one extra entry
    per received edge (the classic Barabasi-Albert pool trick), which
    keeps generation O(n*m) in numpy.
    """
    rng = np.random.default_rng(seed)
    pool = [0]
    src_list = []
    dst_list = []
    for t in range(1, n):
        k = min(m, t)
        idx = rng.integers(0, len(pool), size=k)
        targets = np.unique(np.asarray([pool[i] for i in idx], dtype=np.int64))
        for d in targets:
            src_list.append(t)
            dst_list.append(d)
            pool.append(int(d))
        pool.append(t)
    return np.stack(
        [np.asarray(src_list, dtype=np.int64), np.asarray(dst_list, dtype=np.int64)],
        axis=1,
    )


def edges_geometric_gradient(
    n: int = 20000, r0: float = 0.016, seed: int = 3
) -> np.ndarray:
    """Deterministic random geometric graph with a density gradient
    (points concentrated toward x=0 via a power warp), undirected-
    unique (a < b) edges. Its truss peel cascades DEEP — ~19 rounds at
    k=8 with long single-digit-frontier tails at the defaults — unlike
    web/power-law graphs whose peels finish in 1-2 rounds, so it is
    the fixture that exercises the many-round regime where the k-truss
    delta-peeling form wins (see kernels/truss.py module doc).
    Grid-binned neighbor search keeps generation O(n * avg_degree)."""
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 2)) ** np.array([[1.7, 1.0]])
    cell: dict[tuple[int, int], list[int]] = {}
    for i, (x, y) in enumerate(pts):
        cell.setdefault((int(x / r0), int(y / r0)), []).append(i)
    out = []
    for (cx, cy), ids in cell.items():
        cand: list[int] = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cand += cell.get((cx + dx, cy + dy), [])
        for i in ids:
            for j in cand:
                if i < j and np.sum((pts[i] - pts[j]) ** 2) <= r0 * r0:
                    out.append((i, j))
    return np.array(sorted(out), dtype=np.int64)


def with_self_loops(edges: np.ndarray, vids: list[int]) -> np.ndarray:
    loops = np.array([(v, v) for v in vids], dtype=np.int64)
    return np.concatenate([edges, loops])


# ---------------------------------------------------------------- pages

def url_of(vid: int, n_sites: int = 97) -> str:
    return f"https://site{vid % n_sites:03d}.example/page/{vid:08d}"


def _body_text(vid: int) -> str:
    return (
        f"Page {vid} hosted on site{vid % 97:03d}. "
        f"token{vid % 101} token{vid % 31} token{vid % 7}."
    )


def make_pages_pdf(
    edges: np.ndarray, num_vertices: int | None = None, n_sites: int = 97
) -> pd.DataFrame:
    """Build the pages table (url, warc_ts, html, text, lang) for a graph.

    Anchors of page(v) are exactly the out-edges of v, in (src, dst)
    sorted order; ``text`` follows the extraction spec byte-for-byte.
    """
    if num_vertices is None:
        num_vertices = int(edges.max()) + 1 if len(edges) else 0
    adj: dict[int, list[int]] = {}
    order = np.lexsort((edges[:, 1], edges[:, 0])) if len(edges) else []
    for i in order:
        s, d = int(edges[i, 0]), int(edges[i, 1])
        adj.setdefault(s, []).append(d)

    rows = []
    for vid in range(num_vertices):
        url = url_of(vid, n_sites)
        title = f"t{vid}"
        body = _body_text(vid)
        dsts = adj.get(vid, [])
        anchors = [(url_of(d, n_sites), f"l{j}") for j, d in enumerate(dsts)]
        html = (
            f"<html><head><title>{title}</title></head><body><p>{body}</p>"
            + "".join(f'<a href="{u}">{t}</a>' for u, t in anchors)
            + "</body></html>"
        )
        text = f"{title}\n{body}"
        if anchors:
            text += "\n" + " ".join(t for _, t in anchors)
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + _dt.timedelta(seconds=17 * vid),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "de" if vid % 50 == 49 else "en",
            }
        )
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


def make_pages_df(spark, edges: np.ndarray, num_vertices: int | None = None):
    """Spark DataFrame version of make_pages_pdf (fixture-scale only —
    production pages come from WARC ingest, not the driver)."""
    pdf = make_pages_pdf(edges, num_vertices)
    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return spark.createDataFrame(pdf, schema=schema)
