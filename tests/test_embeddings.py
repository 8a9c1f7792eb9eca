"""Spherical k-means + IVF ANN vs numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest

from planar_spark.kernels.embeddings import embedding_ivf_topk, kmeans_embeddings


def _planted(spark, n_per=50, n_clusters=4, dim=16, seed=3):
    """Well-separated unit clusters: direction e_i per cluster plus
    small deterministic noise — k-means must recover the planting."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        base = np.zeros(dim)
        base[c] = 1.0
        for i in range(n_per):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((c * n_per + i, [float(x) for x in v]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        rows,
    )


def test_kmeans_recovers_planted_clusters(spark):
    df, rows = _planted(spark)
    cents, assigned = kmeans_embeddings(df, k=4, iters=6)
    got = {r["vec_id"]: r["cid"] for r in assigned.collect()}
    # all members of a planted cluster land in ONE k-means cell
    for c in range(4):
        cids = {got[c * 50 + i] for i in range(50)}
        assert len(cids) == 1, f"cluster {c} split: {cids}"
    # and the 4 cells are distinct
    assert len({got[c * 50] for c in range(4)}) == 4
    # centroids are unit vectors aligned with the planted directions
    for cid, cv in cents:
        v = np.array(cv)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        assert v.max() > 0.9  # dominated by one coordinate


def test_kmeans_deterministic(spark):
    df, _ = _planted(spark)
    c1, a1 = kmeans_embeddings(df, k=4, iters=4)
    c2, a2 = kmeans_embeddings(df, k=4, iters=4)
    assert {r["vec_id"]: r["cid"] for r in a1.collect()} == {
        r["vec_id"]: r["cid"] for r in a2.collect()
    }
    for (i1, v1), (i2, v2) in zip(c1, c2):
        assert i1 == i2
        assert np.allclose(v1, v2, atol=1e-12)


def _exact_topk(rows, query_ids, k=5):
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    out = {}
    for q in query_ids:
        qi = int(np.where(ids == q)[0][0])
        sims = (mat @ mat[qi]) / (nrm * nrm[qi])
        order = sorted(
            [(round(float(s), 4), -int(i)) for i, s in zip(ids, sims) if i != q],
            reverse=True,
        )
        out[q] = {-i for _s, i in order[:k]}
    return out


def test_ivf_topk_recall_and_exact_when_probing_all(spark):
    df, rows = _planted(spark)
    qids = [r[0] for r in rows if r[0] % 40 == 0]

    # probing every cell must be EXACT (modulo equal-sim tie order)
    full = embedding_ivf_topk(
        df, query_mod=40, k=5, n_cells=4, n_probe=4, kmeans_iters=4
    )
    got = {}
    for r in full.collect():
        got.setdefault(r["q"], set()).add(r["neighbor"])
    want = _exact_topk(rows, qids)
    exact_hits = sum(len(got[q] & want[q]) for q in qids)
    assert exact_hits >= 5 * len(qids) - len(qids)  # ties may swap ranks

    # probing 1 of 4 well-separated cells still recalls the cluster
    narrow = embedding_ivf_topk(
        df, query_mod=40, k=5, n_cells=4, n_probe=1, kmeans_iters=4
    )
    got1 = {}
    for r in narrow.collect():
        got1.setdefault(r["q"], set()).add(r["neighbor"])
    recall = sum(len(got1[q] & want[q]) for q in qids) / (5 * len(qids))
    assert recall >= 0.9, recall
