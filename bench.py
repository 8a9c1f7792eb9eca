#!/usr/bin/env python
"""Headline benchmark: graph kernels on the sf0.1 derived link graph.

Prints ONE JSON line:
  {"metric": ..., "value": <median total sec>, "unit": "sec",
   "queries": {name: median sec}, "sf": ..., ...extras}

Input: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Methodology: the host's memory performance is bimodal (single runs on
the identical suite have been observed to swing 32.7-44.4s), so the
headline suite runs $SPARK_GRAFT_BENCH_RUNS times (default 5) and every
per-query number reported is the MEDIAN, with the (q1, q3) IQR carried
alongside so round-over-round deltas can be judged against the noise.

Two graph sizes:
- headline graph: lineitem folded into a 65536-vertex space — ~600k
  edges at sf0.1 (avg out-degree ~9, web-like), all six kernels,
  median-of-N.
- big graph: the same derivation expanded 16x into a 2^20-vertex space
  (~9.5M edges at sf0.1) so per-kernel timings dominate fixed overhead
  — PageRank + WCC plus the round-heavy kernels (msf/scc/coloring/
  kcore) and HyperBall sketch mode with an HLL error check, single run
  each, reported under "big_graph".

PageRank throughput is the BASELINE.md target metric: edges/sec =
num_edges * supersteps / seconds, plus supersteps/hour.

Data-pipeline extras run once each; a failing extra records its error
string instead of silently vanishing from the output.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from planar_spark import EngineConfig, get_spark
from planar_spark.graph.tables import GraphTables
from planar_spark.kernels import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from planar_spark.kernels.neighborhood import two_hop_stats
from planar_spark.kernels.sssp import bfs_sssp

BENCH_V_MOD = 65536
BIG_V_MOD = 1 << 20
BIG_EXPAND = 16
PR_ITERS = 5
LPA_ROUNDS = 3


def bench_graph(spark, sf_dir: str, parts: int) -> GraphTables:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        li.select(
            (
                (F.col("l_orderkey") * 2654435761 + F.col("l_linenumber"))
                % BENCH_V_MOD
            ).alias("src"),
            ((F.col("l_partkey") * 40503 + F.col("l_suppkey")) % BENCH_V_MOD).alias(
                "dst"
            ),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return GraphTables.from_edges(e, num_partitions=parts)


def big_bench_graph(spark, sf_dir: str, parts: int) -> GraphTables:
    """~16x the headline edge count in a 2^20-vertex space: the same
    lineitem derivation replicated under BIG_EXPAND salt mixes (still
    deterministic) — big enough that per-superstep work dominates the
    fixed per-job overhead."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        li.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .withColumn(
            "s", F.explode(F.sequence(F.lit(0), F.lit(BIG_EXPAND - 1)))
        )
        .select(
            (
                (
                    F.col("l_orderkey") * 2654435761
                    + F.col("l_linenumber") * 97
                    + F.col("s") * 1299721
                )
                % BIG_V_MOD
            ).alias("src"),
            (
                (
                    F.col("l_partkey") * 40503
                    + F.col("l_suppkey") * 131
                    + F.col("s") * 15485863
                )
                % BIG_V_MOD
            ).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return GraphTables.from_edges(e, num_partitions=parts)


def mem_probe() -> float:
    """Host-mode fingerprint: this host's memory performance is bimodal
    run-to-run (documented in BASELINE.md), so every suite run records
    the wall time of a fixed ~256 MB streaming pass. The probe time
    classifies which memory mode the run landed in, letting
    round-over-round deltas be compared like-with-like instead of
    reading a mode flip as a regression."""
    import numpy as np

    a = np.ones(1 << 25, dtype=np.int64)  # 256 MB
    t0 = time.time()
    s = 0
    for _ in range(3):
        s += int((a + 1).sum())  # stream read+write+reduce
    assert s > 0
    return round(time.time() - t0, 3)


def run_suite(g: GraphTables, cfg: EngineConfig) -> tuple[dict, int]:
    """One pass over the six headline kernels -> ({name: sec}, pr_steps)."""
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    pr = timed("pagerank", lambda: pagerank(g, cfg, num_iterations=PR_ITERS))
    timed("wcc", lambda: connected_components(g, cfg, two_hop_init=True))
    timed("lpa", lambda: label_propagation(g, cfg, num_iterations=LPA_ROUNDS))
    timed("triangle_count", lambda: triangle_count(g, cfg))
    timed(
        "sssp",
        lambda: bfs_sssp(
            g, int(g.vertices.agg(F.min("vid")).collect()[0][0]), cfg
        ),
    )
    timed("two_hop_stats", lambda: two_hop_stats(g).count())
    return timings, pr.steps_run


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    parts = max(cpus, 8)
    spark = get_spark("planar_spark_bench", cores=cpus, shuffle_partitions=parts)
    cfg = EngineConfig(num_partitions=parts, tolerance=0.0, checkpoint_dir=None)

    g = bench_graph(spark, sf_dir, parts)  # from_edges counts = warm-up

    all_runs: list[dict[str, float]] = []
    probes: list[float] = []
    pr_steps = PR_ITERS
    for _ in range(max(1, n_runs)):
        probes.append(mem_probe())
        t, pr_steps = run_suite(g, cfg)
        all_runs.append(t)
    # mode tag per run: >30% above the fastest probe = the slow mode
    p_min = min(probes)
    modes = ["slow" if p > 1.3 * p_min else "fast" for p in probes]

    names = list(all_runs[0])
    med = {
        n: round(statistics.median(r[n] for r in all_runs), 3) for n in names
    }
    iqr = {}
    for n in names:
        xs = sorted(r[n] for r in all_runs)
        qs = statistics.quantiles(xs, n=4) if len(xs) >= 2 else [xs[0]] * 3
        iqr[n] = [round(qs[0], 3), round(qs[2], 3)]

    # Data-pipeline + round-3 kernel extras: one run each; a failure is
    # recorded as its error string, never silently dropped.
    extras: dict[str, object] = {}
    extras["probe_sec"] = mem_probe()

    def timed_extra(name, fn):
        t0 = time.time()
        try:
            fn()
            extras[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — bench must keep going
            extras[name] = f"error: {type(e).__name__}: {e}"

    from planar_spark.kernels.coloring import greedy_coloring
    from planar_spark.kernels.kcore import k_core
    from planar_spark.kernels.mst import boruvka_msf
    from planar_spark.kernels.textops import (
        embedding_ann_topk,
        lsh_candidate_pairs,
        near_dup_clusters,
    )

    from planar_spark.kernels.hits import hits
    from planar_spark.kernels.ppr import personalized_pagerank
    from planar_spark.kernels.scc import strongly_connected_components

    timed_extra("msf", lambda: boruvka_msf(g, cfg).count())
    timed_extra("kcore", lambda: k_core(g, k=8, config=cfg).count())
    from planar_spark.kernels.kcore import core_decomposition

    cd_m: dict = {}
    timed_extra(
        "core_decomposition",
        lambda: core_decomposition(g, cfg, metrics_out=cd_m).count(),
    )
    extras["core_decomposition_max_core"] = cd_m.get("max_core")
    timed_extra("coloring", lambda: greedy_coloring(g, cfg).count())
    timed_extra("scc", lambda: strongly_connected_components(g, cfg).count())
    timed_extra("hits", lambda: hits(g, cfg, num_iterations=4).state.count())
    timed_extra(
        "ppr",
        lambda: personalized_pagerank(
            g,
            g.vertices.select(F.col("vid")).where(F.col("vid") % 97 == 0),
            cfg,
            num_iterations=PR_ITERS,
        ).state.count(),
    )

    # incremental-WCC delta merge: old labels prepared OUTSIDE the
    # timer — the extra measures the delta-sized update alone, the
    # number that matters for nightly link-graph maintenance
    from planar_spark.kernels.components import incremental_wcc

    old_e = g.edges.where((F.col("src") + F.col("dst")) % 10 != 0)
    new_e = g.edges.where((F.col("src") + F.col("dst")) % 10 == 0)
    g_old = GraphTables.from_edges(old_e, parts, vertices=g.vertices)
    old_labels = connected_components(
        g_old, cfg, two_hop_init=True
    ).state.persist()
    old_labels.count()
    timed_extra(
        "wcc_incremental_delta",
        lambda: incremental_wcc(old_labels, new_e, cfg).count(),
    )
    old_labels.unpersist()
    g_old.unpersist()

    # round-4 kernels on the headline graph, one run each
    from planar_spark.kernels.hyperball import effective_diameter
    from planar_spark.kernels.sssp import weighted_sssp
    from planar_spark.kernels.truss import k_truss

    timed_extra("ktruss", lambda: k_truss(g, k=4, config=cfg).count())
    # the materialized-triangle delta-peeling variant, same k — the
    # side-by-side number that decides which form the scale plan uses
    # (big-graph ktruss measures 1 peel round on this derivation, so
    # the recompute form's per-round re-enumeration is NOT the
    # dominant cost there; this row keeps the comparison honest)
    timed_extra(
        "ktruss_delta",
        lambda: k_truss(g, k=4, config=cfg, delta=True).count(),
    )
    # ...and the same head-to-head on a DEEP cascade (geometric-
    # gradient fixture peels ~19 rounds at k=8) — the regime the delta
    # form exists for. Together with the two shallow web-shape rows
    # above this encodes the measured crossover in every bench run:
    # recompute wins shallow peels, delta wins deep ones.
    import pandas as pd

    from planar_spark.ingest.pages import edges_geometric_gradient

    casc_pdf = pd.DataFrame(
        edges_geometric_gradient(), columns=["src", "dst"]
    )
    gc = GraphTables.from_edges(spark.createDataFrame(casc_pdf), parts)
    extras["ktruss_cascade_edges"] = gc.num_edges
    extras["ktruss_cascade_probe_sec"] = mem_probe()
    kt_cm: dict = {}
    timed_extra(
        "ktruss_cascade",
        lambda: k_truss(
            gc, k=8, config=cfg, max_rounds=300, metrics_out=kt_cm
        ).count(),
    )
    extras["ktruss_cascade_rounds"] = kt_cm.get("rounds")
    timed_extra(
        "ktruss_cascade_delta",
        lambda: k_truss(
            gc, k=8, config=cfg, max_rounds=300, delta=True
        ).count(),
    )
    gc.unpersist()
    from planar_spark.kernels.truss import truss_decomposition

    td_m: dict = {}
    timed_extra(
        "truss_decomposition",
        lambda: truss_decomposition(g, cfg, metrics_out=td_m).count(),
    )
    extras["truss_decomposition_max_truss"] = td_m.get("max_truss")
    from planar_spark.kernels.densest import densest_subgraph

    ds_m: dict = {}
    timed_extra(
        "densest_subgraph",
        lambda: densest_subgraph(g, cfg, metrics_out=ds_m).count(),
    )
    extras["densest_subgraph_density"] = ds_m.get("best_density")
    from planar_spark.kernels.betweenness import betweenness

    bw_m: dict = {}
    timed_extra(
        "betweenness_16src",
        lambda: betweenness(
            g, num_sources=16, config=cfg, metrics_out=bw_m
        ).count(),
    )
    extras["betweenness_depth"] = bw_m.get("depth")

    # Estimator quantification (r7): exact Brandes (sources = ALL) vs
    # k-source estimates on a 2048-vertex fold of the same derivation —
    # top-100 overlap + Spearman rank correlation, the centrality
    # analogue of ann_recall_at_5. Uniform sources are the regime where
    # the |V|/k scale is the unbiased Brandes-Pich estimator; one
    # top-degree row quantifies how biased the hub-heuristic ranking is.
    try:
        import numpy as _np

        from planar_spark.kernels.betweenness import uniform_sources

        # fold to 2048 vids, then deterministically keep 1/8 of the
        # distinct pairs: the fold alone leaves avg degree ~290, which
        # makes the exact all-source forward join ~10^9 intermediate
        # rows/round — the sample keeps the row a bench line, not a run
        mid = (
            g.edges.select(
                (F.col("src") % 2048).alias("src"),
                (F.col("dst") % 2048).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .where(F.pmod(F.xxhash64("src", "dst"), F.lit(8)) == 0)
        )
        g_mid = GraphTables.from_edges(mid, parts)
        extras["betweenness_mid_edges"] = g_mid.num_edges

        def bc_vec(df):
            m = {int(r["vid"]): float(r["bc"]) for r in df.collect()}
            return _np.array([m.get(v, 0.0) for v in range(2048)])

        def spearman(x, y):
            def ranks(v):
                order = _np.argsort(v, kind="mergesort")
                rk = _np.empty(len(v))
                i = 0
                while i < len(v):
                    j = i
                    while j + 1 < len(v) and v[order[j + 1]] == v[order[i]]:
                        j += 1
                    rk[order[i : j + 1]] = (i + j) / 2.0
                    i = j + 1
                return rk
            rx, ry = ranks(x), ranks(y)
            rx -= rx.mean(); ry -= ry.mean()
            den = float(_np.sqrt((rx * rx).sum() * (ry * ry).sum()))
            return round(float((rx * ry).sum() / den), 4) if den else 0.0

        def top_overlap(x, y, n=100):
            tx = set(_np.argsort(-x, kind="mergesort")[:n].tolist())
            ty = set(_np.argsort(-y, kind="mergesort")[:n].tolist())
            return round(len(tx & ty) / n, 3)

        all_src = [int(r["vid"]) for r in g_mid.vertices.select("vid").collect()]
        t0 = time.time()
        exact_bc = bc_vec(betweenness(g_mid, sources=all_src, estimate=False, config=cfg))
        extras["betweenness_exact2048_sec"] = round(time.time() - t0, 3)
        for kk in (8, 16, 64):
            t0 = time.time()
            est = bc_vec(
                betweenness(
                    g_mid, sources=uniform_sources(g_mid, kk),
                    estimate=True, config=cfg,
                )
            )
            extras[f"betweenness_est_k{kk}_sec"] = round(time.time() - t0, 3)
            extras[f"betweenness_est_k{kk}_top100"] = top_overlap(exact_bc, est)
            extras[f"betweenness_est_k{kk}_spearman"] = spearman(exact_bc, est)
        hub = bc_vec(
            betweenness(g_mid, num_sources=16, config=cfg)  # top-degree
        )
        extras["betweenness_hub_k16_top100"] = top_overlap(exact_bc, hub)
        extras["betweenness_hub_k16_spearman"] = spearman(exact_bc, hub)
        g_mid.unpersist()
        # The fold is quasi-random: its bc values are tightly clustered
        # (statistically near-indistinguishable vertices), so the fold
        # rows above are the estimator's NOISE FLOOR — random top-100
        # overlap on 2048 vertices is 0.049. The structured fixture
        # below (ring of 8 ER communities, bc concentrated on bridges
        # and well-connected members — the shape web graphs actually
        # have) is the regime the estimator exists for.
        import hashlib as _hl

        def _h2(u, v):
            return int(
                _hl.md5(f"{u}-{v}".encode()).hexdigest()[:8], 16
            )

        csize, ncl, pct = 64, 8, 15
        nring = csize * ncl
        redges = []
        for c in range(ncl):
            rbase = c * csize
            for a in range(csize):
                for b in range(a + 1, csize):
                    if _h2(rbase + a, rbase + b) % 100 < pct:
                        redges.append((rbase + a, rbase + b))
                        redges.append((rbase + b, rbase + a))
            u = rbase + _h2(c, 0) % csize
            v = ((c + 1) % ncl) * csize + _h2(c, 1) % csize
            redges.append((u, v))
            redges.append((v, u))
        g_ring = GraphTables.from_edges(
            spark.createDataFrame(redges, schema="src long, dst long"),
            parts,
        )

        def bc_vec_ring(df):
            m = {int(r["vid"]): float(r["bc"]) for r in df.collect()}
            return _np.array([m.get(v, 0.0) for v in range(nring)])

        t0 = time.time()
        ring_exact = bc_vec_ring(
            betweenness(
                g_ring, sources=list(range(nring)), estimate=False,
                config=cfg,
            )
        )
        extras["betweenness_ring_exact_sec"] = round(time.time() - t0, 3)
        for kk in (8, 16, 64):
            est = bc_vec_ring(
                betweenness(
                    g_ring, sources=uniform_sources(g_ring, kk),
                    estimate=True, config=cfg,
                )
            )
            extras[f"betweenness_ring_k{kk}_top50"] = top_overlap(
                ring_exact, est, n=50
            )
            extras[f"betweenness_ring_k{kk}_spearman"] = spearman(
                ring_exact, est
            )
        g_ring.unpersist()
    except Exception as e:  # noqa: BLE001 — bench must keep going
        extras["betweenness_est_error"] = f"{type(e).__name__}: {e}"
    # Louvain on the derived graph: wall-clock row only — the graph is
    # quasi-random (avg degree ~282) so modularity is structurally ~0
    # and the move phase would micro-churn to the cap; 16 move rounds
    # bounds the row (standard practice: Louvain inner phases are
    # capped in every production implementation).
    from planar_spark.kernels.louvain import louvain

    lv_m: dict = {}
    timed_extra(
        "louvain",
        lambda: louvain(
            g, cfg, max_move_rounds=16, max_levels=2, metrics_out=lv_m
        ).count(),
    )
    extras["louvain_levels"] = lv_m.get("levels")
    extras["louvain_modularity"] = round(lv_m.get("modularity") or 0.0, 4)
    extras["louvain_communities"] = lv_m.get("communities")
    src_min = int(g.vertices.agg(F.min("vid")).collect()[0][0])
    wdf = g.edges.select(
        "src", "dst", ((F.col("src") * 7 + F.col("dst") * 13) % 10 + 1).alias("w")
    )
    timed_extra(
        "sssp_weighted",
        lambda: weighted_sssp(g, src_min, cfg, weights=wdf).count(),
    )
    # radius 2: the exact pair sets behind the histogram grow ~9x per
    # hop on this graph (avg out-degree ~9); r=2 keeps the extra at
    # ~5M pairs. Deeper radii at scale are HyperBall's job, not the
    # exact mode's.
    timed_extra(
        "effective_diameter_r2",
        lambda: effective_diameter(g, 2, q=0.9, config=cfg).count(),
    )

    # Locality layout (T3/T4 via GraphTables.with_partitioning): the
    # one-time relabel cost, WCC on the block-pinned gather, and the
    # layout's gather fan-in (rows entering the groupBy(dst) shuffle)
    # vs the hash layout's — the measured locality win the partitioner
    # tests predict (graph/locality.py module doc).
    from planar_spark.graph.locality import (
        block_pinned_sym,
        gather_fanin_rows,
    )

    loc_state: dict = {}

    def build_layout():
        g_loc, _m = g.with_partitioning(
            "bfs_vertex_cut", num_partitions=parts
        )
        loc_state["g"] = g_loc

    timed_extra("wcc_locality_layout_build", build_layout)
    if "g" in loc_state:
        g_loc = loc_state["g"]
        timed_extra(
            "wcc_locality",
            lambda: connected_components(
                g_loc, cfg, two_hop_init=True
            ).state.count(),
        )
        # r7: pagerank (the BASELINE metric kernel) consumes the same
        # layout via salted_gather_join's block-pinned mode
        timed_extra(
            "pagerank_locality",
            lambda: pagerank(
                g_loc, cfg, num_iterations=PR_ITERS
            ).state.count(),
        )
        sym_h = g.symmetric_edges().repartition(parts, "src").persist()
        extras["wcc_gather_fanin_hash"] = gather_fanin_rows(sym_h)
        sym_h.unpersist()
        sym_l = block_pinned_sym(g_loc, parts).persist()
        extras["wcc_gather_fanin_bfs"] = gather_fanin_rows(sym_l)
        sym_l.unpersist()
        g_loc.unpersist()

    # Planted-locality fixture (r7, VERDICT finding #3): the headline
    # graph is quasi-random, so its fan-in rows read as "locality
    # barely helps" (4.3%) — the win only exists when the graph HAS
    # structure to recover. 128 128-cliques in a ring (16k vertices,
    # ~1.04M directed edges) is the planted case: measured during
    # fixture selection at 16 cores — fan-in 262k -> 92k (2.9x) and
    # pagerank 6.1s -> 3.9s at equal iterations (clique size must be
    # >= 2 blocks wide for whole cliques to pin; a 2048x32 variant
    # recovers almost nothing because the BFS crawl along the long
    # ring both costs 49s to build and splits the 32-wide cliques
    # across blocks).
    try:
        csize, ncl = 128, 128
        pa = spark.range(csize).select(F.col("id").alias("a"))
        pb = spark.range(csize).select(F.col("id").alias("b"))
        pairs = pa.crossJoin(pb).where(F.col("a") < F.col("b"))
        cl = spark.range(ncl).select(F.col("id").alias("c"))
        intra = cl.crossJoin(pairs).select(
            (F.col("c") * csize + F.col("a")).alias("src"),
            (F.col("c") * csize + F.col("b")).alias("dst"),
        )
        bridge = cl.select(
            (F.col("c") * csize).alias("src"),
            (((F.col("c") + 1) % ncl) * csize).alias("dst"),
        )
        g_rc = GraphTables.from_edges(intra.unionAll(bridge), parts)
        extras["ring_cliques_edges"] = g_rc.num_edges
        timed_extra(
            "ring_pagerank_hash",
            lambda: pagerank(g_rc, cfg, num_iterations=PR_ITERS).state.count(),
        )
        rc_state: dict = {}

        def build_rc_layout():
            g2, _m = g_rc.with_partitioning(
                "bfs_vertex_cut", num_partitions=parts
            )
            rc_state["g"] = g2

        timed_extra("ring_layout_build", build_rc_layout)
        if "g" in rc_state:
            g_rcl = rc_state["g"]
            timed_extra(
                "ring_pagerank_locality",
                lambda: pagerank(
                    g_rcl, cfg, num_iterations=PR_ITERS
                ).state.count(),
            )
            sym_h = g_rc.symmetric_edges().repartition(parts, "src").persist()
            extras["ring_gather_fanin_hash"] = gather_fanin_rows(sym_h)
            sym_h.unpersist()
            sym_l = block_pinned_sym(g_rcl, parts).persist()
            extras["ring_gather_fanin_bfs"] = gather_fanin_rows(sym_l)
            sym_l.unpersist()
            g_rcl.unpersist()
        g_rc.unpersist()
    except Exception as e:  # noqa: BLE001 — bench must keep going
        extras["ring_cliques_error"] = f"{type(e).__name__}: {e}"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed_extra("minhash_lsh_pairs", lambda: lsh_candidate_pairs(docs).count())
    timed_extra("near_dup_clusters", lambda: near_dup_clusters(docs).count())
    timed_extra("embedding_ann_topk", lambda: embedding_ann_topk(emb).count())

    # High-diameter WCC (r6): 16 scrambled 4096-cycles (65k vertices,
    # diameter 2048, label-adversarial ids). Hash-min rounds are
    # O(diameter) on this shape (kernels/components.py r6 honesty
    # note) — a capped-budget run documents the stall; the Boruvka
    # mode's O(log V) round guarantee is the scale path. On LOW-
    # diameter graphs boruvka-mode cost == msf_sec (identical loop),
    # so no separate low-diameter row.
    cyc_c, cyc_blocks, cyc_mult = 4096, 16, 1215  # mult coprime to 4096
    cyc = (
        spark.range(cyc_c * cyc_blocks)
        .select(
            (
                (F.col("id") % cyc_blocks) * cyc_c
                + (F.floor(F.col("id") / cyc_blocks) * cyc_mult) % cyc_c
            ).alias("src"),
            (
                (F.col("id") % cyc_blocks) * cyc_c
                + ((F.floor(F.col("id") / cyc_blocks) + 1) * cyc_mult) % cyc_c
            ).alias("dst"),
        )
    )
    g_hd = GraphTables.from_edges(cyc, num_partitions=parts)
    hm_res: dict = {}

    def run_hd_hashmin():
        r = connected_components(g_hd, cfg, max_iterations=15)
        hm_res["converged"] = r.converged
        hm_res["labels"] = r.state.select("label").distinct().count()

    timed_extra("wcc_highdiam_hashmin15", run_hd_hashmin)
    extras["wcc_highdiam_hashmin15_converged"] = hm_res.get("converged")
    extras["wcc_highdiam_hashmin15_labels"] = hm_res.get("labels")
    bv_res: dict = {}

    def run_hd_boruvka():
        r = connected_components(g_hd, cfg, algorithm="boruvka")
        bv_res["converged"] = r.converged
        bv_res["rounds"] = r.steps_run
        bv_res["labels"] = r.state.select("label").distinct().count()

    timed_extra("wcc_highdiam_boruvka", run_hd_boruvka)
    extras["wcc_highdiam_boruvka_rounds"] = bv_res.get("rounds")
    # exact truth: one label per cycle block
    extras["wcc_highdiam_boruvka_exact"] = (
        bv_res.get("converged") is True and bv_res.get("labels") == cyc_blocks
    )
    g_hd.unpersist()

    # Streaming WCC maintenance (r7): per-batch label-merge cost vs
    # delta size against a durable ~600k-edge label state — the number
    # that matters for nightly link-graph maintenance is that a batch
    # costs O(|delta| + touched components), NOT O(V), so per-batch
    # seconds should grow far slower than delta size.
    try:
        import shutil
        import tempfile

        from planar_spark.streaming.wcc_maintain import apply_edge_delta

        wm_dir = tempfile.mkdtemp(prefix="bench_wccm_")
        t0 = time.time()
        apply_edge_delta(spark, wm_dir, g.edges, cfg)
        extras["wcc_maintain_seed_sec"] = round(time.time() - t0, 3)
        for dk, mix in (("1k", 1000), ("10k", 10000), ("100k", 100000)):
            delta = spark.range(mix).select(
                ((F.col("id") * 48271 + 11) % BENCH_V_MOD).alias("src"),
                ((F.col("id") * 69621 + 7) % BENCH_V_MOD).alias("dst"),
            ).where(F.col("src") != F.col("dst"))
            t0 = time.time()
            apply_edge_delta(spark, wm_dir, delta, cfg)
            extras[f"wcc_maintain_delta{dk}_sec"] = round(time.time() - t0, 3)
        shutil.rmtree(wm_dir, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — bench must keep going
        extras["wcc_maintain_error"] = f"{type(e).__name__}: {e}"

    # Big-graph pass at ~16x the edges: PageRank + WCC plus the
    # ROUND-HEAVY kernels (msf/scc/coloring/kcore) whose real scale cost
    # is driver-round latency — measured here at a size where per-round
    # work dominates fixed job overhead. HyperBall sketch mode runs at
    # the same size to evidence the O(V·sketch) state claim with a
    # wall-clock number, and its r=1 estimates are checked against the
    # exact 1-hop ball (1 + distinct out-neighbors) for the HLL error
    # bound (~1.04/sqrt(2^lgK) ≈ 3.3% at lgK=10).

    def section_isolate():
        """Drop cached blocks + hint a full GC so a section's timings
        start from a clean block manager and heap, not the previous
        section's debt."""
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — isolation is best-effort
            pass

    big: dict[str, object] = {}
    try:
        section_isolate()
        big_probe = mem_probe()
        bg = big_bench_graph(spark, sf_dir, parts)
        t0 = time.time()
        bpr = pagerank(bg, cfg, num_iterations=PR_ITERS)
        big_pr_sec = round(time.time() - t0, 3)
        t0 = time.time()
        connected_components(bg, cfg, two_hop_init=True)
        big_wcc_sec = round(time.time() - t0, 3)
        big = {
            "probe_sec": big_probe,
            "num_vertices": bg.num_vertices,
            "num_edges": bg.num_edges,
            "pagerank_sec": big_pr_sec,
            "pagerank_supersteps": bpr.steps_run,
            "pagerank_edges_per_sec": round(
                bg.num_edges * bpr.steps_run / big_pr_sec
            ),
            "wcc_sec": big_wcc_sec,
        }

        def timed_big(name, fn):
            t0 = time.time()
            try:
                fn()
                big[name] = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001 — bench must keep going
                big[name] = f"error: {type(e).__name__}: {e}"

        from planar_spark.kernels.hyperball import hyperball
        from planar_spark.kernels.scc import (
            strongly_connected_components as scc_fn,
        )

        msf_m: dict = {}
        timed_big(
            "msf_sec",
            lambda: boruvka_msf(bg, cfg, metrics_out=msf_m).count(),
        )
        big["msf_rounds"] = msf_m.get("rounds")
        # k-source Brandes at the size where rounds (2x BFS depth) and
        # O(k*V) state are the costs that matter; k=8 keeps the row
        # comparable to the centrality gate's source budget
        bwb_m: dict = {}
        timed_big(
            "betweenness_8src_sec",
            lambda: betweenness(
                bg, num_sources=8, config=cfg, metrics_out=bwb_m
            ).count(),
        )
        big["betweenness_depth"] = bwb_m.get("depth")
        scc_m: dict = {}
        timed_big(
            "scc_sec", lambda: scc_fn(bg, cfg, metrics_out=scc_m).count()
        )
        big["scc_outer_rounds"] = scc_m.get("outer_rounds")
        col_m: dict = {}
        timed_big(
            "coloring_sec",
            lambda: greedy_coloring(bg, cfg, metrics_out=col_m).count(),
        )
        big["coloring_rounds"] = col_m.get("rounds")
        kc_m: dict = {}
        timed_big(
            "kcore_sec",
            lambda: k_core(bg, k=8, config=cfg, metrics_out=kc_m).count(),
        )
        big["kcore_rounds"] = kc_m.get("rounds")
        # k-truss at 9.6M edges: measures the documented full-triangle-
        # recompute-per-round trade beyond sf0.1 (VERDICT r4 #4) — the
        # rounds row shows whether cost is re-enumeration (few rounds,
        # high per-round sec) or cascade depth
        kt_m: dict = {}
        timed_big(
            "ktruss_sec",
            lambda: k_truss(bg, k=4, config=cfg, metrics_out=kt_m).count(),
        )
        big["ktruss_rounds"] = kt_m.get("rounds")

        timed_big(
            "hyperball_r2_sec",
            lambda: hyperball(bg, 2, cfg, lg_config_k=10).count(),
        )
        from planar_spark.kernels.hyperball import hyperball_centralities

        timed_big(
            "hyperball_centralities_r2_sec",
            lambda: hyperball_centralities(bg, 2, cfg, lg_config_k=10).count(),
        )
        # sketch-mode effective diameter at radius 4: the exact mode's
        # pair materialization is infeasible at this depth/scale; the
        # HyperBall profile rides Observations (no extra actions).
        # Runs at the global profile's lgK=8 default — the r5 "3× per
        # round" mystery was HLL densification at r>=3 (measured lgK=10
        # round secs [11, 13, 70, 100] vs flat ~3s at lgK=8, diameter
        # value identical to 1e-5; hyperball.py module doc) — and the
        # per-round secs ride along so the attribution stays measured.
        from planar_spark.kernels.hyperball import effective_diameter_approx

        ed_m: dict = {}
        timed_big(
            "eff_diameter_sketch_r4_sec",
            lambda: effective_diameter_approx(
                bg, 4, q=0.9, config=cfg, metrics_out=ed_m
            ).count(),
        )
        big["eff_diameter_sketch_round_secs"] = ed_m.get("round_secs")
        # node2vec training-corpus generation at scale: 4 biased walks
        # per start (~33k starts in the 2^20-vid space at mod 31)
        from planar_spark.kernels.neighborhood import node2vec_walk

        timed_big(
            "node2vec_corpus_sec",
            lambda: node2vec_walk(
                bg, cfg, num_steps=4, start_mod=31, num_walks=4
            ).count(),
        )
        try:
            est = hyperball(bg, 1, cfg, lg_config_k=10)
            # exact 1-hop ball from the VERTEX table (left join) so
            # zero-out-degree sinks — where nf is exactly 1 — are part
            # of the error average, not silently excluded
            out_nbrs = (
                bg.edges.select("src", "dst")
                .distinct()
                .groupBy(F.col("src").alias("vid"))
                .agg(F.count(F.lit(1)).alias("n_out"))
            )
            exact = bg.vertices.select("vid").join(
                out_nbrs, "vid", "left"
            ).select(
                "vid", (F.coalesce("n_out", F.lit(0)) + 1).alias("nf")
            )
            err_row = (
                est.join(exact, "vid")
                .select(
                    (F.abs(F.col("nf_est") - F.col("nf")) / F.col("nf")).alias(
                        "e"
                    )
                )
                .agg(F.avg("e").alias("mean_rel_err"))
                .collect()[0]
            )
            mre = float(err_row["mean_rel_err"])
            big["hyperball_r1_mean_rel_err"] = round(mre, 5)
            big["hyperball_err_within_bound"] = mre < 0.08
            # sketch-mode centralities at r=1: harmonic_est should be
            # the out-degree (= exact nf - 1); same HLL bound applies
            cent = hyperball_centralities(bg, 1, cfg, lg_config_k=10)
            h_row = (
                cent.join(exact, "vid")
                .select(
                    (
                        F.abs(F.col("harmonic_est") - (F.col("nf") - 1))
                        / F.greatest(F.col("nf") - 1, F.lit(1))
                    ).alias("e")
                )
                .agg(F.avg("e").alias("mean_rel_err"))
                .collect()[0]
            )
            hre = float(h_row["mean_rel_err"])
            big["harmonic_sketch_r1_mean_rel_err"] = round(hre, 5)
            big["harmonic_sketch_err_within_bound"] = hre < 0.08
        except Exception as e:  # noqa: BLE001
            big["hyperball_r1_mean_rel_err"] = (
                f"error: {type(e).__name__}: {e}"
            )
        bg.unpersist()
    except Exception as e:  # noqa: BLE001
        big = {"error": f"{type(e).__name__}: {e}"}

    # The 1M-doc corpus pass is deliberately LAST: it churns ~10 GB
    # through the block manager and old-gen heap, and big-graph rows
    # measured after it in the same JVM pay its GC debt (r6: big
    # pagerank 19.1s after the corpus pass vs 7.3s in r4's
    # corpus-free bench, fast memory mode both times). Graph rows run
    # first; the corpus section cleans up with clearCache + an
    # explicit GC so its probe reflects the host, not the heap.
    # Corpus-scale pass: ~1M docs / ~200k vectors synthesized in Spark
    # from the sf tables (ingest/corpus.py — planted near-dup pairs +
    # a ~1000-doc boilerplate pile-up). Times the dedup stack
    # (minhash -> banded LSH -> Jaccard -> cluster fixpoint) and the
    # bucketed ANN (+ recall@5 vs the exact baseline on a sparse query
    # subset) at training-pipeline size; max_bucket=200 forces
    # _cap_buckets to sub-salt the boilerplate bucket, so the
    # quadratic-pile-up guard is exercised AT SCALE every bench run,
    # not just unit-tested.
    corpus: dict[str, object] = {}
    try:
        section_isolate()
        from planar_spark.ingest.corpus import (
            expand_documents,
            expand_embeddings,
        )
        from planar_spark.kernels.textops import embedding_topk

        corpus["probe_sec"] = mem_probe()
        # Second scale point (r7): the same end-to-end dedup at 100k
        # docs — 382s at 1M is only meaningful if the bucketed design
        # scales near-linearly; the 10x-input ratio in the same JVM and
        # memory mode is the evidence (corpus_scale_ratio in NOTES.md).
        t0 = time.time()
        small_docs = (
            expand_documents(docs, factor=20).repartition(parts).persist()
        )
        corpus["num_docs_100k"] = small_docs.count()
        corpus["gen_docs_100k_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        nd_s: dict = {}
        cl_s = near_dup_clusters(small_docs, max_bucket=200, metrics_out=nd_s)
        corpus["near_dup_merged_docs_100k"] = cl_s.where(
            F.col("canonical_id") != F.col("doc_id")
        ).count()
        corpus["near_dup_clusters_100k_sec"] = round(time.time() - t0, 3)
        small_docs.unpersist()
        t0 = time.time()
        big_docs = (
            expand_documents(docs, factor=200)
            .repartition(parts)
            .persist()
        )
        corpus["num_docs"] = big_docs.count()
        corpus["gen_docs_sec"] = round(time.time() - t0, 3)
        # end-to-end dedup (minhash -> banded LSH w/ sub-salted buckets
        # -> Jaccard -> cluster fixpoint); the candidate-pair and
        # dup-edge counts ride the pipeline's own materializations as
        # Observations, so the pair stage is not re-executed for a
        # standalone count
        t0 = time.time()
        nd_m: dict = {}
        cl = near_dup_clusters(big_docs, max_bucket=200, metrics_out=nd_m)
        corpus["near_dup_merged_docs"] = cl.where(
            F.col("canonical_id") != F.col("doc_id")
        ).count()
        corpus["near_dup_clusters_sec"] = round(time.time() - t0, 3)
        corpus["lsh_candidate_pairs"] = nd_m.get("candidate_pairs")
        corpus["dup_edges"] = nd_m.get("dup_edges")
        corpus["cluster_rounds"] = nd_m.get("rounds")
        if corpus.get("near_dup_clusters_100k_sec"):
            corpus["corpus_scale_ratio"] = round(
                corpus["near_dup_clusters_sec"]
                / corpus["near_dup_clusters_100k_sec"],
                2,
            )
        big_docs.unpersist()

        t0 = time.time()
        big_emb = (
            expand_embeddings(emb, factor=100).repartition(parts).persist()
        )
        corpus["num_vectors"] = big_emb.count()
        corpus["gen_vectors_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        ann = embedding_ann_topk(big_emb, query_mod=1000, k=5).persist()
        corpus["ann_results"] = ann.count()
        corpus["ann_topk_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        exact = embedding_topk(big_emb, query_mod=1000, k=5).persist()
        n_exact = exact.count()
        corpus["exact_topk_sec"] = round(time.time() - t0, 3)
        hits = ann.join(exact, ["q", "neighbor"], "left_semi").count()
        corpus["ann_recall_at_5"] = round(hits / max(1, n_exact), 4)
        ann.unpersist()
        # IVF variant (r6): the other named scale path — spherical
        # k-means coarse quantizer (sample-trained) + n_probe nearest
        # inverted lists per query; same recall@5 yardstick vs the same
        # exact baseline as the LSH row above.
        from planar_spark.kernels.embeddings import embedding_ivf_topk

        t0 = time.time()
        ivf = embedding_ivf_topk(
            big_emb, query_mod=1000, k=5, n_cells=64, n_probe=8,
            kmeans_iters=6, sample_mod=10,
        ).persist()
        corpus["ivf_results"] = ivf.count()
        corpus["ivf_topk_sec"] = round(time.time() - t0, 3)
        ivf_hits = ivf.join(exact, ["q", "neighbor"], "left_semi").count()
        corpus["ivf_recall_at_5"] = round(ivf_hits / max(1, n_exact), 4)
        ivf.unpersist()
        exact.unpersist()
        big_emb.unpersist()
        corpus["probe_sec_end"] = mem_probe()
    except Exception as e:  # noqa: BLE001 — bench must keep going
        corpus["error"] = f"{type(e).__name__}: {e}"

    total = round(sum(med.values()), 3)
    pr_sec = med["pagerank"]
    sf = sf_dir.rstrip("/").split("sf")[-1]
    headline = {
        "metric": "headline_graph_kernels_total",
        "value": total,
        "unit": "sec",
        "queries": med,
        "queries_iqr": iqr,
        "runs": len(all_runs),
        "run_probe_sec": probes,
        "run_modes": modes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_vertices": g.num_vertices,
        "num_edges": g.num_edges,
        "cores": cpus,
        "pagerank_supersteps": pr_steps,
        "pagerank_edges_per_sec": round(g.num_edges * pr_steps / pr_sec),
        "pagerank_supersteps_per_hour": round(3600.0 * pr_steps / pr_sec, 1),
    }
    # Output contract (r6 VERDICT finding #1): the driver keeps only the
    # last ~2,000 bytes of stdout and parses the FINAL line — one
    # monolithic JSON line outgrew that in r6 and the headline medians
    # were lost. So: full result to a file, sections as separate
    # labelled lines FIRST, and a compact headline-only object (< 1,500
    # bytes) as the very last stdout line.
    full = {**headline, "big_graph": big, "corpus": corpus, "extras": extras}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/last_full.json", "w") as f:
        json.dump(full, f, indent=1)
    for section, payload in (
        ("big_graph", big), ("corpus", corpus), ("extras", extras)
    ):
        print(json.dumps({"section": section, **payload}))
    line = json.dumps(headline)
    if len(line) > 1500:  # keep the driver-parsed line safely inside
        for k in ("run_probe_sec", "queries_iqr"):  # the capture window
            headline.pop(k, None)
            line = json.dumps(headline)
            if len(line) <= 1500:
                break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
