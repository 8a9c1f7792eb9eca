"""k-truss: edge-cohesion peeling over the undirected simple graph.

Not in the reference's app set; the edge-level companion to k-core
(kernels/kcore.py) and a standard community/spam-farm hygiene kernel
for link graphs: the k-truss is the maximal subgraph in which every
edge participates in at least k-2 triangles WITHIN the subgraph, so it
keeps only tightly clustered link neighborhoods (a k-truss is always a
subgraph of the (k-1)-core, but strictly stronger).

Algorithm — synchronous support peeling to a fixpoint:

  round r: 1. enumerate triangles of the CURRENT edge set with the
              degree-oriented two-join from kernels/triangles.py
              (orientation bounds wedge work at O(E^1.5) even on
              power-law graphs — recomputed each round because degrees
              shrink as edges are deleted);
           2. per-edge support = triangles containing the edge
              (3 contribution rows per triangle, partial-agg'd);
           3. delete every edge with support < k-2; repeat until no
              edge is deleted. Deterministic (the k-truss is unique).

The per-round survivor count rides the state checkpoint as an
Observation (no standalone count actions); the loop fails loudly if
max_rounds is exhausted before the fixpoint, and checkpoints its edge
set durably through LoopCheckpointer every config.checkpoint_every
rounds (resume re-enters at the newest completed round).

Scale notes: each round's work is one oriented triangle join over the
SHRINKING edge set plus one partial-aggregated support count — the
same shuffle shapes as the gated triangle kernel, repeated a small
number of rounds (peeling cascades are shallow on web graphs; the
round count is reported via metrics_out and sized into the oracle
unroll).

``delta=True`` switches to the DELTA-PEELING variant: triangles and
initial supports are materialized ONCE, then each round only (1) finds
the triangles whose FIRST doomed edge is in this round's frontier
(broadcast semi-probes of the cached list against the frontier, anti-
probes against the cumulative doomed set), and (2) folds their edge
decrements into a broadcast cumulative-decrement table — rounds write
only frontier-sized tables, never the O(#tri)/O(E) bases (compacted
back into the bases past ``compact_rows`` so broadcasts stay bounded).

Measured crossover (bench ``ktruss_cascade*`` rows + a dedicated
3x-interleaved probe-tagged A/B on the 20-round geometric-gradient
fixture): the delta form won every interleaved pair on the DEEP
cascade but only by ~4% at the medians (52.9s vs 55.1s; single
mode-lucky runs have shown up to 1.4x, single mode-unlucky runs
parity-to-worse — the host's bimodal memory mode swamps the gap), and
it LOSES shallow web-shaped peels ~2.5-3x (sf0.1, 1-2 rounds: ≈15s vs
≈5s) where its one-time O(#triangles) localCheckpoint dominates.
Web/link graphs peel shallow and the deep-cascade edge is inside host
noise, so RECOMPUTE stays the default (and the durable form); the
flag exists for known-deep cascades where the frontier-sized rounds
also bound executor memory, not for a reliable single-box wall-clock
win. Both forms return the identical unique k-truss (pytest-asserted
equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.loopckpt import LoopCheckpointer
from planar_spark.graph.superstep import releaf
from planar_spark.graph.tables import GraphTables


def _edge_support(und: DataFrame) -> DataFrame:
    """(a, b, s): triangles per undirected edge (a < b) of ``und``.

    Degree-oriented enumeration (see kernels/triangles.py module doc);
    edges in no triangle are absent from the result. Catalyst fuses the
    triangle join and the contribution aggregate into one plan — the
    triangle list itself is never materialized on this path."""
    return _tri_edge_contribs(_triangles_of(und)).select(
        "a", "b", F.col("c_n").alias("s")
    )


def _triangles_of(und: DataFrame) -> DataFrame:
    """(x, y, z): each triangle of ``und`` once, degree-oriented."""
    udeg = (
        und.select(F.col("a").alias("vid"))
        .unionAll(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("udeg"))
    )
    da = udeg.select(F.col("vid").alias("a"), F.col("udeg").alias("deg_a"))
    db = udeg.select(F.col("vid").alias("b"), F.col("udeg").alias("deg_b"))
    e = und.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    e1 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    closing = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    return e1.join(e2, "y").join(closing, ["x", "z"]).select("x", "y", "z")


def _tri_edge_contribs(tri: DataFrame) -> DataFrame:
    """(a, b, c_n): per canonical undirected edge, how many triangles of
    ``tri`` contain it (3 contribution rows per triangle)."""
    return (
        tri.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .unionAll(
            tri.select(
                F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")
            )
        )
        .unionAll(
            tri.select(
                F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")
            )
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_n"))
    )


def _delta_ktruss(
    graph: GraphTables,
    k: int,
    config: EngineConfig,
    max_rounds: int,
    metrics_out: dict | None,
    compact_rows: int = 1_000_000,
) -> DataFrame:
    """Delta-peeling k-truss (see module doc): one triangle
    enumeration, then per-round support decrements only around deleted
    edges. Returns the identical unique k-truss as the recompute form.

    The triangle list AND the initial support table are materialized
    ONCE and never rewritten. A triangle is "killed in round r" iff it
    touches a round-r doomed edge and touches NO earlier-doomed edge,
    so each round probes the CACHED triangle list with broadcast-sized
    doomed sets (3 semi probes against the frontier + 3 anti probes
    against the cumulative doomed edges) — and current supports are
    s0 minus a broadcast cumulative-decrement table, so a round's only
    writes are frontier-sized: no O(#triangles) anti-join rewrite and
    no O(E) support-table re-checkpoint per round (both measured to
    dominate the earlier delta form's cost).

    The broadcast accumulators cannot grow unboundedly: once the
    cumulative doomed + decrement row count exceeds ``compact_rows``
    (driver-tracked via the Observations that already ride each
    materialization), they are folded back into freshly materialized
    es0/tri tables and reset — one amortized O(#triangles) rewrite per
    ``compact_rows`` peeled edges, keeping every per-round broadcast
    bounded at any graph size."""
    spark = graph.spark
    parts = config.partitions_for(spark)
    und = graph.undirected_edges().repartition(parts, "a")
    tri = releaf(_triangles_of(und).localCheckpoint(eager=True))
    obs0 = Observation()
    es0 = releaf(  # initial per-edge supports, immutable across rounds
        und.join(_tri_edge_contribs(tri), ["a", "b"], "left")
        .select("a", "b", F.coalesce("c_n", F.lit(0)).alias("s"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_alive = int(obs0.get["n"] or 0)
    doomed_acc = None  # cumulative doomed edges; bounded by |E| - kept
    cumdec = None  # (a, b, d): cumulative support decrements
    cum_doomed = 0  # rows in doomed_acc (exact, summed driver-side)
    rounds = 0
    compactions = 0
    survivors: list[int] = []

    def current():
        cur = es0
        if doomed_acc is not None:
            cur = cur.join(F.broadcast(doomed_acc), ["a", "b"], "left_anti")
        if cumdec is not None:
            cur = cur.join(F.broadcast(cumdec), ["a", "b"], "left").select(
                "a", "b",
                (F.col("s") - F.coalesce("d", F.lit(0))).alias("s"),
            )
        return cur

    for _ in range(max_rounds):
        obs_d = Observation()
        doomed = releaf(
            current().where(F.col("s") < k - 2)
            .select("a", "b")
            .observe(obs_d, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_doomed = int(obs_d.get["n"] or 0)
        if n_doomed == 0:
            if metrics_out is not None:
                metrics_out["rounds"] = rounds
                metrics_out["survivors_per_round"] = survivors
                metrics_out["compactions"] = compactions
            return current().select("a", "b")
        rounds += 1
        n_alive -= n_doomed
        survivors.append(n_alive)

        # triangles touching any doomed edge (a triangle with 2+ doomed
        # edges appears once — distinct corners). Corners are DEGREE-
        # oriented, so canonicalize each triangle edge with
        # least/greatest before probing the canonical doomed sets.
        def probe(t, d, x, y, how):
            dd = d.select(F.col("a").alias("_da"), F.col("b").alias("_db"))
            cond = (F.least(t[x], t[y]) == dd["_da"]) & (
                F.greatest(t[x], t[y]) == dd["_db"]
            )
            return t.join(F.broadcast(dd), cond, how)

        killed = (
            probe(tri, doomed, "x", "y", "left_semi")
            .unionAll(probe(tri, doomed, "y", "z", "left_semi"))
            .unionAll(probe(tri, doomed, "x", "z", "left_semi"))
            .distinct()
        )
        if doomed_acc is not None:
            # drop triangles already killed by an earlier round's edge
            for x, y in (("x", "y"), ("y", "z"), ("x", "z")):
                killed = probe(killed, doomed_acc, x, y, "left_anti")
        dec = _tri_edge_contribs(killed).select(
            "a", "b", F.col("c_n").alias("d")
        )
        obs_c = Observation()
        cumdec = releaf(
            (dec if cumdec is None else cumdec.unionAll(dec))
            .groupBy("a", "b")
            .agg(F.sum("d").alias("d"))
            .observe(obs_c, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        doomed_acc = releaf(
            (
                doomed if doomed_acc is None
                else doomed_acc.unionAll(doomed)
            ).localCheckpoint(eager=True)
        )
        cum_doomed += n_doomed  # doomed_acc rows (exact, driver-side)
        acc_rows = cum_doomed + int(obs_c.get["n"] or 0)  # + cumdec rows
        if acc_rows >= compact_rows:
            # fold the accumulators into fresh base tables so the
            # per-round broadcasts stay bounded (amortized: one
            # O(#triangles) rewrite per compact_rows peeled edges)
            es0 = releaf(current().localCheckpoint(eager=True))
            live_tri = tri
            for x, y in (("x", "y"), ("y", "z"), ("x", "z")):
                live_tri = probe(live_tri, doomed_acc, x, y, "left_anti")
            tri = releaf(live_tri.localCheckpoint(eager=True))
            doomed_acc = None
            cumdec = None
            cum_doomed = 0
            compactions += 1
    raise RuntimeError(
        f"k_truss(delta): peeling did not reach a fixpoint in {max_rounds} "
        "rounds; raise max_rounds"
    )


def truss_decomposition(
    graph: GraphTables,
    config: EngineConfig | None = None,
    max_rounds: int = 2000,
    metrics_out: dict | None = None,
    truncate_every: int = 8,
    run_id: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """(a, b, truss) for every undirected edge: the truss NUMBER — the
    largest k such that the edge survives in the k-truss (edges in no
    triangle get truss 2, the conventional floor). The edge-cohesion
    companion to kcore.core_decomposition; truss numbers rank link
    neighborhoods by community strength for spam-farm and template
    filtering.

    Ascending-k DELTA peeling over ONE materialized triangle list (the
    ``delta=True`` machinery): at level k, edges with support < k-2
    are removed (their truss number is k-1), the triangles they close
    are killed, and only the surviving edges of killed triangles get
    support decrements. When a level reaches its fixpoint, k advances —
    a free driver branch. Total decrement work across ALL levels is
    O(#triangles); the O(#triangles) list held across rounds is the
    documented memory trade of the delta form. Deterministic.

    Assignments accumulate on ONE running (a, b, truss) table whose
    lineage (and the per-round doomed-edge leaves it references) is
    cut every ``truncate_every`` rounds — no leaf pinned per round.

    Durable resume: with ``config.checkpoint_dir`` set, the full loop
    state — surviving edges with supports (es), the remaining triangle
    list (tri), the running assignments AND the driver counters — is
    written through LoopCheckpointer every
    ``config.checkpoint_every``-th removal round; ``resume=True`` with
    the same ``run_id`` re-enters the ascending peel at the newest
    completed round (level advances between saves replay idempotently).
    """
    config = config or EngineConfig()
    spark = graph.spark
    parts = config.partitions_for(spark)
    ckpt = LoopCheckpointer(spark, config, "truss_decomp", run_id=run_id)

    es = tri = assigned = None
    k = 3
    rounds = 0
    n_alive = 0
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            _rnd, tables, m = latest
            es = releaf(
                tables["es"].repartition(parts, "a")
                .localCheckpoint(eager=True)
            )
            tri = releaf(tables["tri"].localCheckpoint(eager=True))
            assigned = releaf(
                tables["assigned"].localCheckpoint(eager=True)
            )
            k = int(m.get("k", 3))
            rounds = int(m.get("rounds", _rnd))
            n_alive = int(m.get("n_alive", 0))
    if es is None:
        und = graph.undirected_edges().repartition(parts, "a")
        tri = releaf(_triangles_of(und).localCheckpoint(eager=True))
        obs_n = Observation()
        es = releaf(
            und.join(_tri_edge_contribs(tri), ["a", "b"], "left")
            .select("a", "b", F.coalesce("c_n", F.lit(0)).alias("s"))
            .observe(obs_n, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_alive = int(obs_n.get["n"] or 0)
        assigned = spark.createDataFrame(
            [], schema="a long, b long, truss long"
        )
    for _ in range(max_rounds):
        if n_alive == 0:
            break
        obs_d = Observation()
        doomed = releaf(
            es.where(F.col("s") < k - 2)
            .select("a", "b")
            .observe(obs_d, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_doomed = int(obs_d.get["n"] or 0)
        if n_doomed == 0:
            k += 1  # level fixpoint: every remaining edge is k-truss
            continue
        rounds += 1
        assigned = assigned.unionAll(
            doomed.select("a", "b", F.lit(k - 1).cast("long").alias("truss"))
        )

        def probe(x, y):
            d = doomed.select(
                F.col("a").alias("_da"), F.col("b").alias("_db")
            )
            cond = (F.least(tri[x], tri[y]) == d["_da"]) & (
                F.greatest(tri[x], tri[y]) == d["_db"]
            )
            return tri.join(d, cond, "left_semi")

        killed = (
            probe("x", "y")
            .unionAll(probe("y", "z"))
            .unionAll(probe("x", "z"))
            .distinct()
        )
        dec = _tri_edge_contribs(killed)
        obs_s = Observation()
        es = releaf(
            es.join(doomed, ["a", "b"], "left_anti")
            .join(dec, ["a", "b"], "left")
            .select(
                "a", "b",
                (F.col("s") - F.coalesce("c_n", F.lit(0))).alias("s"),
            )
            .observe(obs_s, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_alive = int(obs_s.get["n"] or 0)
        tri = releaf(
            tri.join(killed, ["x", "y", "z"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if rounds % max(1, truncate_every) == 0:
            # cut the assignment lineage: releases the union chain AND
            # the per-round doomed-edge leaves it references
            assigned = releaf(assigned.localCheckpoint(eager=True))
        if ckpt.due(rounds):
            saved = ckpt.save(
                rounds,
                {"es": es, "tri": tri, "assigned": assigned},
                {"rounds": rounds, "k": k, "n_alive": n_alive},
            )
            # root the loop at the durable copies (lineage truncation)
            es = releaf(saved["es"].localCheckpoint(eager=True))
            tri = releaf(saved["tri"].localCheckpoint(eager=True))
            assigned = saved["assigned"]
    else:
        raise RuntimeError(
            f"truss_decomposition: not finished in {max_rounds} rounds; "
            "raise max_rounds"
        )
    if metrics_out is not None:
        metrics_out["rounds"] = rounds
        metrics_out["max_truss"] = k - 1
    return assigned


def k_truss(
    graph: GraphTables,
    k: int,
    config: EngineConfig | None = None,
    max_rounds: int = 100,
    metrics_out: dict | None = None,
    run_id: str | None = None,
    resume: bool = False,
    delta: bool = False,
) -> DataFrame:
    """Returns the k-truss edge set (a, b) with a < b, exact and
    deterministic. ``metrics_out`` receives ``rounds`` and
    ``survivors_per_round`` (used to size the oracle unroll).
    ``delta=True`` uses the materialized-triangle delta-peeling variant
    (module doc; no LoopCheckpointer durability — the recompute form
    remains the durable default)."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3 (k-2 >= 1 triangles)")
    if delta:
        config = config or EngineConfig()
        return _delta_ktruss(graph, k, config, max_rounds, metrics_out)
    config = config or EngineConfig()
    spark = graph.spark
    parts = config.partitions_for(spark)

    rounds = 0
    survivors: list[int] = []
    ckpt = LoopCheckpointer(spark, config, "ktruss", run_id=run_id)
    und = None
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            _rnd, tables, m = latest
            und = releaf(
                tables["edges"].repartition(parts, "a").localCheckpoint(True)
            )
            rounds = int(m.get("rounds", _rnd))
            survivors = list(m.get("survivors_per_round", []))
            prev_n = survivors[-1] if survivors else None
    if und is None:
        obs0 = Observation()
        und = releaf(
            graph.undirected_edges()
            .repartition(parts, "a")
            .observe(obs0, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        prev_n = int(obs0.get["n"] or 0)

    converged = prev_n == 0
    for _ in range(rounds, max_rounds):
        if converged:
            break
        supp = _edge_support(und)
        obs = Observation()
        kept = releaf(
            und.join(supp, ["a", "b"], "left")
            .where(F.coalesce("s", F.lit(0)) >= k - 2)
            .select("a", "b")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_kept = int(obs.get["n"] or 0)
        rounds += 1
        survivors.append(n_kept)
        und = kept
        if n_kept == prev_n or n_kept == 0:
            converged = True
        prev_n = n_kept
        if ckpt.due(rounds):
            saved = ckpt.save(
                rounds,
                {"edges": und},
                {"rounds": rounds, "survivors_per_round": survivors},
            )
            und = saved["edges"]
    if not converged:
        raise RuntimeError(
            f"k_truss: peeling did not reach a fixpoint in {max_rounds} "
            "rounds; raise max_rounds"
        )
    if metrics_out is not None:
        metrics_out["rounds"] = rounds
        metrics_out["survivors_per_round"] = survivors
    return und
