"""Louvain community detection — deterministic synchronous variant.

Not a reference kernel (the reference's community surface stops at
LPA); added as the standard modularity-based community detector a
link-graph engine is expected to ship. Classic Louvain (Blondel 2008)
is sequential — vertices move one at a time. The distributed variant
here is the standard synchronous adaptation (as in Spark/GraphX
community implementations), made fully deterministic:

- MOVE rounds: every vertex computes the modularity gain of moving to
  each neighboring community (one edges⋈comm join + groupBy(v, c)),
  picks argmax gain with lowest-community-id tie-break, and moves iff
  gain > 0 — but gated: rounds come in pairs, each pair splits V by
  the HIGH bit of H(v, pair) and its two rounds gate the two classes
  in turn (_move_gate). Synchronous Louvain without gating oscillates
  (two adjacent vertices swap communities forever); hash gating is the
  deterministic analogue of Louvain's sequential visit order, and the
  per-pair-changing split breaks the swap cycles a FIXED split (or the
  degenerate (v+r)%2 parity, r6 ADVICE) would let lock in. A level's
  move phase ends on a quiet PAIR — two zero-move rounds covering
  complementary classes of the same split = fixpoint proof.
- CONTRACT: communities collapse to vertices, parallel edge weights
  sum, intra-community weight becomes a self-loop; the next level runs
  on the contracted graph. Levels stop when a level moves nothing.

Modularity bookkeeping (undirected, weighted):
  deg(v) = Σ_{u≠v} w(v,u) + 2·w_self(v);  m = Σ_e w(e) (self-loops once)
  tot_c  = Σ_{v∈c} deg(v);   k_{v,c} = Σ_{u∈c,u≠v} w(v,u)
  ΔQ(v: a→c) = (k_{v,c} − k_{v,a′})/m − deg(v)·(tot_c − tot_{a′})/(2m²)
  with a′ = a∖{v}, tot_{a′} = tot_a − deg(v).

Scale shape: per move round one edges⋈comm shuffle + a (v, c) partial
agg + V-sized joins — the same O(E) gather budget as a pagerank
superstep; the only driver-side scalars are m (once per level) and the
observed move/gain counters. Contraction shrinks E geometrically
across levels. State rides localCheckpoint leaves (releaf) like every
other loop kernel.

Tested round-exactly against the pure-python replica in
tests/test_louvain.py (same gating hash, same tie-breaks), plus
modularity-monotonicity and planted-structure fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.loopckpt import LoopCheckpointer
from planar_spark.graph.superstep import releaf
from planar_spark.graph.tables import GraphTables

_H_A = 2654435761  # Knuth multiplicative hash, same family as coloring
_H_B = 40503
_H_MOD = 1 << 32


def _move_gate(vid_col, rnd: int):
    """Deterministic move gate: paired complementary hash classes.

    Rounds come in pairs p = (r+1)//2. Within pair p the vertex set is
    split by the HIGH bit of H(v, p); the odd round gates the high-bit
    class ON, the even round its complement — so every pair covers all
    vertices exactly once, which keeps the two-quiet-rounds-in-a-pair
    fixpoint proof sound (see the loop's termination condition).

    The HIGH bit, not ``% 2``: both hash constants are odd, so the low
    bit degenerates to ``(v + p) % 2`` — adjacent vertices with the
    same vid parity would be gated ON together every round and could
    swap-oscillate for ~half of all edges (r6 ADVICE). The high bit
    mixes vid and pair properly, and because the split CHANGES every
    pair, two adjacent vertices land in the same class only with
    probability 1/2 per pair — a persistent A<->B swap cycle decays
    geometrically instead of locking in the way a fixed split would.
    """
    pair = (rnd + 1) // 2
    # Overflow-safe (vid * _H_A + pair * _H_B) mod 2^32 for ANY int64
    # vid (r7 ADVICE low): the direct product overflows int64 at
    # vid ≳ 3.47e9 — wrapping negative in non-ANSI mode (gate class
    # frozen for all such vertices) and raising under ANSI. 16-bit limb
    # decomposition of vid mod 2^32 keeps every intermediate < 2^49:
    # identical values to the direct product wherever it is exact
    # (all test/oracle vids), exact everywhere else.
    v32 = F.pmod(vid_col, F.lit(_H_MOD))
    h16 = F.shiftright(v32, 16)
    l16 = v32.bitwiseAND(F.lit(0xFFFF))
    prod = F.pmod(
        F.pmod(h16 * _H_A, F.lit(_H_MOD)) * F.lit(1 << 16) + l16 * _H_A,
        F.lit(_H_MOD),
    )
    hi = F.pmod(prod + F.lit(pair) * _H_B, F.lit(_H_MOD)) >= (1 << 31)
    return hi if rnd % 2 == 1 else ~hi


def louvain(
    graph: GraphTables,
    config: EngineConfig | None = None,
    weights: DataFrame | None = None,
    max_levels: int = 4,
    max_move_rounds: int = 64,
    metrics_out: dict | None = None,
    run_id: str | None = None,
    resume: bool = False,
    max_total_rounds: int | None = None,
) -> DataFrame:
    """(vid, community) — community = the level-0 vid of the final
    community representative (deterministic; NOT guaranteed to be the
    min vid of the member set).

    ``weights``: optional (src, dst, w); defaults to w = 1 per distinct
    undirected edge. ``metrics_out`` receives ``levels``,
    ``move_rounds`` (list per level), ``modularity`` (final Q) and
    ``communities`` (count).

    Durable resume: with ``config.checkpoint_dir`` set, the full loop
    state (level edge table + composed assignment + in-progress
    community table) is saved through LoopCheckpointer every
    ``config.checkpoint_every`` move rounds (counted ACROSS levels so
    the round number is monotone) and at each level boundary;
    ``resume=True`` with the same ``run_id`` re-enters mid-move-phase
    — sym/deg/m are re-derived deterministically from the restored
    level edges. ``max_total_rounds`` caps the combined move-round
    count (crash simulation for the resume tests); a capped run
    returns the partial assignment — resume to finish.
    """
    config = config or EngineConfig()
    spark = graph.spark
    parts = config.partitions_for(spark)
    ckpt = LoopCheckpointer(spark, config, "louvain", run_id=run_id)

    cur = None
    comm = None
    assign = None
    level0 = 0
    rounds = 0          # move rounds inside the current level
    zero_streak = 0
    grounds = 0         # combined move rounds across levels (monotone)
    move_rounds_per_level: list[int] = []
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            _rnd, tables, mm = latest
            cur = releaf(
                tables["cur"].repartition(parts, "a")
                .localCheckpoint(eager=True)
            )
            assign = tables["assign"]
            comm = tables.get("comm")
            level0 = int(mm["level"])
            rounds = int(mm["rounds"])
            zero_streak = int(mm["zero_streak"])
            grounds = int(mm["global_round"])
            move_rounds_per_level = list(mm.get("move_rounds_per_level", []))
    if cur is None:
        und = graph.undirected_edges()  # (a, b) distinct, a<b, no selfs
        if weights is not None:
            wn = (
                weights.select(
                    F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"),
                    F.col("w").cast("double").alias("w"),
                )
                .groupBy("a", "b")
                .agg(F.sum("w").alias("w"))
            )
            # left-join + loud failure on an uncovered edge (same
            # contract as boruvka_msf, mst.py:109-118): an inner join
            # would silently DROP edges missing from `weights` and
            # quietly cluster a different graph (r6 ADVICE).
            cur = und.join(wn, ["a", "b"], "left")
            if cur.where(F.col("w").isNull()).limit(1).count() > 0:
                raise ValueError(
                    "louvain: `weights` must cover every undirected "
                    "edge of the graph (found an edge with NULL weight)"
                )
        else:
            cur = und.withColumn("w", F.lit(1.0))
        # cur: one row per undirected edge (a <= b after contraction;
        # a == b rows are self-loops carrying intra-community weight)
        cur = releaf(
            cur.repartition(parts, "a").localCheckpoint(eager=True)
        )
        # assign: original vid -> current-level vertex (community rep)
        assign = releaf(
            graph.vertices.select("vid", F.col("vid").alias("comm"))
            .localCheckpoint(eager=True)
        )

    budget = max_total_rounds if max_total_rounds is not None else (1 << 30)
    q_final = 0.0
    n_comm = 0
    capped = False
    for _level in range(level0, max_levels):
        sym = cur.where(F.col("a") != F.col("b")).select(
            F.col("a").alias("src"), F.col("b").alias("dst"), "w"
        ).unionAll(
            cur.where(F.col("a") != F.col("b")).select(
                F.col("b").alias("src"), F.col("a").alias("dst"), "w"
            )
        )
        selfs = cur.where(F.col("a") == F.col("b")).select(
            F.col("a").alias("vid"), F.col("w").alias("w_self")
        )
        verts = (
            cur.select(F.col("a").alias("vid"))
            .unionAll(cur.select(F.col("b").alias("vid")))
            .distinct()
        )
        deg = (
            verts.join(
                sym.groupBy(F.col("src").alias("vid")).agg(
                    F.sum("w").alias("_wn")
                ),
                "vid",
                "left",
            )
            .join(selfs, "vid", "left")
            .select(
                "vid",
                (
                    F.coalesce("_wn", F.lit(0.0))
                    + 2.0 * F.coalesce("w_self", F.lit(0.0))
                ).alias("deg"),
            )
        )
        deg = releaf(
            deg.repartition(parts, "vid").localCheckpoint(eager=True)
        )
        m = cur.agg(F.sum("w")).collect()[0][0] or 0.0
        if m <= 0:
            break
        # cached SORTED by src (r8): the per-move-round community
        # gather rides the merge fast path with zero exchange/sort on
        # the O(E) side (same discipline as WCC's sym cache); released
        # at level end.
        sym = (
            sym.repartition(parts, "src")
            .sortWithinPartitions("src")
            .persist()
        )

        if comm is None:  # fresh level (not a mid-phase resume)
            comm = deg.select("vid", F.col("vid").alias("c"))
            rounds = 0
            zero_streak = 0
        # stop only on a zero PAIR (streak >= 2 ending on an even
        # round): the pair's two rounds gate complementary classes of
        # the SAME hash split with state unchanged between them, so a
        # quiet pair proves no vertex anywhere wants to move. A streak
        # of 2 ending on an odd round spans two different splits and
        # proves nothing — run one more round.
        while rounds < max_move_rounds and not (
            zero_streak >= 2 and rounds % 2 == 0
        ):
            if budget <= 0:
                capped = True
                break
            budget -= 1
            rounds += 1
            grounds += 1
            tot = comm.join(deg, "vid").groupBy("c").agg(
                F.sum("deg").alias("tot")
            )
            # gather along src (the cache's partition/sort key) and
            # aggregate by dst — the edge set is symmetric with equal
            # weights in both directions, so the (vertex, community,
            # weight) multiset is identical to the old dst-side join,
            # without re-shuffling the O(E) side every round. Sums are
            # exact under reordering at gate scale (integer-valued w).
            nbr_c = (
                sym.hint("merge").join(
                    comm.select(F.col("vid").alias("src"), "c"), "src"
                )
                .groupBy(F.col("dst").alias("vid"), "c")
                .agg(F.sum("w").alias("k_vc"))
            )
            own = comm.select("vid", F.col("c").alias("c_own"))
            # candidate rows: every neighbor community (k_vc to own
            # community rides along via a left join back)
            cand = (
                nbr_c.join(own, "vid")
                .join(tot, "c")
                .join(deg, "vid")
                .join(
                    tot.select(
                        F.col("c").alias("c_own"),
                        F.col("tot").alias("tot_own"),
                    ),
                    "c_own",
                )
                .join(
                    nbr_c.select(
                        "vid",
                        F.col("c").alias("c_own"),
                        F.col("k_vc").alias("k_own"),
                    ),
                    ["vid", "c_own"],
                    "left",
                )
            )
            gain = cand.select(
                "vid",
                "c",
                "c_own",
                (
                    (
                        F.col("k_vc")
                        - F.coalesce("k_own", F.lit(0.0))
                    )
                    / F.lit(m)
                    - F.col("deg")
                    * (
                        F.col("tot")
                        - (F.col("tot_own") - F.col("deg"))
                    )
                    / F.lit(2.0 * m * m)
                ).alias("dq"),
            ).where(F.col("c") != F.col("c_own"))
            best = (
                gain.groupBy("vid")
                .agg(
                    F.max(
                        F.struct(
                            F.col("dq"), (-F.col("c")).alias("nc")
                        )
                    ).alias("b"),
                    F.first("c_own").alias("c_own"),
                )
                .where(F.col("b.dq") > 1e-12)
                .select(
                    "vid", (-F.col("b.nc")).alias("c_new"), "c_own"
                )
            )
            moves = best.where(_move_gate(F.col("vid"), rounds))
            obs = Observation()
            comm = releaf(
                comm.join(
                    moves.select("vid", "c_new"), "vid", "left"
                )
                .select(
                    "vid",
                    F.coalesce("c_new", F.col("c")).alias("c"),
                    F.col("c_new").isNotNull().cast("long").alias("_mv"),
                )
                .observe(obs, F.sum("_mv").alias("moved"))
                .drop("_mv")
                .localCheckpoint(eager=True)
            )
            moved = int(obs.get["moved"] or 0)
            zero_streak = zero_streak + 1 if moved == 0 else 0
            if ckpt.due(grounds):
                saved = ckpt.save(
                    grounds,
                    {"cur": cur, "assign": assign, "comm": comm},
                    {
                        "level": _level,
                        "rounds": rounds,
                        "zero_streak": zero_streak,
                        "global_round": grounds,
                        "move_rounds_per_level": move_rounds_per_level,
                    },
                )
                if saved is not None:
                    cur, assign, comm = (
                        saved["cur"], saved["assign"], saved["comm"]
                    )
        if capped:
            sym.unpersist()
            break
        move_rounds_per_level.append(rounds)

        # compose the original-vid assignment through this level (LEFT:
        # isolated vertices never enter a level graph and keep their
        # own-vid community)
        assign = releaf(
            assign.join(
                comm.select(
                    F.col("vid").alias("comm"), F.col("c").alias("_c")
                ),
                "comm",
                "left",
            )
            .select(
                "vid", F.coalesce("_c", F.col("comm")).alias("comm")
            )
            .localCheckpoint(eager=True)
        )

        # modularity of this level's partition (on the level graph):
        # Q = Σ_c [ in_c/m − (tot_c/(2m))² ], in_c = intra weight.
        # METERED (r6 VERDICT finding #2): these are reporting-only
        # driver actions — 2 collects + a count per level — so they run
        # only when the caller asked for metrics_out; the hard-gate and
        # production paths pay 1 action per move round + m per level.
        ca = comm.select(F.col("vid").alias("a"), F.col("c").alias("ca"))
        cb = comm.select(F.col("vid").alias("b"), F.col("c").alias("cb"))
        if metrics_out is not None:
            intra = (
                cur.join(ca, "a")
                .join(cb, "b")
                .where(F.col("ca") == F.col("cb"))
                .agg(F.coalesce(F.sum("w"), F.lit(0.0)))
                .collect()[0][0]
            )
            tot_rows = (
                comm.join(deg, "vid").groupBy("c").agg(F.sum("deg").alias("t"))
            )
            sq = tot_rows.agg(
                F.coalesce(F.sum(F.col("t") * F.col("t")), F.lit(0.0))
            ).collect()[0][0]
            q_final = intra / m - sq / (4.0 * m * m)
            n_comm = tot_rows.count()

        sym.unpersist()  # the level's move phase is done with it
        # no movement at all this level -> done (rounds==2 means the
        # first pair was immediately quiescent — both classes of its
        # split saw zero moves)
        total_moved = rounds > 2
        if not total_moved:
            break

        # contract: communities become vertices, weights aggregate,
        # intra-community weight becomes the self-loop
        nxt = releaf(
            cur.join(ca, "a")
            .join(cb, "b")
            .select(
                F.least("ca", "cb").alias("a"),
                F.greatest("ca", "cb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
            .repartition(parts, "a")
            .localCheckpoint(eager=True)
        )
        cur = nxt
        comm = None  # next level re-derives its own community table
        rounds = 0
        zero_streak = 0
        # level-boundary checkpoint: composed assign + contracted
        # edges; comm intentionally absent (resume re-derives it at
        # level entry). grounds bumps so the boundary save never
        # overwrites the last in-phase round's sealed state.
        grounds += 1
        if ckpt.due(grounds):
            saved = ckpt.save(
                grounds,
                {"cur": cur, "assign": assign},
                {
                    "level": _level + 1,
                    "rounds": 0,
                    "zero_streak": 0,
                    "global_round": grounds,
                    "move_rounds_per_level": move_rounds_per_level,
                },
            )
            if saved is not None:
                cur, assign = saved["cur"], saved["assign"]

    if metrics_out is not None:
        metrics_out["levels"] = len(move_rounds_per_level)
        metrics_out["move_rounds"] = move_rounds_per_level
        metrics_out["modularity"] = float(q_final)
        metrics_out["communities"] = int(n_comm)
        metrics_out["capped"] = capped
    return assign.select("vid", F.col("comm").alias("community"))
