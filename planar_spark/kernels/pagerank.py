"""PageRank: textbook power iteration with dangling-mass redistribution.

Reference kernel: core/apps/pagerank_app.h:38-99 and
nvme/apps/pagerank_vc_nvme_app.h:29-71 — per superstep a "pull" over each
vertex's adjacency, ``pr_new[v] = d * Σ pr[w]/outdeg(w) + λ`` with fixed
iteration count. The reference freezes deg-0 vertices at 1/N and never
redistributes dangling mass (a known quirk; see SURVEY.md §7.3); the
north rule requires the standard formulation, which we implement:

    pr_{k+1}(v) = (1-d)/N + d * ( Σ_{u->v} pr_k(u)/outdeg(u)
                                  + dangling_mass_k / N )

so Σ pr == 1 at every superstep (validated in tests).

One superstep = one gather join + one keyed sum — the DataFrame analogue
of the reference's ParallelVertexDoWithEdges + WriteAdd + Sync
(core/apis/planar_app_base_op.h:205-346, core/util/atomic.h:52-59):

    contribs = edges ⋈_{src==vid} state  → groupBy(dst).sum(pr/out_deg)
    state'   = base ⋈_{vid} contribs     → (1-d)/N + d*(contrib + dm/N)

Scale notes:
- state carries (vid, out_deg, pr) so the per-edge contribution needs no
  extra join against degrees;
- the dangling mass rides each state materialization as an Observation
  and folds into the next step's plan as a literal (r8) — no extra job,
  no per-step aggregate subtree;
- hub skew on the gather join is handled by salted_gather_join;
- partial aggregation makes the groupBy(dst) shuffle one row per
  (task, dst) — no agg-side salting needed;
- per-superstep checkpoint truncates lineage (SuperstepEngine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from planar_spark.config import EngineConfig
from planar_spark.graph.skew import hub_vertices, salted_gather_join
from planar_spark.graph.superstep import SuperstepEngine, SuperstepResult
from planar_spark.graph.tables import GraphTables


def pagerank(
    graph: GraphTables,
    config: EngineConfig | None = None,
    num_iterations: int | None = None,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    init_ranks: DataFrame | None = None,
) -> SuperstepResult:
    """Returns state (vid, out_deg, pr); final pr sums to 1.

    ``init_ranks`` (vid, pr) warm-starts the power iteration from a
    previous run's state instead of the uniform 1/N vector — the batch
    companion to incremental WCC for nightly link-graph maintenance:
    yesterday's converged ranks are an excellent initial guess for
    today's slightly-changed graph, so the fixpoint is re-reached in a
    fraction of the supersteps (power iteration converges from ANY
    L1-bounded start; with tolerance-based early stop the saving is
    automatic). Vertices absent from ``init_ranks`` (new pages) start
    at 1/N. Warm-starting the SAME graph for k more steps is exactly
    step-continuation (asserted against a cold run in tests and the
    pagerank_warmstart driver gate)."""
    config = config or EngineConfig()
    spark = graph.spark
    n = graph.num_vertices
    d = config.damping
    iters = num_iterations or config.max_iterations
    parts = config.partitions_for(spark)

    # Layout-aware gather (r7): on a with_partitioning graph
    # (region-major ids, graph.block_size set) the edge table is pinned
    # by locality BLOCK and the gather joins on the compound
    # (sblk, src) key — zero edge-side exchange, and the groupBy(dst)
    # partial agg emits ~V + cut rows instead of ~parts*V
    # (graph/locality.py; same consumption pattern as WCC,
    # components.py). Hub salting is a no-op under pinning (skew.py).
    from planar_spark.graph.locality import effective_block_size

    # cost-aware consumption (r8): fall back to the hash gather below
    # config.locality_min_edges — identical results, see config doc
    bs = effective_block_size(graph, config)
    pinned = None
    if bs:
        from planar_spark.graph.locality import block_pinned_edges

        pinned = block_pinned_edges(graph, parts).persist()
        edges, hubs = pinned, None
    else:
        edges = graph.edges
        hubs_df = hub_vertices(graph.degrees, config.hub_degree_threshold)
        hubs = hubs_df if hubs_df.limit(1).count() > 0 else None
    base = graph.degrees  # (vid, out_deg), partitioned by vid

    from pyspark.sql import Observation

    # Dangling mass rides every state MATERIALIZATION as an Observation
    # (r8): the old design folded a 1-row aggregate over the previous
    # state into each superstep plan (scan + 2 agg stages + a broadcast
    # exchange per step). The sum over the SAME materialized rows is
    # available driver-side for free on the job that produced them —
    # the [[observation-metrics-trick]] discipline — so the next step
    # inlines it as a literal. Value-identical modulo FP partial-sum
    # order, which was already nondeterministic in the in-plan form.
    carry: dict = {"dm_obs": None, "dm": None}
    _DM = F.sum(F.when(F.col("out_deg") == 0, F.col("pr"))).alias("_dm")

    def _observed(df: DataFrame) -> DataFrame:
        obs = Observation()
        carry["dm_obs"] = obs
        return df.observe(obs, _DM)

    def _dm_value() -> float | None:
        obs = carry.pop("dm_obs", None)
        if obs is not None:
            carry["dm"] = float(obs.get["_dm"] or 0.0)
        return carry["dm"]

    def init_state() -> DataFrame:
        if init_ranks is not None:
            return _observed(
                base.join(
                    init_ranks.select("vid", F.col("pr").alias("_pr0")),
                    "vid",
                    "left",
                ).select(
                    "vid",
                    "out_deg",
                    F.coalesce("_pr0", F.lit(1.0 / n)).alias("pr"),
                )
            )
        return _observed(base.withColumn("pr", F.lit(1.0 / n)))

    def step(state: DataFrame, _step: int) -> tuple[DataFrame, dict]:
        live = state.where(F.col("out_deg") > 0).select(
            "vid", (F.col("pr") / F.col("out_deg")).alias("w")
        )
        gathered = salted_gather_join(
            edges, live, config, hubs=hubs, block_size=bs
        )
        contribs = gathered.groupBy(F.col("dst").alias("vid")).agg(
            F.sum("w").alias("contrib")
        )
        dm = _dm_value()
        if dm is not None:
            dm_col = F.lit(dm)
            attach = lambda df: df  # noqa: E731
        else:
            # resumed run whose checkpoint predates the dm observation:
            # fall back to the in-plan 1-row aggregate for THIS step
            dm_df = state.where(F.col("out_deg") == 0).agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm")
            )
            dm_col = F.col("_dm")
            attach = lambda df: df.crossJoin(F.broadcast(dm_df))  # noqa: E731
        pr_expr = (
            F.lit((1.0 - d) / n)
            + F.lit(d)
            * (
                F.coalesce(F.col("contrib"), F.lit(0.0))
                + dm_col / F.lit(float(n))
            )
        ).alias("pr")
        if config.tolerance <= 0:
            new_state = _observed(
                attach(base.join(contribs, "vid", "left")).select(
                    "vid", "out_deg", pr_expr
                )
            )
            # no trailing repartition: the base⋈contribs join already
            # leaves the state hash-partitioned by vid
            return new_state, {}
        # Early-stop mode: build the new state FROM the old one (which
        # carries pr) so the L1 delta is OBSERVED on the state plan —
        # the convergence metric rides the materialization job instead
        # of a standalone old⋈new aggregate job per superstep.
        obs = Observation()
        new_state = _observed(
            attach(
                state.select("vid", "out_deg", F.col("pr").alias("_pr_old"))
                .join(contribs, "vid", "left")
            )
            .select("vid", "out_deg", pr_expr, "_pr_old")
            .observe(
                obs,
                F.sum(F.abs(F.col("pr") - F.col("_pr_old"))).alias("l1_delta"),
            )
            .drop("_pr_old")
        )
        return new_state, {"_obs": obs}

    def converged(metrics: dict) -> bool:
        return (
            config.tolerance > 0
            and metrics.get("l1_delta", float("inf")) < config.tolerance
        )

    engine = engine or SuperstepEngine(
        spark, config, "pagerank",
        lineage={"num_vertices": n, "num_edges": graph.num_edges},
    )
    result = engine.run(init_state, step, iters, converged, resume=resume)
    if pinned is not None:
        pinned.unpersist()
    return result
