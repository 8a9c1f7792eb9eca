"""The superstep engine: BSP driver loop + checkpoint/resume.

This is the DataFrame re-expression of the reference's execution model:
the app's ``Compute()`` is a plain loop issuing Map* calls that each run
one bulk-synchronous superstep over all blocks and end with
``update_store_->Sync()`` (nvme/apis/block_api.h:150-169,
nvme/scheduler/scheduler.h:190-246, nvme/update_stores/
nvme_update_store.h:138-145). Here:

- one superstep  = ``step_fn(state, step) -> (new_state, metrics)`` —
  a pure DataFrame expression (join + keyed agg), executed when the
  engine materializes the new state;
- ``Sync()``     = replacing the state DataFrame reference — state is
  immutable, so BSP read/write double-buffering is free;
- block write-back (.bin.new, scheduler.h:435-442) = per-superstep
  parquet checkpoint of the state + a meta JSON carrying run lineage
  and convergence metrics — which doubles as lineage truncation
  (without it, step k's plan is O(k) deep and the job dies by step ~30)
  and as the resume point demanded by the north rule;
- ``IsActive()`` termination (bsp_update_store.h:174-176) =
  ``converged_fn(metrics)`` on driver-side aggregated counts, where the
  metrics come from ``post_fn(old_state, new_state, step)`` evaluated on
  the already-materialized new state (so convergence checks never
  re-execute the superstep plan).
"""

from __future__ import annotations

import os
import time
import uuid
import warnings
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession

from planar_spark.config import EngineConfig
from planar_spark.storage import TableStore

StepFn = Callable[[DataFrame, int], tuple[DataFrame, dict]]
PostFn = Callable[[DataFrame, DataFrame, int], dict]


def resolve_observations(metrics: dict) -> dict:
    """Replace any ``Observation`` values in a step's metrics dict with
    the observed aggregates (merged in as plain keys).

    This is the zero-extra-job metrics path: a step_fn attaches
    ``df.observe(obs, ...)`` to the state plan it returns and puts the
    Observation in its metrics; the engine resolves it right after the
    state-materialization job (localCheckpoint / cache count / store
    write) — which is the job that populated it — so convergence counts
    never cost a standalone action."""
    out = dict(metrics)
    for key in list(out):
        if isinstance(out[key], Observation):
            obs = out.pop(key)
            out.update(obs.get)
    return out


def releaf(df: DataFrame) -> DataFrame:
    """Rebuild an already-materialized (checkpointed) DataFrame as a
    fresh LogicalRDD leaf with DEFAULT statistics.

    Why this exists: ``Dataset.localCheckpoint`` copies the child plan's
    estimated statistics into the new leaf. An iterative kernel whose
    superstep SELF-JOINS its state (pointer jumping, Boruvka hooks,
    coloring conflict checks) then SQUARES the ``sizeInBytes`` estimate
    every round — the estimate becomes a 2^rounds-bit BigInteger and by
    round ~18 the driver burns seconds per join-planning stats call in
    BigInteger division (observed in SizeInBytesOnlyStatsPlanVisitor).
    Re-wrapping the checkpointed RDD in a leaf without inherited stats
    resets the estimate to the constant default. No data is moved: the
    RDD is reused as-is.
    """
    try:
        jdf = df._jdf
        spark = df.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception as e:  # internal API moved/renamed
        # never silent: without the stats reset, self-join loop kernels
        # degrade to seconds-per-round driver-side BigInteger planning
        # by round ~18 — a production run must be able to SEE that it is
        # running in the degraded mode
        warnings.warn(
            f"releaf: statistics-reset fast path unavailable ({e!r}); "
            "falling back to the raw checkpoint. Iterative self-join "
            "kernels may hit the inherited-sizeInBytes blowup "
            "(see superstep.releaf docstring).",
            RuntimeWarning,
            stacklevel=2,
        )
        return df


@dataclass
class SuperstepResult:
    state: DataFrame
    steps_run: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


class SuperstepEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: EngineConfig,
        kernel: str,
        run_id: str | None = None,
        lineage: dict | None = None,
    ):
        self.spark = spark
        self.config = config
        self.kernel = kernel
        self.run_id = run_id or uuid.uuid4().hex[:12]
        # Run lineage recorded in every superstep meta: inputs, graph
        # stats, engine config — enough to reproduce the run from the
        # checkpoint alone (north-rule: per-partition state + lineage +
        # convergence metrics per superstep).
        self.lineage = dict(lineage or {})
        self.lineage.setdefault("damping", config.damping)
        self.lineage.setdefault("num_partitions", config.num_partitions)
        # Checkpoint IO goes through the catalog-aware TableStore:
        # Iceberg writeTo when a catalog is configured, parquet + atomic
        # JSON meta markers otherwise (planar_spark/storage.py).
        self._store = (
            TableStore(spark, config.checkpoint_dir)
            if config.checkpoint_dir
            else None
        )
        self._ckpt_prefix = f"{kernel}/{self.run_id}"
        self._persisted: list[DataFrame] = []

    # ------------------------------------------------------------- ckpt io
    def _step_name(self, step: int) -> str:
        return f"{self._ckpt_prefix}/step={step:05d}"

    def _should_checkpoint(self, step: int) -> bool:
        every = max(1, self.config.checkpoint_every)
        return self._store is not None and step % every == 0

    def _dump_plan(self, state: DataFrame, step: int) -> None:
        """Debug hook: write the superstep's physical plan (formatted
        explain) to $SPARK_GRAFT_EXPLAIN_DIR/<kernel>_step<k>.txt before
        materialization. Off unless the env var is set; used to commit
        the plans/r*/ before/after evidence without touching kernels."""
        out_dir = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR")
        if not out_dir:
            return
        try:
            mode = state.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = state._jdf.queryExecution().explainString(mode)
            os.makedirs(out_dir, exist_ok=True)
            with open(
                os.path.join(out_dir, f"{self.kernel}_step{step:03d}.txt"), "w"
            ) as f:
                f.write(txt)
        except Exception:  # noqa: BLE001 — debug-only, never break a run
            pass

    def _persist_state(self, state: DataFrame, step: int) -> DataFrame:
        """Materialize the superstep's state and cut lineage.

        ``state_persist="cache"`` keeps the state in the block cache
        instead: InMemoryRelation preserves the state's hash
        partitioning (a localCheckpoint degrades it to
        UnknownPartitioning), so key-joining kernels avoid an O(V)
        exchange per superstep. Lineage is still truncated with a
        localCheckpoint every ``cache_truncate_every`` steps.
        """
        self._dump_plan(state, step)
        if self._should_checkpoint(step):
            name = f"{self._step_name(step)}/state"
            self._store.write(state, name)
            return self._store.read(name)
        every = max(1, self.config.cache_truncate_every)
        if self.config.state_persist == "cache" and (step == 0 or step % every):
            out = state.persist()
            out.count()  # eager materialization
        else:
            out = releaf(state.localCheckpoint(eager=True))
        self._persisted.append(out)
        return out

    def _write_meta(self, step: int, metrics: dict) -> None:
        """Mark a checkpointed superstep complete (atomic marker)."""
        if not self._should_checkpoint(step):
            return
        meta = {
            "run_id": self.run_id,
            "kernel": self.kernel,
            "superstep": step,
            "metrics": metrics,
            "lineage": self.lineage,
            # per-partition rows/bytes of the just-written state table
            # (parquet footers / Iceberg .files — no extra Spark job)
            "partition_lineage": self._store.partition_lineage(
                f"{self._step_name(step)}/state"
            ),
            "wall_ts": time.time(),
            "completed": True,
        }
        self._store.write_meta(self._step_name(step), meta)

    def latest_checkpoint(self) -> tuple[int, DataFrame, dict] | None:
        """(step, state, metrics) of the newest COMPLETED superstep, or None.

        A superstep whose state table exists but whose completion marker
        was never committed (killed mid-write) is ignored — resume
        restarts it from the previous completed state.
        """
        if self._store is None:
            return None
        best = None
        for name in self._store.list_meta_names(self._ckpt_prefix):
            tail = name.rsplit("/", 1)[-1]
            if tail.startswith("step="):
                step = int(tail.split("=")[1])
                if best is None or step > best:
                    best = step
        if best is None:
            return None
        meta = self._store.read_meta(self._step_name(best)) or {}
        state = self._store.read(f"{self._step_name(best)}/state")
        return best, state, meta.get("metrics", {})

    # ------------------------------------------------------------- runner
    def run(
        self,
        init_state: DataFrame | Callable[[], DataFrame],
        step_fn: StepFn,
        max_steps: int,
        converged_fn: Callable[[dict], bool] | None = None,
        post_fn: PostFn | None = None,
        resume: bool = False,
    ) -> SuperstepResult:
        start_step = 1
        all_metrics: list[dict] = []
        state: DataFrame | None = None
        if resume:
            latest = self.latest_checkpoint()
            if latest is not None:
                found_step, state, last_metrics = latest
                all_metrics.append(last_metrics)
                if converged_fn and last_metrics and converged_fn(last_metrics):
                    return SuperstepResult(state, found_step, True, all_metrics)
                start_step = found_step + 1
        if state is None:
            state = init_state() if callable(init_state) else init_state
            state = self._persist_state(state, 0)
            self._write_meta(0, {"init": True})

        converged = False
        step = start_step - 1
        for step in range(start_step, max_steps + 1):
            t0 = time.time()
            new_state, metrics = step_fn(state, step)
            new_state = self._persist_state(new_state, step)
            # Observations attached to the state plan were populated by
            # the materialization job just above — fold them in now (so
            # converged_fn and the checkpoint meta see plain values).
            metrics = resolve_observations(metrics)
            if post_fn is not None:
                metrics.update(post_fn(state, new_state, step))
            metrics["superstep"] = step
            metrics["seconds"] = time.time() - t0
            self._write_meta(step, metrics)
            all_metrics.append(metrics)
            # The old state is dead once the new one is materialized and
            # post-metrics are computed — release its cached blocks now,
            # or long runs accumulate every superstep's state in memory.
            if any(df is state for df in self._persisted):
                state.unpersist()
                self._persisted = [df for df in self._persisted if df is not state]
            state = new_state
            if converged_fn and converged_fn(metrics):
                converged = True
                break
        # Release any remaining intermediates, but never the final state.
        for df in self._persisted:
            if df is not state:
                df.unpersist()
        self._persisted.clear()
        return SuperstepResult(state, step, converged, all_metrics)
