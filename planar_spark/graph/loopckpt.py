"""Durable round-level checkpoint/resume for self-managed loop kernels.

The SuperstepEngine already gives pagerank/wcc/lpa/sssp/hits durable
per-superstep checkpoints (superstep.py — the Spark analogue of the
reference writing every mutated block back as ``.bin.new`` each round,
nvme/scheduler/scheduler.h:435-442). The kernels that drive their OWN
loops (Boruvka MSF, SCC trim/color/sweep, speculative coloring, k-core
peeling) previously ran on bare ``localCheckpoint`` only: a driver loss
at hour N of a 100 TB run restarted from zero. This helper closes that
gap with the same contract the engine uses:

- every ``checkpoint_every`` rounds the kernel hands over its FULL loop
  state (one or more named DataFrames) plus its driver-side counters;
  each table is written through the catalog-aware TableStore and the
  round is sealed with an atomic completion marker (``_META.json`` via
  ``os.replace``, or an Iceberg append when a catalog is configured);
- a round whose tables exist but whose marker was never committed
  (killed mid-write) is invisible to ``latest()`` — resume restarts it
  from the previous completed round;
- ``latest()`` returns (round, {name: DataFrame}, metrics) so the
  kernel re-enters its loop at round+1 with restored state AND restored
  counters (round numbers feed deterministic per-round hashes in
  coloring, so they must survive the crash).

State restored from parquet is a fresh scan leaf — no lineage, no
inherited statistics — so resume also acts as the strongest possible
lineage truncation.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from planar_spark.config import EngineConfig
from planar_spark.storage import TableStore


class LoopCheckpointer:
    """Round-granular durable state for a kernel-managed driver loop."""

    def __init__(
        self,
        spark: SparkSession,
        config: EngineConfig | None,
        kernel: str,
        run_id: str | None = None,
        retain: int | None = None,
    ):
        """``retain``: keep only the newest N completed rounds, deleting
        older round tables after each save commits. Unset (default)
        keeps everything — right for bounded kernel loops, WRONG for a
        continuously-running maintenance pipeline whose state is an
        O(V) table per round (r6 ADVICE: an unbounded streaming WCC
        state_dir is an operational hazard at 100 TB)."""
        config = config or EngineConfig()
        self.kernel = kernel
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.every = max(1, config.checkpoint_every)
        self.retain = retain
        self._store = (
            TableStore(spark, config.checkpoint_dir)
            if config.checkpoint_dir
            else None
        )
        self._prefix = f"{kernel}/{self.run_id}"

    @property
    def enabled(self) -> bool:
        return self._store is not None

    def due(self, rnd: int) -> bool:
        """True when round ``rnd`` should be persisted."""
        return self.enabled and rnd % self.every == 0

    def _round_name(self, rnd: int) -> str:
        return f"{self._prefix}/round={rnd:05d}"

    def save(
        self, rnd: int, tables: dict[str, DataFrame], metrics: dict | None = None
    ) -> dict[str, DataFrame] | None:
        """Persist the loop state for round ``rnd`` (no-op unless due).

        Tables first, completion marker last — the marker commits the
        round atomically, exactly like SuperstepEngine._write_meta.
        Returns the tables RE-READ from the store (so the caller can
        root the rest of its loop at the durable copy — lineage
        truncation for free, same discipline as
        SuperstepEngine._persist_state), or None when the round was not
        due.
        """
        if not self.due(rnd):
            return None
        base = self._round_name(rnd)
        for name, df in tables.items():
            self._store.write(df, f"{base}/{name}")
        # per-partition lineage per state table (north rule: frontier
        # state + lineage + metrics in every durable round) — built from
        # file footers / Iceberg metadata, no extra Spark job
        lineage = {
            name: self._store.partition_lineage(f"{base}/{name}")
            for name in tables
        }
        self._store.write_meta(
            base,
            {
                "run_id": self.run_id,
                "kernel": self.kernel,
                "round": rnd,
                "tables": sorted(tables),
                "metrics": metrics or {},
                "partition_lineage": lineage,
                "wall_ts": time.time(),
                "completed": True,
            },
        )
        if self.retain:
            self.prune(self.retain)
        return {name: self._store.read(f"{base}/{name}") for name in tables}

    def _completed_rounds(self) -> list[int]:
        """Round numbers with a live completion marker, ascending."""
        out = []
        for name in self._store.list_meta_names(self._prefix):
            tail = name.rsplit("/", 1)[-1]
            if tail.startswith("round="):
                rnd = int(tail.split("=")[1])
                meta = self._store.read_meta(self._round_name(rnd)) or {}
                if meta.get("completed", False):
                    out.append(rnd)
        return sorted(out)

    def prune(self, keep: int) -> list[int]:
        """Delete all completed rounds except the newest ``keep``.
        Marker is retracted FIRST, tables after — a crash mid-prune
        leaves orphan table files (harmless) but never a completed
        marker over missing tables. Returns the pruned round numbers."""
        if self._store is None or keep < 1:
            return []
        rounds = self._completed_rounds()
        doomed = rounds[:-keep] if len(rounds) > keep else []
        for rnd in doomed:
            base = self._round_name(rnd)
            meta = self._store.read_meta(base) or {}
            self._store.retract_meta(base)
            for t in meta.get("tables", []):
                self._store.drop(f"{base}/{t}")
            self._store.drop(base)  # fallback: removes the round dir
        return doomed

    def latest(
        self, max_round: int | None = None
    ) -> tuple[int, dict[str, DataFrame], dict] | None:
        """(round, {name: DataFrame}, metrics) of the newest COMPLETED
        round, or None when nothing durable exists for this run_id.

        ``max_round`` ignores checkpoints PAST the caller's target: a
        prior run under the same run_id that checkpointed beyond the
        requested round (e.g. a larger-radius HyperBall sweep) must not
        make a smaller-target resume silently return the larger run's
        state (r7 ADVICE low)."""
        if self._store is None:
            return None
        rounds = self._completed_rounds()
        if max_round is not None:
            rounds = [r for r in rounds if r <= max_round]
        if not rounds:
            return None
        best = rounds[-1]
        base = self._round_name(best)
        meta = self._store.read_meta(base) or {}
        tables = {
            t: self._store.read(f"{base}/{t}") for t in meta.get("tables", [])
        }
        return best, tables, meta.get("metrics", {})
