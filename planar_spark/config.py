"""Engine configuration.

The reference configures its runs through a gflags singleton
(core/common/config.h:60-120 — parallelism, memory_size, iter, ...).
Ours is a plain dataclass passed to kernels; Spark-level knobs
(shuffle partitions, AQE) live on the SparkSession (session.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # --- PageRank (reference defaults: core/common/config.h:96-99) ---
    damping: float = 0.85
    max_iterations: int = 20
    tolerance: float = 1.0e-9  # L1 early-stop; <=0 disables early stop

    # --- superstep engine ---
    # Reliable per-superstep checkpointing: every superstep's state is
    # written to (and re-read from) the state store, truncating lineage
    # (the Spark analogue of the reference writing mutated blocks back
    # as .bin.new each round, nvme/scheduler/scheduler.h:435-442).
    checkpoint_dir: str | None = None
    checkpoint_every: int = 1  # checkpoint every k supersteps (>=1)
    # How the engine materializes each superstep's state when no parquet
    # checkpoint is due:
    # - "localCheckpoint": cut lineage every step (default). Loses the
    #   state's hash partitioning (LogicalRDD reports
    #   UnknownPartitioning), so kernels that join the full state by key
    #   every round pay an O(V) exchange per superstep.
    # - "cache": persist() the state — InMemoryRelation PRESERVES output
    #   partitioning, so a vid-partitioned state joins without any
    #   exchange. Lineage grows one plan level per step; it is truncated
    #   with a localCheckpoint every ``cache_truncate_every`` steps
    #   (one amortized re-exchange).
    state_persist: str = "localCheckpoint"
    cache_truncate_every: int = 8

    # --- partitioning / skew ---
    # Number of hash partitions for edges/state co-partitioning. Should
    # track cluster cores; on a real cluster this is O(2-4x total cores).
    num_partitions: int = field(
        default_factory=lambda: int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    # Degree threshold above which a vertex counts as a "hub": its
    # messages are pre-aggregated per salt bucket before the final
    # per-vertex aggregation (two-stage agg; reference analogue is the
    # strided ParallelVertexDoStep skew path, core/apis/planar_app_base.h:208-231).
    hub_degree_threshold: int = 100_000
    salt_buckets: int = 16
    # Broadcast the frontier/state side of a join when its row count is
    # below this (reference analogue: whole vertex-state array shared in
    # memory, core/update_stores/bsp_update_store.h:35-36).
    broadcast_max_rows: int = 2_000_000
    # Join strategy hint for the per-superstep gather (edges ⋈ state).
    # "merge" pins a sort-merge join against the pre-partitioned,
    # pre-sorted cached edge table (zero exchange + zero sort on the
    # edge side). Without it AQE tends to pick a broadcast join of the
    # state, whose serial per-superstep broadcast build becomes the
    # Amdahl bottleneck at high parallelism. None/"" = let AQE choose.
    # "shuffle_hash" builds a hash map on the (small) state side and
    # streams the edges through the probe — skips SMJ's per-superstep
    # state sort. Measured r6 (big-graph pagerank, warm JVM, 3
    # interleaved pairs): tie within host noise (7.55s vs 7.08s
    # medians) — the V-per-partition state sort is not a bottleneck at
    # this scale, so "merge" stays the default for its plan-test-
    # asserted zero-edge-exchange shape.
    gather_join: str | None = "merge"

    # --- LPA ---
    lpa_max_iterations: int = 10

    # --- locality layout consumption ---
    # Minimum edge count at which layout-aware kernels consume a
    # with_partitioning graph via the block-pinned compound-key gather.
    # The pinned gather only pays when the gather EXCHANGE is the
    # bottleneck: measured (BENCH/NOTES.md r7) it moves 2.2x more
    # edges/s at 100M edges but LOSES wall-clock at 1M edges
    # (ring_pagerank_locality 3.4s vs ring_pagerank_hash 3.1s — the
    # compound-key join costs more than the ~8MB exchange it saves).
    # Below the threshold kernels fall back to the plain hash gather —
    # results are identical either way (same join semantics, different
    # physical plan). 0 pins the block path unconditionally (plan tests
    # and the pagerank_locality gate use this to keep exercising it).
    locality_min_edges: int = 10_000_000

    def partitions_for(self, spark) -> int:
        """Effective partition count: config value or session default."""
        if self.num_partitions > 0:
            return self.num_partitions
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
