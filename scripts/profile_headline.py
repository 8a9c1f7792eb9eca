#!/usr/bin/env python
"""r08 profiling harness: per-kernel wall time + per-superstep seconds +
job/stage counts for the six headline kernels (guide section 1: measure
first). NOT part of the frozen bench contract — bench.py is untouched.

Usage: python scripts/profile_headline.py [kernel ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PROFILE_RUNS (default 3)
Prints one JSON line per kernel run plus a final medians object.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from planar_spark import EngineConfig, get_spark
from planar_spark.kernels import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from planar_spark.kernels.neighborhood import two_hop_stats
from planar_spark.kernels.sssp import bfs_sssp

from bench import BENCH_V_MOD, PR_ITERS, LPA_ROUNDS, bench_graph


class JobCounter:
    """Snapshot job/stage ids via the status tracker (no listener API in
    PySpark): we diff job group ids before/after each kernel."""

    def __init__(self, sc):
        self.sc = sc

    def snap(self):
        t = self.sc.statusTracker()
        return set(t.getJobIdsForGroup(None) or [])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("PROFILE_RUNS", "3"))
    parts = max(cpus, 8)
    spark = get_spark("planar_profile", cores=cpus, shuffle_partitions=parts)
    cfg = EngineConfig(num_partitions=parts, tolerance=0.0, checkpoint_dir=None)
    sc = spark.sparkContext

    g = bench_graph(spark, sf_dir, parts)

    only = set(sys.argv[1:])

    def jobs_between(fn):
        t = sc.statusTracker()
        before = max([-1] + list(t.getJobIdsForGroup(None) or []))
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        after = max([-1] + list(sc.statusTracker().getJobIdsForGroup(None) or []))
        return out, dt, after - before

    kernels = {
        "pagerank": lambda: pagerank(g, cfg, num_iterations=PR_ITERS),
        "wcc": lambda: connected_components(g, cfg, two_hop_init=True),
        "lpa": lambda: label_propagation(g, cfg, num_iterations=LPA_ROUNDS),
        "triangle_count": lambda: triangle_count(g, cfg),
        "sssp": lambda: bfs_sssp(
            g, int(g.vertices.agg(F.min("vid")).collect()[0][0]), cfg
        ),
        "two_hop_stats": lambda: two_hop_stats(g).count(),
    }

    results: dict[str, list[float]] = {k: [] for k in kernels}
    for run in range(n_runs):
        for name, fn in kernels.items():
            if only and name not in only:
                continue
            sc.setJobDescription(f"profile:{name}:run{run}")
            out, dt, njobs = jobs_between(fn)
            sc.setJobDescription(None)
            results[name].append(dt)
            rec = {"kernel": name, "run": run, "sec": round(dt, 3), "jobs": njobs}
            if hasattr(out, "metrics"):
                rec["step_secs"] = [
                    round(m.get("seconds", 0.0), 3) for m in out.metrics
                ]
                rec["steps"] = out.steps_run
            print(json.dumps(rec), flush=True)

    med = {
        k: round(statistics.median(v), 3) for k, v in results.items() if v
    }
    med["total"] = round(sum(med.values()), 3)
    print(json.dumps({"medians": med}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
