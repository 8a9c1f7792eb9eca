"""planar_spark — a PySpark-native link-graph analytics engine.

A from-scratch rebuild of the capabilities of the Planar reference system
(SICS-Fundamental-Research-Center/Planar, a single-machine C++ PRAM-style
graph engine) as iterative DataFrame jobs:

- ingest: Common-Crawl-style pages -> (src_url, dst_url) link extraction
  (vectorized pandas UDFs) -> deterministic url->int64 dictionary encoding
  -> ``edges`` / ``vertices`` / ``degrees`` tables.
- kernels: PageRank (power iteration + dangling-mass redistribution),
  connected components (hash-min + pointer jumping), label propagation,
  triangle counting, BFS/SSSP, k-hop, two-hop stats — each one superstep =
  a shuffle-aware join + keyed aggregation (the DataFrame analogue of the
  reference's ``MapVertex``/``MapEdge`` + ``WriteMin/WriteAdd`` + ``Sync``
  BSP loop, see nvme/apis/block_api.h:99-144 and
  nvme/update_stores/nvme_update_store.h:138-145 in the reference).
- superstep engine: driver loop with per-superstep checkpointing (state +
  lineage + convergence metrics) and resume-from-checkpoint.

Everything is pyspark.sql DataFrames + vectorized Arrow/pandas UDFs; there
is no per-row Python and no RDD code in any hot path.
"""

from planar_spark.config import EngineConfig
from planar_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["EngineConfig", "get_spark", "__version__"]
