"""GraphTables — the engine's data model.

The reference stores a graph as partitioned CSR blocks + a dense vertex
state array (core/data_structures/graph/mutable_csr_graph.h:86-141,
nvme/data_structures/graph/pram_block.h:87-94). Our equivalents:

- ``edges(src long, dst long)``   — hash-partitioned by src (the analogue
  of the reference's vertex-cut buckets, tools/graph_partitioner/
  partitioner/hash_based_vertexcut.cpp:43-46).
- ``vertices(url string, vid long)`` — the dictionary (dense 0..N-1 ids,
  analogue of graph_converter.cpp:126-144's dense remap).
- ``degrees(vid long, out_deg long)`` — cached aggregate; the reference
  keeps per-vertex degree arrays in every CSR block.

Columnar parquet + Catalyst replace the hand-built CSR: per-partition
adjacency is just the co-partitioned edges DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class GraphTables:
    edges: DataFrame            # (src, dst), self-loops removed
    vertices: DataFrame         # (url, vid) — may be vid-only (url null)
    degrees: DataFrame          # (vid, out_deg) — one row per vertex, 0 for dangling
    num_vertices: int
    num_edges: int
    # Set by with_partitioning: vertex ids are region-major (a locality
    # block = the id range [k*block_size, (k+1)*block_size)), and
    # layout-aware kernels switch to block-pinned gathers (graph/
    # locality.py). None = plain hash layout.
    block_size: int | None = None

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession

    def with_partitioning(
        self,
        strategy: str = "bfs_vertex_cut",
        num_partitions: int = 32,
        blocks_per_partition: int = 8,
        **kw,
    ) -> tuple["GraphTables", DataFrame]:
        """Rebuild this graph in a locality layout (T3/T4/T6 region-
        major relabel; see graph/locality.py). Returns (new graph with
        ``block_size`` set, mapping(vid, new_vid))."""
        from planar_spark.graph.locality import with_partitioning

        return with_partitioning(
            self, strategy, num_partitions, blocks_per_partition, **kw
        )

    def cache(self) -> "GraphTables":
        self.edges.persist()
        self.degrees.persist()
        return self

    def unpersist(self) -> None:
        self.edges.unpersist()
        self.degrees.unpersist()

    # ---- undirected closure (used by CC / LPA / triangles) ----
    def undirected_edges(self) -> DataFrame:
        """Distinct undirected edge set as canonical (a < b) pairs."""
        e = self.edges
        return (
            e.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def symmetric_edges(self) -> DataFrame:
        """Both directions of the distinct undirected edge set."""
        u = self.undirected_edges()
        return u.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
            u.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )

    def symmetric_edges_by_src(self, num_partitions: int) -> DataFrame:
        """Both directions of the distinct undirected edge set, hash-
        partitioned by src, src-sorted within partitions — the layout
        every gather cache wants. The union is repartitioned by src
        FIRST, so the (src, dst) dedup runs partition-locally
        (hash(src) satisfies the subset-key clustering) — ONE exchange
        total where ``symmetric_edges().repartition(...)`` pays two
        (the distinct's plus the repartition's). Set-identical
        (noop-isolated A/B at sf0.1: 0.49 -> 0.27s; r8). Caller
        persists."""
        e = self.edges
        u = e.select("src", "dst").unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return (
            u.repartition(num_partitions, "src")
            .dropDuplicates(["src", "dst"])
            .sortWithinPartitions("src")
        )

    # ---- persistence (catalog-aware: Iceberg writeTo when a catalog is
    # configured, parquet warehouse fallback — planar_spark/storage.py) ----
    def write(self, path: str, mode: str = "overwrite") -> None:
        from planar_spark.storage import TableStore

        store = TableStore(self.spark, path)
        # edges bucketed+sorted by src: any later session re-reading the
        # graph gets zero-exchange gathers on the join key for free
        # (catalog-permitting; see TableStore.write)
        store.write(self.edges, "edges", mode, bucket_by="src")
        store.write(self.vertices, "vertices", mode)
        store.write(self.degrees, "degrees", mode, bucket_by="vid")
        store.write_meta(
            "graph",
            {"num_vertices": self.num_vertices, "num_edges": self.num_edges},
        )

    @classmethod
    def read(cls, spark: SparkSession, path: str) -> "GraphTables":
        from planar_spark.storage import TableStore

        store = TableStore(spark, path)
        meta = store.read_meta("graph") or {}
        return cls(
            edges=store.read("edges"),
            vertices=store.read("vertices"),
            degrees=store.read("degrees"),
            num_vertices=meta["num_vertices"],
            num_edges=meta["num_edges"],
        )

    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        num_partitions: int = 32,
        vertices: DataFrame | None = None,
        drop_self_loops: bool = True,
    ) -> "GraphTables":
        """Build a GraphTables from an (src, dst) DataFrame.

        Vertices default to distinct(src ∪ dst). Self-loops are dropped
        (parity with graph_converter.cpp:113). Edges are hash-partitioned
        by src so every kernel's gather join on src is co-partitioned.
        """
        spark = edges.sparkSession
        if drop_self_loops:
            edges = edges.where(F.col("src") != F.col("dst"))
        # Partition AND sort by src once, then cache: the cached plan
        # keeps both outputPartitioning and outputOrdering, so every
        # superstep's gather merge-join neither re-shuffles nor re-sorts
        # the (large) edge side — only the (small) vertex state moves.
        # This is the DataFrame analogue of the reference storing CSR
        # blocks sorted by vertex id (tools/common/io.cpp:127-135).
        edges = (
            edges.repartition(num_partitions, "src")
            .sortWithinPartitions("src")
            .persist()
        )
        if vertices is None:
            vids = (
                edges.select(F.col("src").alias("vid"))
                .unionAll(edges.select(F.col("dst").alias("vid")))
                .distinct()
            )
            vertices = vids.select(F.lit(None).cast("string").alias("url"), "vid")
        vertices = vertices.persist()
        out_deg = edges.groupBy(F.col("src").alias("vid")).agg(
            F.count(F.lit(1)).alias("out_deg")
        )
        degrees = (
            vertices.select("vid")
            .join(out_deg, "vid", "left")
            .select("vid", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
            .repartition(num_partitions, "vid")
            .persist()
        )
        return cls(
            edges=edges,
            vertices=vertices,
            degrees=degrees,
            num_vertices=vertices.count(),
            num_edges=edges.count(),
        )
