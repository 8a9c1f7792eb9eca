"""Deterministic link graph derived from the driver's testdata tables.

The driver's correctness gate compares Spark queries against DuckDB SQL
over the same parquet tables (region/nation/.../lineitem), so the graph
the kernels run on must be derivable identically in both systems. We
dictionary-fold the TPC-H-ish lineitem fact table into a fixed vertex
space:

    src = l_orderkey % 4096,  dst = l_partkey % 4096
    (distinct pairs, self-loops dropped — graph_converter.cpp:113 parity)

At sf=0.01 (~60k lineitems) this yields a dense-ish random digraph over
<=4096 vertices (avg degree ~15) — one giant component, small diameter —
which the unrolled SQL oracles in __spark_entry__ are sized for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from planar_spark.graph.tables import GraphTables

V_MOD = 4096

# The same derivation as ANSI SQL (DuckDB oracle prelude). Every oracle
# query in __spark_entry__ starts from these CTEs.
EDGES_CTE = f"""
edges AS (
    SELECT DISTINCT (l_orderkey % {V_MOD}) AS src, (l_partkey % {V_MOD}) AS dst
    FROM lineitem
    WHERE (l_orderkey % {V_MOD}) <> (l_partkey % {V_MOD})
),
verts AS (
    SELECT DISTINCT v AS vid FROM (
        SELECT src AS v FROM edges UNION SELECT dst AS v FROM edges
    )
)
""".strip()


def derive_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(
            (F.col("l_orderkey") % V_MOD).alias("src"),
            (F.col("l_partkey") % V_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def load_graph(
    spark: SparkSession, sf_dir: str, num_partitions: int = 32
) -> GraphTables:
    return GraphTables.from_edges(
        derive_edges(spark, sf_dir), num_partitions=num_partitions
    )
