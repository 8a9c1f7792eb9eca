from planar_spark.oracle.numpy_oracle import (
    oracle_pagerank,
    oracle_components,
    oracle_lpa,
    oracle_triangle_count,
    oracle_sssp,
)

__all__ = [
    "oracle_pagerank",
    "oracle_components",
    "oracle_lpa",
    "oracle_triangle_count",
    "oracle_sssp",
]
