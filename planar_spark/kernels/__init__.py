from planar_spark.kernels.pagerank import pagerank
from planar_spark.kernels.components import connected_components
from planar_spark.kernels.lpa import label_propagation
from planar_spark.kernels.triangles import triangle_count, triangle_count_per_vertex

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_count_per_vertex",
]
