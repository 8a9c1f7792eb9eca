from planar_spark.kernels.pagerank import pagerank
from planar_spark.kernels.components import connected_components, incremental_wcc
from planar_spark.kernels.ppr import personalized_pagerank
from planar_spark.kernels.scc import bowtie_regions, strongly_connected_components
from planar_spark.kernels.triangles import local_clustering
from planar_spark.kernels.wpagerank import weighted_pagerank
from planar_spark.kernels.louvain import louvain
from planar_spark.kernels.lpa import label_propagation
from planar_spark.kernels.triangles import triangle_count, triangle_count_per_vertex
from planar_spark.kernels.sssp import bfs_sssp, sssp_with_unreached, weighted_sssp
from planar_spark.kernels.mst import boruvka_msf
from planar_spark.kernels.coloring import greedy_coloring
from planar_spark.kernels.gnn import gnn_forward
from planar_spark.kernels.hits import hits
from planar_spark.kernels.neighborhood import node2vec_walk, random_walk
from planar_spark.kernels.kcore import core_decomposition, k_core
from planar_spark.kernels.betweenness import betweenness, top_degree_sources
from planar_spark.kernels.embeddings import embedding_ivf_topk, kmeans_embeddings
from planar_spark.kernels.densest import densest_subgraph
from planar_spark.kernels.truss import k_truss, truss_decomposition
from planar_spark.kernels.graphstats import (
    degree_assortativity,
    degree_histogram,
    powerlaw_alpha,
    reciprocity,
    sample_edges,
    triad_census,
)
from planar_spark.kernels.hyperball import (
    closeness_centrality,
    distance_histogram,
    effective_diameter,
    effective_diameter_approx,
    harmonic_centrality,
    hyperball,
    hyperball_centralities,
    hyperball_nf_profile,
    neighborhood_function_exact,
)

__all__ = [
    "node2vec_walk",
    "random_walk",
    "core_decomposition",
    "k_core",
    "betweenness",
    "top_degree_sources",
    "densest_subgraph",
    "k_truss",
    "truss_decomposition",
    "weighted_sssp",
    "degree_assortativity",
    "degree_histogram",
    "powerlaw_alpha",
    "reciprocity",
    "sample_edges",
    "triad_census",
    "closeness_centrality",
    "distance_histogram",
    "effective_diameter",
    "effective_diameter_approx",
    "harmonic_centrality",
    "hyperball",
    "hyperball_centralities",
    "hyperball_nf_profile",
    "neighborhood_function_exact",
    "hits",
    "incremental_wcc",
    "personalized_pagerank",
    "strongly_connected_components",
    "bowtie_regions",
    "local_clustering",
    "weighted_pagerank",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_count_per_vertex",
    "bfs_sssp",
    "sssp_with_unreached",
    "boruvka_msf",
    "greedy_coloring",
    "gnn_forward",
]
