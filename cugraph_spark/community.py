"""Subpackage mirror of ``cugraph.community`` — same import paths work:
``from cugraph_spark.community import louvain``."""
from .api import (  # noqa: F401
    analyzeClustering_edge_cut,
    analyzeClustering_modularity,
    analyzeClustering_ratio_cut,
    batched_ego_graphs,
    ecg,
    ego_graph,
    induced_subgraph,
    k_truss,
    ktruss_subgraph,
    leiden,
    louvain,
    spectralBalancedCutClustering,
    spectralModularityMaximizationClustering,
    subgraph,
    triangle_count,
)
