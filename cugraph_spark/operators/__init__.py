from .betweenness import betweenness_centrality
from .centrality import (
    degree_centrality,
    eigenvector_centrality,
    hits,
    katz_centrality,
)
from .mst import minimum_spanning_tree
from .cores import core_number, k_core
from .ktruss import k_truss
from .louvain import louvain
from .lpa import label_propagation
from .sampling import node2vec, random_walks
from .scc import strongly_connected_components
from .pagerank import PageRankResult, pagerank
from .similarity import jaccard, overlap, sorensen
from .structure import (
    ego_graph,
    induced_subgraph,
    select_random_vertices,
    two_hop_neighbors,
    uniform_neighbor_sample,
)
from .traversal import bfs, sssp
from .triangles import total_triangles, triangle_count
from .wcc import weakly_connected_components

__all__ = [
    "pagerank",
    "PageRankResult",
    "weakly_connected_components",
    "label_propagation",
    "triangle_count",
    "total_triangles",
    "bfs",
    "sssp",
    "jaccard",
    "overlap",
    "sorensen",
    "degree_centrality",
    "hits",
    "katz_centrality",
    "eigenvector_centrality",
    "core_number",
    "k_core",
    "two_hop_neighbors",
    "induced_subgraph",
    "ego_graph",
    "select_random_vertices",
    "uniform_neighbor_sample",
    "k_truss",
    "louvain",
    "random_walks",
    "node2vec",
    "strongly_connected_components",
    "betweenness_centrality",
    "minimum_spanning_tree",
]
