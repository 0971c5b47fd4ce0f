from .betweenness import betweenness_centrality, edge_betweenness_centrality
from .centrality import (
    degree_centrality,
    eigenvector_centrality,
    hits,
    katz_centrality,
)
from .lap import dense_hungarian, hungarian
from .layout import attraction_at_hash_init, force_atlas2
from .mst import minimum_spanning_tree
from .cores import core_number, k_core
from .ecg import ecg
from .ktruss import k_truss
from .leiden import leiden
from .louvain import louvain
from .lpa import label_propagation
from .sampling import biased_random_walks, node2vec, random_walks
from .scc import strongly_connected_components
from .spectral import (
    analyze_clustering_edge_cut,
    analyze_clustering_modularity,
    analyze_clustering_ratio_cut,
    clustering_score_frame,
    spectral_balanced_cut_clustering,
    spectral_modularity_maximization_clustering,
)
from .pagerank import PageRankResult, pagerank
from .similarity import (
    jaccard,
    jaccard_w,
    overlap,
    overlap_w,
    sorensen,
    sorensen_w,
)
from .structure import (
    batched_ego_graphs,
    ego_graph,
    induced_subgraph,
    select_random_vertices,
    two_hop_neighbors,
    uniform_neighbor_sample,
)
from .traversal import (
    bfs,
    filter_unreachable,
    get_traversed_path,
    get_traversed_path_list,
    shortest_path_length,
    sssp,
)
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
    "filter_unreachable",
    "shortest_path_length",
    "get_traversed_path",
    "get_traversed_path_list",
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
    "batched_ego_graphs",
    "select_random_vertices",
    "uniform_neighbor_sample",
    "k_truss",
    "louvain",
    "ecg",
    "random_walks",
    "biased_random_walks",
    "node2vec",
    "strongly_connected_components",
    "betweenness_centrality",
    "edge_betweenness_centrality",
    "leiden",
    "jaccard_w",
    "overlap_w",
    "sorensen_w",
    "minimum_spanning_tree",
    "spectral_balanced_cut_clustering",
    "spectral_modularity_maximization_clustering",
    "analyze_clustering_modularity",
    "analyze_clustering_edge_cut",
    "analyze_clustering_ratio_cut",
    "clustering_score_frame",
    "hungarian",
    "dense_hungarian",
    "force_atlas2",
    "attraction_at_hash_init",
]
