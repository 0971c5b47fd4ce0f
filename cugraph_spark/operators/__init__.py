from .lpa import label_propagation
from .pagerank import PageRankResult, pagerank
from .triangles import total_triangles, triangle_count
from .wcc import weakly_connected_components

__all__ = [
    "pagerank",
    "PageRankResult",
    "weakly_connected_components",
    "label_propagation",
    "triangle_count",
    "total_triangles",
]
