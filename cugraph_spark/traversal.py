"""Subpackage mirror of ``cugraph.traversal``."""
from .api import (  # noqa: F401
    bfs,
    bfs_edges,
    concurrent_bfs,
    filter_unreachable,
    multi_source_bfs,
    shortest_path,
    shortest_path_length,
    sssp,
)
