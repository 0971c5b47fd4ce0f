"""Subpackage mirror of ``cugraph.centrality``."""
from .api import (  # noqa: F401
    betweenness_centrality,
    degree_centrality,
    edge_betweenness_centrality,
    eigenvector_centrality,
    katz_centrality,
)
