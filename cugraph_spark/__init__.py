"""cugraph_spark — a from-scratch PySpark-native link-graph analytics engine
with the query and data-processing capabilities of the reference
(stadlmax/cugraph), re-expressed Spark-first: DataFrame/SQL plans, Arrow
pandas-UDF kernels, explicit partitioning/skew handling, per-iteration
checkpointing. Not a port — see SURVEY.md for the mapping.
"""

from . import csr, multimodal, text, vector
from .graph import GraphProperties, LinkGraph, symmetrize_edges
from .graph_classes import BiPartiteGraph, NPartiteGraph, Tree
from .session import get_spark

__all__ = [
    "LinkGraph",
    "GraphProperties",
    "symmetrize_edges",
    "Tree",
    "NPartiteGraph",
    "BiPartiteGraph",
    "get_spark",
    "text",
    "vector",
    "multimodal",
    "csr",
]
__version__ = "0.1.0"
