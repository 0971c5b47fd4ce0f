"""cugraph_spark — a from-scratch PySpark-native link-graph analytics engine
with the query and data-processing capabilities of the reference
(stadlmax/cugraph), re-expressed Spark-first: DataFrame/SQL plans, Arrow
pandas-UDF kernels, explicit partitioning/skew handling, per-iteration
checkpointing. Not a port — see SURVEY.md for the mapping.
"""

from . import csr, exceptions, gnn, multimodal, store, text, utilities, vector
from . import utilities as utils  # the reference's ``cugraph.utils`` alias
from .utilities import get_traversed_cost, sample_groups
from .exceptions import FailedToConvergeError
from .graph import GraphProperties, LinkGraph, symmetrize_edges
from .graph_classes import BiPartiteGraph, NPartiteGraph, Tree
from .session import get_spark

# Reference-parity surface: every name the reference exports at
# ``cugraph.*`` (python/cugraph/cugraph/__init__.py:14-121) is importable
# at ``cugraph_spark.*`` with the same spelling — see api.py.
from .api import *  # noqa: F401,F403
from .api import REFERENCE_EXPORTS, __all__ as _api_all

__all__ = list(_api_all) + [
    "symmetrize_edges",
    "get_spark",
    "text",
    "vector",
    "multimodal",
    "csr",
    "gnn",
    "store",
    "exceptions",
    "utilities",
    "get_traversed_cost",
    "sample_groups",
    "FailedToConvergeError",
    "REFERENCE_EXPORTS",
]
__version__ = "0.1.0"
