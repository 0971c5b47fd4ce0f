"""Subpackage mirror of ``cugraph.experimental`` (names un-prefixed, as the
reference re-exports them).

``MGPropertyGraph`` is the same class as ``PropertyGraph`` here: the dask
MG variant exists in the reference only because its SG frames are
single-device, while every Spark frame is already distributed.
``PropertySelection`` is NOT mirrored: selections here are plain
DataFrames by design (property_graph.py docstring). ``BulkSampler``
(reference ``experimental/gnn/__init__.py``) routes to the Spark-native
:mod:`cugraph_spark.gnn` implementation.
"""
from .api import find_bicliques, jaccard, overlap, sorensen  # noqa: F401
from .api import strong_connected_component, triangle_count  # noqa: F401
from .gnn import BulkSampler  # noqa: F401
from .property_graph import PropertyGraph  # noqa: F401

MGPropertyGraph = PropertyGraph
