"""Subpackage mirror of ``cugraph.experimental`` (names un-prefixed, as the
reference re-exports them).

``MGPropertyGraph`` is the same class as ``PropertyGraph`` here: the dask
MG variant exists in the reference only because its SG frames are
single-device, while every Spark frame is already distributed.
``PropertySelection``/``BulkSampler`` are NOT mirrored: selections here are
plain DataFrames by design (property_graph.py docstring), and the gnn
bulk-sampler family is out of scope per SURVEY §2.6 (torch/DGL absent).
"""
from .api import find_bicliques, jaccard, overlap, sorensen  # noqa: F401
from .api import strong_connected_component, triangle_count  # noqa: F401
from .property_graph import PropertyGraph  # noqa: F401

MGPropertyGraph = PropertyGraph
