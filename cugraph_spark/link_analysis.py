"""Subpackage mirror of ``cugraph.link_analysis``."""
from .api import hits, pagerank  # noqa: F401
