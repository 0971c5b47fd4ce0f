"""Subpackage mirror of ``cugraph.sampling``."""
from .api import (  # noqa: F401
    biased_random_walks,
    node2vec,
    random_walks,
    rw_path,
    uniform_neighbor_sample,
)
