"""Subpackage mirror of ``cugraph.tree``."""
from .api import maximum_spanning_tree, minimum_spanning_tree  # noqa: F401
