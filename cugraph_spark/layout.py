"""Subpackage mirror of ``cugraph.layout``."""
from .api import force_atlas2  # noqa: F401
