"""Subpackage mirror of ``cugraph.components``."""
from .api import (  # noqa: F401
    connected_components,
    strongly_connected_components,
    weakly_connected_components,
)
