"""Subpackage mirror of ``cugraph.linear_assignment``."""
from .api import dense_hungarian, hungarian  # noqa: F401
