"""Subpackage mirror of ``cugraph.cores``."""
from .api import core_number, k_core  # noqa: F401
