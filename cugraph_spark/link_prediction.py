"""Subpackage mirror of ``cugraph.link_prediction``."""
from .api import (  # noqa: F401
    jaccard,
    jaccard_coefficient,
    jaccard_w,
    overlap,
    overlap_coefficient,
    overlap_w,
    sorensen,
    sorensen_coefficient,
    sorensen_w,
)
