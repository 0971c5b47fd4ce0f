from .pagerank import PageRankResult, pagerank

__all__ = ["pagerank", "PageRankResult"]
