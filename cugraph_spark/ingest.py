"""Ingest: Common-Crawl-style page table → edge DataFrame.

The reference has no HTML layer (its ingest is ``from_cudf_edgelist``,
``graph_classes.py:107-205``); this stage is mandated by BASELINE.json
``input_hint``: parse href edges from the ``html`` binary column with
vectorized Arrow pandas UDFs — no per-row Python UDFs — and guarantee
byte-identical extracted text per url.

Scale notes: the href UDF is Series→Series over Arrow batches; the ``html``
column is projected only into this stage and never read again afterwards
(column pruning at the parquet/Iceberg scan is critical at CC scale —
SURVEY §4). Output is (src_url, dst_url) pairs via ``explode``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_HREF_RE = re.compile(rb'<a\s[^>]*href="([^"]+)"', re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_BLOCK_RE = re.compile(rb"<(p|div|br|h[1-6]|li|tr)[\s>/]", re.IGNORECASE)


@pandas_udf(T.ArrayType(T.StringType()))
def extract_hrefs(html: pd.Series) -> pd.Series:
    """Vectorized href extraction: html binary → array<string> of hrefs,
    document order preserved (duplicates kept — dedup is the graph
    build's job, per ``symmetrize.py:60-88``)."""

    def _one(b):
        if b is None:
            return []
        return [m.decode("utf-8", "replace") for m in _HREF_RE.findall(bytes(b))]

    return html.map(_one)


def _extract_text_bytes(b: bytes) -> str:
    """The pinned text extractor: title line + block-level text with tags
    stripped. Deterministic pure function of the html bytes — the
    byte-identical-per-url invariant is tested against this exact output."""
    if b is None:
        return ""
    m = _TITLE_RE.search(b)
    title = m.group(1).decode("utf-8", "replace").strip() if m else ""
    body = b.decode("utf-8", "replace")
    # drop head, strip tags, collapse anchor text out (links are navigation)
    body = re.sub(r"(?is)<head>.*?</head>", "", body)
    body = re.sub(r"(?is)<a\s[^>]*>.*?</a>", "", body)
    body = _TAG_RE.sub("\n", body)
    lines = [ln.strip() for ln in body.split("\n") if ln.strip()]
    return "\n".join(([title] if title else []) + lines)


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized main-text extraction (Series→Series over Arrow batches)."""
    return html.map(lambda b: _extract_text_bytes(bytes(b)) if b is not None else "")


def read_pages(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the page table — Iceberg table name if a catalog is configured,
    else a parquet path with the identical schema
    (url, warc_ts, html, text, lang)."""
    if path_or_table.endswith(".parquet") or "/" in path_or_table:
        return spark.read.parquet(path_or_table)
    return spark.read.table(path_or_table)


def pages_to_edges(pages: DataFrame) -> DataFrame:
    """Pages → (src: url string, dst: href string) edge pairs.

    Projects only (url, html) so Catalyst prunes every other column at the
    scan; the html column does not survive past this plan node.
    """
    return (
        pages.select("url", extract_hrefs(F.col("html")).alias("hrefs"))
        .select(F.col("url").alias("src"), F.explode("hrefs").alias("dst"))
    )


def url_edges_to_int(edges: DataFrame) -> DataFrame:
    """For synthetic fixture pages (``https://site{vid}.test/``): recover the
    integer vertex ids without a join — a regexp on the url itself."""
    pat = r"https://site(\d+)\.test/"
    return edges.select(
        F.regexp_extract("src", pat, 1).cast("long").alias("src"),
        F.regexp_extract("dst", pat, 1).cast("long").alias("dst"),
    )
