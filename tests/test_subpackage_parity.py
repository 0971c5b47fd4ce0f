"""Subpackage-level import parity + NumberMap behavior.

The reference supports ``from cugraph.community import louvain`` style
imports; every name each reference subpackage ``__init__`` exports must
resolve on the same-named ``cugraph_spark`` module.
"""

from __future__ import annotations

import importlib
import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REF = Path("/root/reference/python/cugraph/cugraph")

SUBPACKAGES = [
    "community", "centrality", "components", "cores", "link_analysis",
    "link_prediction", "traversal", "sampling", "structure", "tree",
    "linear_assignment", "layout", "generators", "utilities",
]

# names whose reference home is a namespace detail we deliberately do not
# mirror (none currently)
EXCLUDE: set[str] = set()


def _exports(pkg: str) -> set[str]:
    txt = (REF / pkg / "__init__.py").read_text()
    names: set[str] = set()
    # absolute (from cugraph.x import ...) and relative (from .x import ...)
    for m in re.finditer(
        r"from\s+(?:cugraph|\.)[\w.]*\s+import\s+\(([^)]*)\)", txt
    ):
        names.update(t.strip() for t in m.group(1).split(",") if t.strip())
    for m in re.finditer(
        r"^from\s+(?:cugraph|\.)[\w.]*\s+import\s+([\w, ]+?)\s*$", txt, re.M
    ):
        names.update(t.strip() for t in m.group(1).split(",") if t.strip())
    return names - EXCLUDE


@pytest.mark.parametrize("pkg", SUBPACKAGES)
def test_subpackage_exports_resolve(pkg):
    wanted = _exports(pkg)
    assert wanted, f"failed to parse reference {pkg}/__init__.py"
    mod = importlib.import_module(f"cugraph_spark.{pkg}")
    missing = sorted(n for n in wanted if not hasattr(mod, n))
    assert missing == [], f"cugraph_spark.{pkg} missing: {missing}"


# ---------------------------------------------------------------- NumberMap
def test_number_map_renumber_roundtrip(spark):
    from cugraph_spark.number_map import NumberMap

    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 3.0)],
        "s STRING, d STRING, w DOUBLE",
    )
    ren, nm = NumberMap.renumber(df, "s", "d")
    assert set(ren.columns) == {"renumbered_src", "renumbered_dst", "w"}
    assert nm.vertex_column_size() == 1
    ids = {r["id"] for r in nm.to_internal_vertex_id(
        spark.createDataFrame([("a",), ("b",), ("c",)], ["v"]), ["v"]
    ).collect()}
    assert ids == {0, 1, 2}

    withid = nm.add_internal_vertex_id(
        spark.createDataFrame([("c", 9), ("a", 7)], "v STRING, x LONG"),
        "vid", ["v"], drop=False, preserve_order=True,
    )
    rows = withid.collect()
    assert [r["v"] for r in rows] == ["c", "a"]  # preserve_order
    assert all(r["vid"] is not None for r in rows)

    # unrenumber restores external ids under the same column name
    back = nm.unrenumber(
        ren.select(F.col("renumbered_src").alias("vertex")), "vertex"
    )
    assert {r["vertex"] for r in back.collect()} == {"a", "b"}
    out, names = nm.unrenumber(
        ren.select(F.col("renumbered_src").alias("vertex")), "vertex",
        get_column_names=True,
    )
    assert names == ["vertex"]


def test_number_map_multi_column_keys(spark):
    from cugraph_spark.number_map import NumberMap

    df = spark.createDataFrame(
        [("a", 1, "b", 2), ("b", 2, "c", 3)],
        "s1 STRING, s2 LONG, d1 STRING, d2 LONG",
    )
    ren, nm = NumberMap.renumber(df, ["s1", "s2"], ["d1", "d2"])
    assert nm.vertex_column_size() == 2
    assert ren.count() == 2
    # from_internal_vertex_id expands to '0'..'n-1' by default (reference)
    ext = nm.from_internal_vertex_id(
        ren.select(F.col("renumbered_src").alias("id")), "id"
    )
    assert "0" in ext.columns and "1" in ext.columns
    vals = {(r["0"], r["1"]) for r in ext.collect()}
    assert vals == {("a", 1), ("b", 2)}
