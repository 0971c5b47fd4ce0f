"""Typed graph classes: ``Tree``, ``NPartiteGraph``, ``BiPartiteGraph``.

Reference parity: ``structure/graph_classes.py:824-1023``.  In the
reference these are thin subclasses of ``Graph`` that (a) set a
property flag in the constructor and (b) keep a host-side dict of named
partition node sets fed by ``add_nodes_from(nodes, bipartite=...,
multipartite=...)`` and read back by ``sets()``
(``graph_implementation/npartiteGraph.py:40-101``).  The Spark version
keeps each partition as a DataFrame so ``sets()`` stays distributed:
the reference computes the implicit bipartite "bottom" set with a
host-side python ``set()`` difference (npartiteGraph.py:55-58) — here
it is a left-anti join, so a billion-vertex bottom set never lands on
the driver.

Like the reference, ``sets()`` trusts the user's registrations and does
not run a coloring pass ("This does not parse the graph to compute
bipartite sets"); ``Tree`` adds an opt-in structural validation the
reference leaves as a TODO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .graph import LinkGraph, _nodes_frame


class Tree(LinkGraph):
    """A tree (reference ``graph_classes.py:824-831``: flag-only)."""

    @classmethod
    def from_edges(cls, *args, **kwargs):
        g = super().from_edges(*args, **kwargs)
        g.properties.tree = True
        return g

    def is_tree(self, validate: bool = False) -> bool:
        """Flag by default (reference parity).  ``validate=True`` runs the
        structural check the reference TODOs: connected and |E| = |V|−1
        (one WCC pass + two counts — no driver-side materialization)."""
        if not validate:
            return self.properties.tree
        from .operators.wcc import weakly_connected_components

        v = self.number_of_vertices()
        e = self.number_of_edges()
        logical_e = e if self.is_directed() else e // 2
        if logical_e != v - 1:
            return False
        comps = weakly_connected_components(self)
        return comps.select("labels").distinct().count() == 1


class NPartiteGraph(LinkGraph):
    """N-partite graph (reference ``graph_classes.py:834-1008``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._node_sets: dict[str, DataFrame] = {}
        self.properties.multipartite = True

    @classmethod
    def from_edges(cls, *args, **kwargs):
        g = super().from_edges(*args, **kwargs)
        g.properties.multipartite = True
        return g

    def add_nodes_from(self, nodes, bipartite=None, multipartite=None) -> None:
        """Register a named partition (reference
        ``npartiteGraph.py:63-101``, same error contract)."""
        if bipartite is None and multipartite is None:
            raise Exception("Partition not provided")
        set_names = list(self._node_sets.keys())
        if multipartite is not None:
            if self.properties.bipartite:
                raise Exception(
                    "The Graph is bipartite. Use bipartite option instead."
                )
        elif bipartite is not None:
            if not self.properties.bipartite:
                raise Exception(
                    "The Graph is set as npartite. Use multipartite option instead."
                )
            multipartite = bipartite
            if multipartite not in set_names and len(set_names) == 2:
                raise Exception(
                    "The Graph is set as bipartite and "
                    "already has two partitions initialized."
                )
        self._node_sets[multipartite] = _nodes_frame(self.spark, nodes)

    def sets(self):
        """Bipartite: ``(top, bottom)`` DataFrames — ``bottom`` defaults to
        the anti-join complement of ``top`` when only one partition was
        registered (reference npartiteGraph.py:49-58, host ``set()`` diff
        → distributed left-anti).  Multipartite: ``{name: DF[vertex]}``."""
        set_names = list(self._node_sets.keys())
        if self.properties.bipartite:
            if not set_names:
                raise Exception("Partition not provided")
            top = self._node_sets[set_names[0]]
            if len(set_names) == 2:
                bottom = self._node_sets[set_names[1]]
            else:
                bottom = self.nodes().join(top, "vertex", "left_anti")
            return top, bottom
        return dict(self._node_sets)

    def is_multipartite(self) -> bool:
        return True

    @classmethod
    def from_cudf_edgelist(
        cls,
        input_df,
        source: str = "source",
        destination: str = "destination",
        edge_attr=None,
        renumber: bool = True,
    ):
        """Reference ``graph_classes.py:842-917`` — the partite classes
        build from a distributed edge frame like Graph does."""
        return cls.from_edges(
            input_df,
            src=source,
            dst=destination,
            weight=edge_attr,
            directed=False,
            renumber=renumber,
        )

    # The reference raises TypeError("Distributed N-partite graph not
    # supported") here (graph_classes.py:918-968) because its dask layer
    # never grew partite support; a Spark DataFrame is already distributed,
    # so the same build just works.
    from_dask_cudf_edgelist = from_cudf_edgelist


class BiPartiteGraph(NPartiteGraph):
    """Bipartite graph (reference ``graph_classes.py:1011-1023``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.properties.bipartite = True

    @classmethod
    def from_edges(cls, *args, **kwargs):
        g = super().from_edges(*args, **kwargs)
        g.properties.bipartite = True
        return g

    def is_bipartite(self) -> bool:
        return True
