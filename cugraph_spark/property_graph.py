"""PropertyGraph — typed vertex/edge property tables with selection and
subgraph extraction, plus the hypergraph builder.

Reference parity (``python/cugraph/cugraph/structure/property_graph.py``):
- ``add_vertex_data(df, vertex_col_name, type_name)`` / ``add_edge_data``
  accumulate typed property rows (``:594-1100``); the ``_TYPE_``
  discriminator column distinguishes sub-frames.
- ``get_vertex_data(vertex_ids, types, columns)`` / ``get_edge_data``
  (``:1100-1400``).
- ``select_vertices(expr)`` / ``select_edges(expr)`` evaluate a boolean
  expression over property columns (``:1412-1540``) — ours take Spark SQL
  expressions (the idiomatic analog of the reference's pandas-eval
  strings).
- ``extract_subgraph(selection, ...)`` → LinkGraph (``:1542-1740``).
- ``annotate_dataframe`` (``:1741-1800``): join edge properties back onto
  an edge-keyed result frame.
- Hypergraph builder (``structure/hypergraph.py:42-288``): a generic
  DataFrame → bipartite row-node/value-node graph via melt + union.

Everything is pure DataFrame composition: property tables are unioned
lazily by type, selections are Catalyst filters (predicate pushdown
reaches the parquet scan for free), extraction is filter + join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph import LinkGraph

TYPE_COL = "_TYPE_"
VERTEX_COL = "_VERTEX_"
SRC_COL = "_SRC_"
DST_COL = "_DST_"
EDGE_ID_COL = "_EDGE_ID_"


class PropertyGraph:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._vertex_frames: dict[str, DataFrame] = {}
        self._edge_frames: dict[str, DataFrame] = {}
        self._edge_id_counter = 0

    # ------------------------------------------------------------- mutation
    @staticmethod
    def _pack_vectors(frame: DataFrame, vector_properties) -> DataFrame:
        """Pack scalar columns into array-typed vector properties
        (reference ``add_vertex_data(vector_properties=...)``: fixed-size
        list columns consumed by ``*_vector_property_to_array``)."""
        for name, cols in (vector_properties or {}).items():
            frame = frame.withColumn(
                name, F.array(*[F.col(c).cast("double") for c in cols])
            ).drop(*cols)
        return frame

    def add_vertex_data(
        self,
        df: DataFrame,
        vertex_col_name: str,
        type_name: str = "",
        vector_properties: dict | None = None,
    ) -> None:
        """Accumulate a typed vertex property frame
        (reference ``property_graph.py:594-860``)."""
        frame = df.withColumnRenamed(vertex_col_name, VERTEX_COL).withColumn(
            TYPE_COL, F.lit(type_name)
        )
        frame = self._pack_vectors(frame, vector_properties)
        if type_name in self._vertex_frames:
            self._vertex_frames[type_name] = self._vertex_frames[
                type_name
            ].unionByName(frame, allowMissingColumns=True)
        else:
            self._vertex_frames[type_name] = frame

    def add_edge_data(
        self,
        df: DataFrame,
        vertex_col_names: tuple,
        type_name: str = "",
        vector_properties: dict | None = None,
    ) -> None:
        """Accumulate a typed edge property frame
        (reference ``property_graph.py:860-1100``). Every edge row gets a
        dense ``_EDGE_ID_`` (reference parity: the edge-id column backs
        ``get_edge_data(edge_ids=...)``), assigned deterministically by
        content rank within the batch + a monotonic base per batch."""
        from .graph import assign_dense_ids

        s, d = vertex_col_names
        frame = (
            df.withColumnRenamed(s, SRC_COL)
            .withColumnRenamed(d, DST_COL)
            .withColumn(TYPE_COL, F.lit(type_name))
        )
        frame = self._pack_vectors(frame, vector_properties)
        frame = assign_dense_ids(
            frame, [F.col(SRC_COL), F.col(DST_COL)], EDGE_ID_COL
        )
        n = frame.count()
        frame = frame.withColumn(
            EDGE_ID_COL, F.col(EDGE_ID_COL) + F.lit(self._edge_id_counter)
        )
        self._edge_id_counter += n
        if type_name in self._edge_frames:
            self._edge_frames[type_name] = self._edge_frames[type_name].unionByName(
                frame, allowMissingColumns=True
            )
        else:
            self._edge_frames[type_name] = frame

    # -------------------------------------------------------------- access
    @property
    def vertex_types(self) -> set:
        return set(self._vertex_frames)

    @property
    def edge_types(self) -> set:
        return set(self._edge_frames)

    @property
    def edges(self) -> DataFrame | None:
        """DF[_EDGE_ID_, _SRC_, _DST_] — endpoints only, no properties
        (reference ``edges`` property)."""
        ed = self._union_all(self._edge_frames)
        if ed is None:
            return None
        return ed.select(EDGE_ID_COL, SRC_COL, DST_COL)

    @property
    def vertex_property_names(self) -> list:
        """Property column names across all vertex frames, excluding the
        vertex id and type discriminator (reference property)."""
        names: list[str] = []
        for f in self._vertex_frames.values():
            for c in f.columns:
                if c not in (VERTEX_COL, TYPE_COL) and c not in names:
                    names.append(c)
        return names

    @property
    def edge_property_names(self) -> list:
        """Property column names across all edge frames, excluding
        endpoints, edge id, and type (reference property)."""
        names: list[str] = []
        for f in self._edge_frames.values():
            for c in f.columns:
                if (
                    c not in (SRC_COL, DST_COL, TYPE_COL, EDGE_ID_COL)
                    and c not in names
                ):
                    names.append(c)
        return names

    def get_vertices(self, selection=None) -> DataFrame:
        """DF[vertex] — distinct vertex ids from BOTH the vertex and edge
        property data, ascending (reference ``get_vertices``; like it,
        ``selection`` is not yet supported)."""
        if selection is not None:
            raise NotImplementedError(
                "selection is not yet supported (reference parity)"
            )
        parts = []
        vd = self.get_vertex_data()
        if vd is not None:
            parts.append(vd.select(F.col(VERTEX_COL).alias("vertex")))
        ed = self._union_all(self._edge_frames)
        if ed is not None:
            parts.append(ed.select(F.col(SRC_COL).alias("vertex")))
            parts.append(ed.select(F.col(DST_COL).alias("vertex")))
        if not parts:
            return self.spark.createDataFrame([], "vertex LONG")
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out.distinct().orderBy("vertex")

    def vertices_ids(self) -> DataFrame:
        """Alias for :meth:`get_vertices` (reference alias)."""
        return self.get_vertices()

    @classmethod
    def has_duplicate_edges(cls, df: DataFrame, columns=None) -> bool:
        """True if ``df`` has rows sharing (src, dst, type) plus ``columns``
        (reference classmethod)."""
        keys = [SRC_COL, DST_COL]
        if TYPE_COL in df.columns:
            keys.append(TYPE_COL)
        keys += list(columns or [])
        return (
            df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
            > 0
        )

    @classmethod
    def is_multigraph_frame(cls, df: DataFrame) -> bool:
        """True if ``df`` holds parallel (src, dst) edges (the reference
        exposes this as the classmethod ``is_multigraph(df)``; renamed
        suffix avoids clashing with the instance predicate below — the
        bare name still dispatches on the argument)."""
        return (
            df.groupBy(SRC_COL, DST_COL)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
            > 0
        )

    def is_multigraph(self, df: DataFrame | None = None) -> bool:
        """Reference ``is_multigraph(df)`` is a classmethod over a frame;
        called with no argument this reports whether THIS graph's edge data
        holds parallel edges."""
        frame = df if df is not None else self._union_all(self._edge_frames)
        if frame is None:
            return False
        return self.is_multigraph_frame(frame)

    def is_multi_gpu(self) -> bool:
        """Reference parity: ``PropertyGraph.is_multi_gpu`` is always False
        (the MG variant is a separate class there). The property frames
        here are nevertheless ordinary distributed Spark DataFrames."""
        return False

    def vertex_types_from_numerals(self, nums) -> list:
        """Numeric type codes → type-name strings (reference maps through
        the categorical dtype's categories; the analog of categories here
        is the sorted type-name list)."""
        cats = sorted(self._vertex_frames)
        return [cats[int(n)] for n in nums]

    def edge_types_from_numerals(self, nums) -> list:
        cats = sorted(self._edge_frames)
        return [cats[int(n)] for n in nums]

    @staticmethod
    def _vector_property_to_array(df: DataFrame, col_name, fillvalue, missing):
        import numpy as np

        t = df.schema[col_name].dataType
        if not t.typeName() == "array":
            raise TypeError(f"{col_name!r} is not a vector (array) property")
        rows = df.select(col_name).collect()
        vals = [r[0] for r in rows]
        dim = next((len(v) for v in vals if v is not None), None)
        if any(v is None for v in vals):
            if fillvalue is not None:
                fill = (
                    list(fillvalue)
                    if isinstance(fillvalue, (list, tuple))
                    else [fillvalue] * (dim or 0)
                )
                vals = [fill if v is None else v for v in vals]
            elif missing == "error":
                raise ValueError(f"missing vector data in {col_name!r}")
            else:
                vals = [v for v in vals if v is not None]
        return np.asarray(vals, dtype=float)

    def vertex_vector_property_to_array(
        self, df: DataFrame, col_name, fillvalue=None, *, missing="ignore"
    ):
        """Array-typed vertex property column → numpy ndarray (reference
        ``vertex_vector_property_to_array``; driver-side by definition —
        the reference likewise materializes a dense cupy array)."""
        return self._vector_property_to_array(df, col_name, fillvalue, missing)

    def edge_vector_property_to_array(
        self, df: DataFrame, col_name, fillvalue=None, *, missing="ignore"
    ):
        return self._vector_property_to_array(df, col_name, fillvalue, missing)

    def _union_all(self, frames: dict[str, DataFrame], types=None) -> DataFrame | None:
        keys = sorted(frames) if types is None else [t for t in sorted(frames) if t in set(types)]
        out = None
        for k in keys:
            out = frames[k] if out is None else out.unionByName(
                frames[k], allowMissingColumns=True
            )
        return out

    def get_vertex_data(
        self, vertex_ids=None, types=None, columns=None
    ) -> DataFrame | None:
        df = self._union_all(self._vertex_frames, types)
        if df is None:
            return None
        if vertex_ids is not None:
            df = df.filter(F.col(VERTEX_COL).isin(list(vertex_ids)))
        if columns is not None:
            df = df.select(VERTEX_COL, TYPE_COL, *columns)
        return df

    def get_edge_data(self, edge_ids=None, types=None, columns=None) -> DataFrame | None:
        """Edge property rows, optionally filtered by ``edge_ids`` and
        ``types`` and projected to ``columns`` (reference
        ``get_edge_data(edge_ids, types, columns)``)."""
        df = self._union_all(self._edge_frames, types)
        if df is None:
            return None
        if edge_ids is not None:
            df = df.filter(F.col(EDGE_ID_COL).isin([int(i) for i in edge_ids]))
        if columns is not None:
            df = df.select(EDGE_ID_COL, SRC_COL, DST_COL, TYPE_COL, *columns)
        return df

    def get_num_vertices(self) -> int:
        vd = self.get_vertex_data()
        ed = self.get_edge_data()
        parts = []
        if vd is not None:
            parts.append(vd.select(F.col(VERTEX_COL).alias("v")))
        if ed is not None:
            parts.append(ed.select(F.col(SRC_COL).alias("v")))
            parts.append(ed.select(F.col(DST_COL).alias("v")))
        if not parts:
            return 0
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out.distinct().count()

    def get_num_edges(self) -> int:
        ed = self.get_edge_data()
        return 0 if ed is None else ed.count()

    # ----------------------------------------------------------- selection
    def select_vertices(self, expr: str, from_previous_selection: DataFrame | None = None) -> DataFrame:
        """Vertices whose property rows satisfy the Spark SQL boolean
        ``expr`` (reference ``select_vertices``, ``:1412-1492``)."""
        base = from_previous_selection or self.get_vertex_data()
        if base is None:
            raise ValueError("no vertex data")
        return base.filter(F.expr(expr)).select(VERTEX_COL).distinct()

    def select_edges(self, expr: str) -> DataFrame:
        """Edge rows satisfying ``expr`` (reference ``:1494-1540``)."""
        base = self.get_edge_data()
        if base is None:
            raise ValueError("no edge data")
        return base.filter(F.expr(expr))

    # ---------------------------------------------------------- extraction
    def extract_subgraph(
        self,
        selection: DataFrame | None = None,
        create_using: dict | None = None,
        edge_weight_property: str | None = None,
        allow_multi_edges: bool = False,
    ) -> LinkGraph:
        """Build a LinkGraph from (optionally selected) edge rows
        (reference ``extract_subgraph``, ``:1542-1740``). ``selection`` is
        an edge-row DataFrame from :meth:`select_edges`; None = all edges."""
        edges = selection if selection is not None else self.get_edge_data()
        if edges is None:
            raise ValueError("no edge data")
        cols = [F.col(SRC_COL).alias("src"), F.col(DST_COL).alias("dst")]
        weight = None
        if edge_weight_property is not None:
            cols.append(F.col(edge_weight_property).cast("double").alias("weight"))
            weight = "weight"
        opts = dict(create_using or {})
        return LinkGraph.from_edges(
            edges.select(*cols),
            weight=weight,
            directed=opts.get("directed", True),
            dedup=not allow_multi_edges,
        )

    def edge_props_to_graph(
        self,
        edge_prop_df: DataFrame,
        create_using=None,
        edge_weight_property: str | None = None,
        default_edge_weight: float | None = None,
        check_multi_edges: bool = True,
        renumber_graph: bool = True,
        add_edge_data: bool = True,
    ) -> LinkGraph:
        """Build a graph from an edge-prop frame (reference
        ``edge_props_to_graph``): optional multi-edge guard, weight
        property with NA default, directed/multigraph flags taken from
        ``create_using``."""
        directed, multi = True, False
        if create_using is not None:
            inst = (
                create_using() if isinstance(create_using, type) else create_using
            )
            directed = bool(getattr(inst, "directed", True))
            multi = bool(getattr(inst, "_multi", False)) or bool(
                getattr(getattr(inst, "properties", None), "multi_edge", False)
            )
        if check_multi_edges and not multi:
            if self.is_multigraph_frame(edge_prop_df):
                raise RuntimeError(
                    "query resulted in duplicate edges which cannot be "
                    "represented with the non-multigraph create_using"
                )
        cols = [F.col(SRC_COL).alias("src"), F.col(DST_COL).alias("dst")]
        weight = None
        if edge_weight_property is not None:
            w = F.col(edge_weight_property).cast("double")
            if default_edge_weight is not None:
                w = F.coalesce(w, F.lit(float(default_edge_weight)))
            cols.append(w.alias("weight"))
            weight = "weight"
        return LinkGraph.from_edges(
            edge_prop_df.select(*cols),
            weight=weight,
            directed=directed,
            renumber=renumber_graph,
            multigraph=multi,
            dedup=not multi,
        )

    def annotate_dataframe(self, df: DataFrame, edge_vertex_col_names=("src", "dst")) -> DataFrame:
        """Join edge properties onto an edge-keyed frame
        (reference ``annotate_dataframe``, ``:1741-1800``)."""
        s, d = edge_vertex_col_names
        ed = self.get_edge_data()
        if ed is None:
            return df
        # name-based join (never dataset-column references — they resolve
        # ambiguously when the two frames share lineage)
        ed2 = ed.withColumnRenamed(SRC_COL, s).withColumnRenamed(DST_COL, d)
        return df.join(ed2, [s, d], "left")

    # ------------------------------------------------- renumber by type
    def renumber_vertices_by_type(self) -> DataFrame:
        """Re-id vertices so each type occupies a contiguous dense range
        (reference ``renumber_vertices_by_type``): ids ordered by
        (type, old id) via range-partitioned prefix sums; vertex AND edge
        frames are rewritten in place.  Returns DF[type, start, stop]."""
        from .graph import assign_dense_ids

        vd = self.get_vertex_data()
        if vd is None:
            raise ValueError("no vertex data")
        distinct = vd.select(TYPE_COL, VERTEX_COL).distinct()
        mapped = assign_dense_ids(
            distinct,
            [F.col(TYPE_COL).asc(), F.col(VERTEX_COL).asc()],
            "_new_id",
        ).persist()
        mapped.count()
        m = mapped.select(F.col(VERTEX_COL).alias("_old"), "_new_id")
        self._vertex_frames = {
            k: v.join(m, v[VERTEX_COL] == m["_old"])
            .drop(VERTEX_COL, "_old")
            .withColumnRenamed("_new_id", VERTEX_COL)
            for k, v in self._vertex_frames.items()
        }
        ms = m.withColumnRenamed("_old", "_olds").withColumnRenamed("_new_id", "_news")
        md = m.withColumnRenamed("_old", "_oldd").withColumnRenamed("_new_id", "_newd")
        self._edge_frames = {
            k: v.join(ms, v[SRC_COL] == ms["_olds"])
            .join(md, v[DST_COL] == md["_oldd"])
            .drop(SRC_COL, DST_COL, "_olds", "_oldd")
            .withColumnRenamed("_news", SRC_COL)
            .withColumnRenamed("_newd", DST_COL)
            for k, v in self._edge_frames.items()
        }
        ranges = (
            mapped.groupBy(TYPE_COL)
            .agg(F.min("_new_id").alias("start"), F.max("_new_id").alias("stop"))
            .orderBy(TYPE_COL)
        )
        return ranges

    def renumber_edges_by_type(self) -> DataFrame:
        """Re-id edges so each type occupies a contiguous dense range
        (reference ``renumber_edges_by_type``). Returns DF[type, start, stop]."""
        from .graph import assign_dense_ids

        ed = self._union_all(self._edge_frames)
        if ed is None:
            raise ValueError("no edge data")
        mapped = assign_dense_ids(
            ed.select(TYPE_COL, EDGE_ID_COL).distinct(),
            [F.col(TYPE_COL).asc(), F.col(EDGE_ID_COL).asc()],
            "_new_id",
        ).persist()
        mapped.count()
        m = mapped.select(F.col(EDGE_ID_COL).alias("_old"), "_new_id")
        self._edge_frames = {
            k: v.join(m, v[EDGE_ID_COL] == m["_old"])
            .drop(EDGE_ID_COL, "_old")
            .withColumnRenamed("_new_id", EDGE_ID_COL)
            for k, v in self._edge_frames.items()
        }
        ranges = (
            mapped.groupBy(TYPE_COL)
            .agg(F.min("_new_id").alias("start"), F.max("_new_id").alias("stop"))
            .orderBy(TYPE_COL)
        )
        return ranges

    def fillna_vertices(self, value) -> None:
        self._vertex_frames = {
            k: v.fillna(value) for k, v in self._vertex_frames.items()
        }

    def fillna_edges(self, value) -> None:
        self._edge_frames = {k: v.fillna(value) for k, v in self._edge_frames.items()}


def hypergraph(
    df: DataFrame,
    columns: list | None = None,
    categorical_metadata: bool = True,
    drop_edge_attrs: bool = False,
    row_id_col: str = "_row_id",
) -> dict:
    """Generic DataFrame → bipartite entity graph
    (reference ``structure/hypergraph.py:42-288``): one node per row and
    one node per distinct (column, value); an edge connects each row-node
    to every value-node appearing in it. Pure melt (stack) + union.

    Returns {"edges": DF[src, dst], "nodes": DF[node_id, kind]} with string
    node ids ``row::<i>`` / ``<col>::<value>``.
    """
    cols = columns or [c for c in df.columns if c != row_id_col]
    if row_id_col not in df.columns:
        # deterministic scalable row ids: rank under the content order via
        # range-partitioned prefix sums (assign_dense_ids) — never a global
        # single-partition window, never monotonically_increasing_id
        # (nondeterministic under retries; see graph.py module docstring)
        from .graph import assign_dense_ids

        df = assign_dense_ids(df, [F.col(c) for c in cols], row_id_col)
    melted = None
    for c in cols:
        part = df.select(
            F.concat(F.lit("row::"), F.col(row_id_col).cast("string")).alias("src"),
            F.concat(F.lit(f"{c}::"), F.col(c).cast("string")).alias("dst"),
        ).filter(F.col(c).isNotNull())
        melted = part if melted is None else melted.union(part)
    nodes = (
        melted.select(F.col("src").alias("node_id")).distinct().withColumn("kind", F.lit("row"))
        .union(
            melted.select(F.col("dst").alias("node_id")).distinct().withColumn(
                "kind", F.lit("value")
            )
        )
    )
    return {"edges": melted, "nodes": nodes}
