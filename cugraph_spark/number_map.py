"""NumberMap — standalone renumbering utility (reference
``structure/number_map.py:24-750``).

The reference's NumberMap is the user-facing renumbering API: build a dense
internal id space over multi-column external keys, translate frames in both
directions, and unrenumber result columns. `LinkGraph.from_edges` embeds the
same recipe (graph.py:300-324); this class exposes it standalone with the
reference's method surface.

Id assignment follows the engine convention everywhere else: dense ids by
(degree DESC, external key ASC) via `assign_dense_ids` — deterministic under
any partitioning, and hot vertices get low ids (the skew-class property the
renumber design note in SURVEY §4 relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import EXT, VID, assign_dense_ids

_BROADCAST_MAX = 5_000_000


def _key_expr(cols: list[str]):
    if len(cols) == 1:
        return F.col(cols[0])
    return F.struct(*[F.col(c).alias(f"k{i}") for i, c in enumerate(cols)])


class NumberMap:
    renumbered_src_col_name = "renumbered_src"
    renumbered_dst_col_name = "renumbered_dst"

    def __init__(self, map_df: DataFrame, n_key_cols: int = 1):
        """``map_df``: DF[ext_id, id] — ext_id is a scalar for single-column
        keys or a struct(k0..kn-1) for multi-column keys."""
        self.map = map_df
        self._n_key_cols = n_key_cols
        self._count: int | None = None

    # ------------------------------------------------------------- build
    @staticmethod
    def renumber(
        df: DataFrame,
        src_col_names,
        dst_col_names,
        preserve_order: bool = False,
        store_transposed: bool = False,
        legacy_renum_only: bool = False,
    ) -> tuple[DataFrame, "NumberMap"]:
        """Reference ``renumber(df, src, dst) → (renumbered_df, NumberMap)``:
        the returned frame carries ``renumbered_src``/``renumbered_dst``
        (original key columns dropped, every other column preserved)."""
        s_cols = (
            list(src_col_names)
            if isinstance(src_col_names, (list, tuple))
            else [src_col_names]
        )
        d_cols = (
            list(dst_col_names)
            if isinstance(dst_col_names, (list, tuple))
            else [dst_col_names]
        )
        if len(s_cols) != len(d_cols):
            raise ValueError("src/dst column lists must have equal length")
        skey, dkey = _key_expr(s_cols), _key_expr(d_cols)
        deg = (
            df.select(skey.alias(EXT))
            .union(df.select(dkey.alias(EXT)))
            .groupBy(EXT)
            .agg(F.count("*").alias("_deg"))
        )
        m = (
            assign_dense_ids(deg, [F.col("_deg").desc(), F.col(EXT).asc()], VID)
            .select(EXT, VID)
            .persist()
        )
        m.count()
        nm = NumberMap(m, len(s_cols))
        ms = m.select(F.col(EXT).alias("_ks"), F.col(VID).alias(NumberMap.renumbered_src_col_name))
        md = m.select(F.col(EXT).alias("_kd"), F.col(VID).alias(NumberMap.renumbered_dst_col_name))
        keep = [c for c in df.columns if c not in s_cols + d_cols]
        out = (
            df.withColumn("_ks", skey)
            .withColumn("_kd", dkey)
            .join(nm._maybe_broadcast(ms), "_ks")
            .join(nm._maybe_broadcast(md), "_kd")
            .select(
                NumberMap.renumbered_src_col_name,
                NumberMap.renumbered_dst_col_name,
                *keep,
            )
        )
        return out, nm

    def _maybe_broadcast(self, frame: DataFrame) -> DataFrame:
        if self._count is None:
            self._count = self.map.count()
        return F.broadcast(frame) if self._count < _BROADCAST_MAX else frame

    def vertex_column_size(self) -> int:
        return self._n_key_cols

    # ------------------------------------------------------- translation
    def to_internal_vertex_id(self, df: DataFrame, col_names=None) -> DataFrame:
        """DF[id] for the external keys in ``df`` (order not guaranteed,
        as in the reference)."""
        cols = list(col_names) if col_names else df.columns[: self._n_key_cols]
        keys = df.select(_key_expr(cols).alias(EXT))
        return keys.join(self._maybe_broadcast(self.map), EXT).select(VID)

    def add_internal_vertex_id(
        self,
        df: DataFrame,
        id_column_name: str = "id",
        col_names=None,
        drop: bool = False,
        preserve_order: bool = False,
    ) -> DataFrame:
        cols = list(col_names) if col_names else df.columns[: self._n_key_cols]
        if preserve_order:
            df = df.withColumn("_ord", F.monotonically_increasing_id())
        m = self.map.select(
            F.col(EXT).alias("_k"), F.col(VID).alias(id_column_name)
        )
        out = (
            df.withColumn("_k", _key_expr(cols))
            .join(self._maybe_broadcast(m), "_k", "left")
            .drop("_k")
        )
        if drop:
            out = out.drop(*cols)
        if preserve_order:
            out = out.orderBy("_ord").drop("_ord")
        return out

    def _ext_out_names(self, external_column_names=None) -> list[str]:
        if external_column_names is not None:
            return (
                [external_column_names]
                if isinstance(external_column_names, str)
                else list(external_column_names)
            )
        # reference default: columns labeled '0' .. 'n-1'
        return [str(i) for i in range(self._n_key_cols)]

    def from_internal_vertex_id(
        self,
        df: DataFrame,
        internal_column_name: str | None = None,
        external_column_names=None,
        drop: bool = False,
    ) -> DataFrame:
        icol = internal_column_name or VID
        names = self._ext_out_names(external_column_names)
        m = self.map.select(F.col(VID).alias(icol), F.col(EXT).alias("_ext"))
        out = df.join(self._maybe_broadcast(m), icol, "left")
        if self._n_key_cols == 1:
            out = out.withColumnRenamed("_ext", names[0])
        else:
            fields = out.schema["_ext"].dataType.names
            out = out.select(
                *[c for c in out.columns if c != "_ext"],
                *[F.col(f"_ext.{f}").alias(n) for f, n in zip(fields, names)],
            )
        if drop:
            out = out.drop(icol)
        return out

    def unrenumber(
        self,
        df: DataFrame,
        column_name: str,
        preserve_order: bool = False,
        get_column_names: bool = False,
    ):
        """Replace internal-id ``column_name`` with the external key
        (single-column keys keep the column name; multi-column keys expand
        to '0'..'n-1'). ``get_column_names=True`` also returns the names,
        as in the reference."""
        if preserve_order:
            df = df.withColumn("_ord", F.monotonically_increasing_id())
        if self._n_key_cols == 1:
            out = self.from_internal_vertex_id(
                df, column_name, [column_name + "_ext"], drop=True
            ).withColumnRenamed(column_name + "_ext", column_name)
            names = [column_name]
        else:
            out = self.from_internal_vertex_id(df, column_name, None, drop=True)
            names = self._ext_out_names(None)
        if preserve_order:
            out = out.orderBy("_ord").drop("_ord")
        return (out, names) if get_column_names else out
