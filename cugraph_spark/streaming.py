"""Structured Streaming surface: streaming page→edge ingest, watermarked
windowed rollups, and a custom stateful operator via
``applyInPandasWithState``.

The reference engine is batch-only (its ingest is
``from_cudf_edgelist``, graph_classes.py:107-205); this module is the
Spark-native extension the north rule's pipeline needs when the
Common-Crawl-style page table arrives as a stream (new WARC drops) rather
than a static Iceberg snapshot:

- the SAME vectorized Arrow href/text UDFs run unchanged on a streaming
  DataFrame (``stream_pages_to_edges``) — one extraction codepath for
  batch and streaming,
- windowed aggregations with watermarks bound state for late events,
- ``stateful_totals`` shows the custom-stateful-operator path
  (``applyInPandasWithState``), the Spark idiom for incremental per-key
  accumulators (running degree counts, per-host crawl budgets, …),
- every query checkpoints to a caller-supplied location, so a restarted
  job resumes from the last committed micro-batch (exactly-once file
  source semantics) — the streaming analog of the engine's batch
  CheckpointManager lineage.

Scale notes: the file/Iceberg streaming source partitions by input file,
so parallelism follows the drop layout; windowed state is hash-partitioned
by (window, key) across ``spark.sql.shuffle.partitions`` state stores; the
watermark is what keeps state O(open windows · keys), not O(history).

All finite runs use ``Trigger.AvailableNow`` + the memory sink so results
are deterministic and oracle-comparable; a live deployment swaps the
trigger and sink without touching the query graph.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .ingest import extract_hrefs

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _as_drop_dir(path: str) -> str:
    """The file streaming source requires a DIRECTORY (its basePath); a
    single parquet file — the sandbox testdata layout — is staged into a
    one-file temp drop dir.  Local-mode convenience only: a real deployment
    points at the drop directory itself."""
    local = path.removeprefix("file:")
    if os.path.isfile(local):
        d = tempfile.mkdtemp(prefix="cgs_stream_src_")
        shutil.copy(local, d)
        return d
    return path


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of the events table (parquet file source).

    The file source needs an explicit schema (no inference mid-stream);
    ``max_files_per_trigger`` throttles replay so a backfill over N files
    becomes N micro-batches — that is how the watermark/late-data tests
    drive multi-batch behavior deterministically.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    path = _as_drop_dir(path)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_pages(spark: SparkSession, path: str) -> DataFrame:
    """Streaming read of the Common-Crawl-style page table
    (url, warc_ts, html, text, lang) — BASELINE.json ``input_hint`` shape."""
    return spark.readStream.schema(PAGES_SCHEMA).parquet(_as_drop_dir(path))


def stream_pages_to_edges(pages: DataFrame) -> DataFrame:
    """Streaming pages → (src, dst) href edges.

    Identical plan to the batch ``ingest.pages_to_edges`` — the Arrow
    pandas UDF is stateless, so Structured Streaming runs it per
    micro-batch unchanged; only (url, html) is projected so the scan
    prunes text/lang.
    """
    return pages.select("url", extract_hrefs(F.col("html")).alias("hrefs")).select(
        F.col("url").alias("src"), F.explode("hrefs").alias("dst")
    )


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-(window, event_type) count + value sum.

    With a watermark the query runs in append mode with bounded state
    (windows close ``watermark`` past their end and are dropped from the
    store); pass ``watermark=None`` for complete-mode finite runs where
    the full result table is wanted (e.g. oracle comparison).
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_TOTALS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _totals_fn(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) accumulator — state survives across
    micro-batches, so a restarted stream resumes the totals from the
    checkpointed state store."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
    )


def stateful_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` (Arrow-batched; state is a (count, sum)
    tuple per key in the state store, emitted in update mode each
    micro-batch the key appears in)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    sdf: DataFrame,
    sink_table: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain all currently-available input through ``sdf``
    (Trigger.AvailableNow) into an in-memory sink and return it as a
    DataFrame.

    With ``checkpoint_dir`` set, a re-run over the same directory
    processes only files committed since the last run — the
    resume-from-checkpoint contract (note the memory sink itself resets
    per run; durable sinks keep prior output).
    """
    writer = (
        sdf.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination(timeout_sec)
    spark = sdf.sparkSession
    return spark.table(sink_table)


def run_available_now_to_parquet(
    sdf: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain available input into a parquet sink with a durable checkpoint
    and return the sink contents as a batch DataFrame.

    This is the fault-tolerant resume path: the memory sink refuses to
    recover from a checkpoint (Spark raises "This query does not support
    recovering from checkpoint location"), but the file sink replays from
    committed offsets — a re-run over the same ``checkpoint_dir`` appends
    only rows from files not yet committed, never reprocessing old input
    (exactly-once file-source → file-sink semantics)."""
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return sdf.sparkSession.read.parquet(out_dir)
