"""Per-iteration checkpointing with lineage + metrics (north-rule item).

No reference analog (cuGraph iterates in device memory); required here so
multi-hour convergence runs on a 1000-executor cluster resume mid-stream.

Layout per iteration::

    <base>/<job>/iter=00012/data.parquet      the vertex-state DataFrame
    <base>/<job>/iter=00012/manifest.json     iteration, metrics, lineage

``manifest.json`` carries per-partition row counts and content hashes
(the lineage record: which partition produced what), wall-clock timings,
and the caller's metrics (e.g. L1 delta, dangling mass). The manifest is
written after the data — its presence marks the iteration complete, so a
killed run resumes from the last complete manifest.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, base_path: str, job_name: str, keep_last: int = 3):
        self.base = os.path.join(base_path, job_name)
        self.keep_last = keep_last
        os.makedirs(self.base, exist_ok=True)

    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.base, f"iter={iteration:05d}")

    def save(self, df: DataFrame, iteration: int, metrics: dict) -> None:
        t0 = time.time()
        d = self._iter_dir(iteration)
        data_path = os.path.join(d, "data.parquet")
        df.write.mode("overwrite").parquet(data_path)
        t_write = time.time() - t0

        # lineage: per-partition row count + order-insensitive content hash
        cols = df.columns
        lineage_rows = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))).alias("content_hash"),
            )
            .collect()
        )
        manifest = {
            "iteration": iteration,
            "schema": df.schema.jsonValue(),
            "metrics": metrics,
            "lineage": {
                "partitions": [
                    {"pid": r["_pid"], "rows": r["rows"], "content_hash": r["content_hash"]}
                    for r in sorted(lineage_rows, key=lambda r: r["_pid"])
                ],
                "total_rows": int(sum(r["rows"] for r in lineage_rows)),
            },
            "timings": {"write_sec": t_write, "wall_ts": time.time()},
        }
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))
        self._gc(iteration)

    def _gc(self, current_iteration: int) -> None:
        """Keep only the last ``keep_last`` complete checkpoints."""
        its = self.completed_iterations()
        for it in its[: -self.keep_last] if self.keep_last else []:
            d = self._iter_dir(it)
            import shutil

            shutil.rmtree(d, ignore_errors=True)

    def completed_iterations(self) -> list:
        out = []
        if not os.path.isdir(self.base):
            return out
        for name in sorted(os.listdir(self.base)):
            if name.startswith("iter=") and os.path.exists(
                os.path.join(self.base, name, "manifest.json")
            ):
                out.append(int(name.split("=")[1]))
        return sorted(out)

    def resume(self, spark: SparkSession):
        """Return (iteration, DataFrame) of the newest complete checkpoint,
        or None if nothing to resume from."""
        its = self.completed_iterations()
        if not its:
            return None
        it = its[-1]
        df = spark.read.parquet(os.path.join(self._iter_dir(it), "data.parquet"))
        return it, df

    def manifest(self, iteration: int) -> dict:
        with open(os.path.join(self._iter_dir(iteration), "manifest.json")) as f:
            return json.load(f)
