"""Cluster-safe scratch locations for operators that spill DataFrames.

Operators like betweenness spill per-layer frames with ``df.write.parquet``
and re-read them later.  On a multi-node cluster the spill path must live on
a filesystem every executor AND the driver can reach (HDFS/S3/NFS) — a
driver-local ``tempfile.mkdtemp`` path only works in local mode, and cleanup
must go through the same Hadoop FileSystem the write used (``shutil.rmtree``
can neither see nor delete an ``hdfs://`` directory).

Resolution order for the spill root:
  1. Spark conf ``spark.cugraph.spill.dir`` (set per-session/job),
  2. env ``SPARK_GRAFT_SPILL_DIR``,
  3. the session's checkpoint dir, if one was set (already shared by
     contract),
  4. driver-local tempdir with an explicit ``file://`` scheme — correct in
     local mode only, so we warn when the master isn't local.
"""

from __future__ import annotations

import os
import tempfile
import uuid
import warnings

from pyspark.sql import SparkSession

SPILL_DIR_CONF = "spark.cugraph.spill.dir"


def spill_dir(spark: SparkSession, prefix: str) -> str:
    """Return a fresh, job-unique directory URI for parquet spills."""
    base = None
    try:
        base = spark.conf.get(SPILL_DIR_CONF)
    except Exception:
        base = None
    base = base or os.environ.get("SPARK_GRAFT_SPILL_DIR")
    if not base:
        ckpt = spark.sparkContext._jsc.sc().getCheckpointDir()
        if ckpt.isDefined():
            base = ckpt.get()
    if not base:
        master = spark.sparkContext.master
        if not master.startswith("local"):
            warnings.warn(
                f"no shared spill dir configured ({SPILL_DIR_CONF} / "
                "SPARK_GRAFT_SPILL_DIR / checkpoint dir); falling back to a "
                f"driver-local tempdir, which is NOT visible to executors "
                f"under master={master}",
                RuntimeWarning,
                stacklevel=2,
            )
        return "file://" + tempfile.mkdtemp(prefix=prefix)
    return base.rstrip("/") + f"/{prefix}{uuid.uuid4().hex}"


def spill_cleanup(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` via the Hadoop FileSystem that owns it
    (works for file://, hdfs://, s3a://, ... alike)."""
    try:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(hconf)
        fs.delete(jpath, True)
    except Exception:
        pass  # best-effort, mirrors the prior ignore_errors=True behavior
