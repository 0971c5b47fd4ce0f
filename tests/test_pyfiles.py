"""Deployment-shape regression tests: the package must work when imported
from a ``spark-submit --py-files`` zip (north-rule deployment), where
``cugraph_spark.__file__`` points INSIDE the archive and ``ship_package``
must not try to re-archive a zip path (round-4 bug: NotADirectoryError at
session creation under spark-submit)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_session_from_pyfiles_zip(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py"),
         str(tmp_path / "engine.zip")],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    # import ONLY from the zip (repo not on sys.path), create a session,
    # and run a pandas-UDF op end-to-end so executor deserialization of
    # zip-shipped closures is exercised too.
    script = f"""
import sys
sys.path.insert(0, {zip_path!r})
import cugraph_spark
assert cugraph_spark.__file__.startswith({zip_path!r}), cugraph_spark.__file__
from cugraph_spark.session import get_spark
from cugraph_spark import multimodal as mm
spark = get_spark(master="local[2]", shuffle_partitions=2,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
n = mm.audio_features(mm.chirp_audio_assets(spark, n=2)).count()
assert n == 2, n
print("ZIP_SESSION_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=str(tmp_path), timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ZIP_SESSION_OK" in out.stdout
