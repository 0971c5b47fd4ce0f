"""Package the engine for ``spark-submit --py-files``.

Usage: python scripts/make_pyfiles.py [dist/engine.zip]
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    base = out[:-4] if out.endswith(".zip") else out
    path = shutil.make_archive(base, "zip", root_dir=REPO, base_dir="cugraph_spark")
    print(path)


if __name__ == "__main__":
    main()
