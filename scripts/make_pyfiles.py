#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

    python scripts/make_pyfiles.py dist/lap.zip

Zips ``log_aggregation_pipeline_spark/`` (plus bench.py for the
replicate helper) so executors can import it.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(dest: str) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "log_aggregation_pipeline_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "bench.py"), "bench.py")
    return dest


if __name__ == "__main__":
    out = make_zip(sys.argv[1] if len(sys.argv) > 1 else "dist/lap.zip")
    print(out)
