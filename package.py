#!/usr/bin/env python
"""Build the spark-submit artifact: a --py-files zip of the package.

    python package.py            # -> dist/pydriosm_spark.zip
    spark-submit --py-files dist/pydriosm_spark.zip your_job.py

The north rule ships the engine as ``spark-submit --py-files`` on a
multi-executor cluster; the zip contains only the package sources (no
tests, no caches) and imports identically to the working tree —
verified by tests/test_packaging.py in a clean interpreter.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "pydriosm_spark"
OUT = os.path.join(ROOT, "dist", f"{PKG}.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
