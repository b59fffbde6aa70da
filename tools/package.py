#!/usr/bin/env python
"""Build dist/duckdb_raquet_spark.zip for spark-submit --py-files.

Plain-zip packaging (no wheel needed): the archive root contains the
``duckdb_raquet_spark`` package so executors can import it straight off
the PYTHONPATH entry spark-submit adds for every --py-files archive.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "duckdb_raquet_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(src):
            for fn in sorted(files):
                if fn.endswith((".pyc", ".pyo")) or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
