#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

Produces a zip whose root contains the ``glad_tiles_pipeline_spark``
package, so executors (and the driver, when the zip is on PYTHONPATH) can
import it.  Usage:

    python scripts/make_pyfiles.py [out.zip]
    spark-submit --py-files glad_tiles_pipeline_spark.zip scripts/ingest.py …
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "glad_tiles_pipeline_spark"


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg_root = os.path.join(REPO, PKG)
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, REPO)
                    z.write(full, rel)
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    print(build(out))
