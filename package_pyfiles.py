#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission.

    python package_pyfiles.py            -> dist/pgstosrt_spark.zip
    spark-submit --py-files dist/pgstosrt_spark.zip job.py

The zip contains the pure-Python package (pgs core + kernels + pipeline);
jobs import it on executors exactly as tests do locally.
"""

from __future__ import annotations

import os
import zipfile


def build(out: str = "dist/pgstosrt_spark.zip") -> str:
    repo = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(repo, "dist"), exist_ok=True)
    out_path = os.path.join(repo, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(repo, "pgstosrt_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, repo))
    return out_path


if __name__ == "__main__":
    print(build())
