"""Build the spark-submit --py-files artifact: dist/lsh_project_spark.zip
(the package, deterministic bytes: sorted entries, fixed timestamps, no
pyc) plus dist/run_dedup.py, the thin driver script spark-submit needs
(spark-submit takes a SCRIPT, not `-m module` — the launcher is the
canonical way to ship a packaged PySpark app).

    python scripts/package_pyfiles.py [dist_dir]
    spark-submit --master <cluster> \
        --py-files dist/lsh_project_spark.zip dist/run_dedup.py \
        --input <images_parquet> --output <assignments_parquet>

The zip is bit-reproducible for a given tree, so cluster deploys can be
content-addressed / cached.
"""

from __future__ import annotations

import os
import sys
import zipfile

LAUNCHER = '''\
"""spark-submit driver for the dedup pipeline (built by
scripts/package_pyfiles.py; the package arrives via --py-files)."""
import sys

from lsh_project_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
'''

# fixed DOS timestamp (1980-01-01) -> identical zip bytes for identical trees
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(dist_dir: str) -> tuple[str, str]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "lsh_project_spark")
    os.makedirs(dist_dir, exist_ok=True)
    zpath = os.path.join(dist_dir, "lsh_project_spark.zip")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, repo), full))
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in entries:
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    lpath = os.path.join(dist_dir, "run_dedup.py")
    with open(lpath, "w") as f:
        f.write(LAUNCHER)
    return zpath, lpath


if __name__ == "__main__":
    dist = sys.argv[1] if len(sys.argv) > 1 else "dist"
    zpath, lpath = build(dist)
    print(f"built {zpath} ({os.path.getsize(zpath)} bytes) and {lpath}")
    print(
        "launch: spark-submit --master <cluster> "
        f"--py-files {zpath} {lpath} --input <images> --output <out>"
    )
