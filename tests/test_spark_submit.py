"""End-to-end receipt for the north rule's launch surface: package the
engine with scripts/package_pyfiles.py and run the REAL `spark-submit
--py-files` flow in a subprocess (fresh JVM, package imported from the
zip, never from the repo tree), then pin its output against the
in-process pipeline."""

import json
import os
import subprocess
import sys

import pytest

from lsh_project_spark.sources.fixtures import images_from_documents


@pytest.fixture(scope="module")
def packaged(tmp_path_factory):
    from scripts.package_pyfiles import build

    dist = str(tmp_path_factory.mktemp("dist"))
    return build(dist)


def test_zip_is_reproducible(tmp_path):
    from scripts.package_pyfiles import build

    z1, _ = build(str(tmp_path / "a"))
    z2, _ = build(str(tmp_path / "b"))
    assert open(z1, "rb").read() == open(z2, "rb").read()


def test_spark_submit_pyfiles_end_to_end(spark, packaged, tmp_path):
    zpath, launcher = packaged
    docs = spark.createDataFrame(
        [(i, f"caption tokens for doc {i} " + "w " * (i % 5)) for i in range(60)],
        "doc_id long, text string",
    )
    inp = str(tmp_path / "images")
    images_from_documents(docs).write.parquet(inp)
    out = str(tmp_path / "assignments")
    metrics = str(tmp_path / "metrics.json")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            launcher,
            "--input", inp,
            "--output", out,
            "--metrics", metrics,
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # repo tree NOT importable: the zip must serve
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    got = {
        (r["image_id"], r["cluster_id"])
        for r in spark.read.parquet(out).collect()
    }
    from lsh_project_spark.pipeline import dedup_pipeline

    want = {
        (r["image_id"], r["cluster_id"])
        for r in dedup_pipeline(spark.read.parquet(inp)).assignments.collect()
    }
    assert got == want  # packaged run == in-process run, bit-for-bit
    m = json.load(open(metrics))
    assert m["rows"] == len(want)
