"""The reference's own end-to-end benchmark, as DataFrames: random unit
vectors -> noisy queries -> exact ground truth -> CP-LSH probe/verify/top-1
-> recall (SURVEY.md §3, /root/reference/src/main.cc).  Scaled-down config;
the reference-size run (n=65536, q=1024) is marked slow."""

import numpy as np
import pytest

from lsh_project_spark.config import CrossPolytopeConfig
from lsh_project_spark.operators.knn import cp_nearest_neighbor
from lsh_project_spark.oracle import brute_force_nn
from lsh_project_spark.sources.textformat import load_vectors_text, save_vectors_text
from lsh_project_spark.sources.vectors import (
    brute_force_truth,
    noisy_queries,
    random_unit_vectors,
)


@pytest.fixture(scope="module")
def nn_fixture(spark):
    n, d, q = 4096, 64, 128
    data = random_unit_vectors(spark, n, d, seed=77).cache()
    data.count()
    queries = noisy_queries(spark, data, q, d, n, seed=77).cache()
    queries.count()
    return data, queries, n, d, q


def test_generators_deterministic_and_normalized(spark, nn_fixture):
    data, queries, n, d, q = nn_fixture
    rows = data.limit(50).collect()
    for r in rows:
        assert abs(np.linalg.norm(r["features"]) - 1.0) < 1e-5
    again = random_unit_vectors(spark, n, d, seed=77, partitions=7)
    a = {r["id"]: tuple(r["features"]) for r in again.limit(50).collect()}
    for r in rows:
        if r["id"] in a:
            assert a[r["id"]] == tuple(r["features"])


def test_distributed_truth_matches_numpy(spark, nn_fixture):
    data, queries, n, d, q = nn_fixture
    truth = {r["qid"]: r["nn_id"] for r in brute_force_truth(queries, data).collect()}
    drows = sorted(data.collect(), key=lambda r: r["id"])
    qrows = sorted(queries.collect(), key=lambda r: r["qid"])
    dmat = np.array([r["features"] for r in drows], dtype=np.float32)
    qmat = np.array([r["features"] for r in qrows], dtype=np.float32)
    expect = brute_force_nn(qmat, dmat)
    for i, r in enumerate(qrows):
        assert truth[r["qid"]] == drows[expect[i]]["id"]


def test_cp_lsh_recall_vs_truth(spark, nn_fixture):
    """The reference's acceptance metric: % neighbours found
    (/root/reference/src/main.cc:600-607).  k=1, L=8 at d=64, noisy-copy
    queries -> expect high recall."""
    data, queries, n, d, q = nn_fixture
    cfg = CrossPolytopeConfig(dim=d, k=1, num_tables=8)
    truth = {r["qid"]: r["nn_id"] for r in brute_force_truth(queries, data).collect()}
    pred = {
        r["qid"]: r["nn_id"]
        for r in cp_nearest_neighbor(data, queries, cfg).collect()
    }
    recall = sum(1 for qid, nn in truth.items() if pred.get(qid) == nn) / len(truth)
    assert recall >= 0.9, recall


def test_text_format_roundtrip(spark, tmp_path, nn_fixture):
    data, *_ = nn_fixture
    path = str(tmp_path / "data_points")
    n = save_vectors_text(data.limit(100), path)
    assert n == 100
    with open(path) as f:
        assert f.readline().strip() == "100 64"
    back = load_vectors_text(spark, path)
    orig = {r["id"]: np.array(r["features"]) for r in data.limit(100).collect()}
    for r in back.collect():
        assert np.allclose(orig[r["id"]], r["features"], atol=1e-6)


@pytest.mark.slow
def test_reference_config_recall(spark):
    """Full reference scale: n=65536, d=128, q=1024, k=2, L=8
    (/root/reference/src/main.cc:203-238).

    The reference binary itself (compiled with its own Makefile flags and
    run at this exact config) reports 65.53% neighbours found — the
    0.95x+0.05N query noise at d=128 gives cos(q,x)~=0.86, and k=2/L=8
    cross-polytope recall at that angle is ~2/3.  Parity bar: within 5
    points of the measured reference recall (LSH is seeded differently,
    so exact bucket outcomes differ; the distribution must match)."""
    n, d, q = 65536, 128, 1024
    data = random_unit_vectors(spark, n, d, seed=49628583).cache()
    data.count()
    queries = noisy_queries(spark, data, q, d, n, seed=49628583).cache()
    cfg = CrossPolytopeConfig(dim=d, k=2, num_tables=8)
    truth = {r["qid"]: r["nn_id"] for r in brute_force_truth(queries, data).collect()}
    pred = {
        r["qid"]: r["nn_id"]
        for r in cp_nearest_neighbor(data, queries, cfg).collect()
    }
    recall = sum(1 for qid, nn in truth.items() if pred.get(qid) == nn) / len(truth)
    REFERENCE_MEASURED_RECALL = 0.6553  # see BASELINE.md "measured run"
    assert abs(recall - REFERENCE_MEASURED_RECALL) <= 0.05, recall
